"""True multi-process mesh test: 2 processes x 4 virtual CPU devices.

Spawns two subprocesses that form one jax.distributed job, build the global
8-device window mesh, solve SPMD with ppermute carry relaxation across the
process boundary (DCN-equivalent), and validate their local output shards.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, os.environ["GD_REPO"])

    from genome_downsampler_tpu.parallel.launch import (
        global_window_mesh, initialize_distributed, shard_rows_globally)
    from genome_downsampler_tpu.parallel.mesh import make_mesh_solver

    initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    mesh = global_window_mesh()
    assert mesh.shape["x"] == 8

    # deterministic shared problem
    rng = np.random.default_rng(0)
    n, L, reads = 4096, 64, 3000
    start = rng.integers(0, n - L, reads)
    span = rng.integers(8, L, reads)
    end = start + span - 1
    rows_host = np.zeros((n, L), np.int32)
    np.add.at(rows_host, (start, span - 1), 1)
    cov = np.zeros(n + 1, np.int64)
    np.add.at(cov, start, 1)
    np.add.at(cov, end + 1, -1)
    target_host = np.minimum(np.cumsum(cov)[:n], 5).astype(np.int32)

    fn, _, _ = make_mesh_solver(mesh, n, L)
    rows, target = shard_rows_globally(rows_host, target_host, mesh)
    sel = fn(rows, target)

    # compare local shards against the single-process global sweep
    import jax.numpy as jnp
    from genome_downsampler_tpu.solvers.device_sweep import sweep_counts
    z = jnp.zeros(L, jnp.int32)
    ref, _, _ = sweep_counts(jnp.asarray(rows_host), jnp.asarray(target_host), z, z, L)
    ref = np.asarray(ref)
    for shard in sel.addressable_shards:
        lo = shard.index[0].start or 0
        got = np.asarray(shard.data).reshape(-1)
        want = ref[lo : lo + got.shape[0]]
        assert (got == want).all(), f"process {jax.process_index()} shard {lo} mismatch"
    print(f"process {jax.process_index()} OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        GD_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        GD_COORDINATOR=f"127.0.0.1:{port}",
        GD_NUM_PROCESSES="2",
    )
    procs = []
    for rank in (0, 1):
        e = dict(env, GD_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=e,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"process {rank} OK" in out
