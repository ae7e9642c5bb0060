"""2-process host-sharded pipeline: region reads per rank, global-mesh
solve, voffset merge, single writer — output bit-equal to a 1-process run
over the same 8 windows."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.parallel.sharded_io import run_sharded
from genome_downsampler_tpu.testing.bam_writer import write_test_bam

from tests.test_region_io import make_bounded_insert_batch

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["GD_REPO"])

    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.parallel.launch import initialize_distributed
    from genome_downsampler_tpu.parallel.sharded_io import run_sharded

    initialize_distributed()
    assert jax.process_count() == 2
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    merged = run_sharded(
        os.environ["GD_BAM"], 6, cfg,
        os.environ["GD_OUT"] if jax.process_index() == 0 else None,
        halo=1024, max_span=128,
    )
    print(f"process {jax.process_index()} merged {len(merged)} OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_sharded_bit_equal(tmp_path):
    batch = make_bounded_insert_batch(
        pairs=2000, n=16_384, read_len=100, max_insert=600, seed=11
    )
    bam = tmp_path / "in.bam"
    write_test_bam(bam, batch, coordinate_sorted=True, make_index=True)

    # single-process reference over the same 8 windows (conftest mesh)
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    expected = tmp_path / "expected.bam"
    run_sharded(bam, 6, cfg, expected, halo=1024, max_span=128)

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out = tmp_path / "out.bam"
    env = dict(
        os.environ,
        GD_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        GD_COORDINATOR=f"127.0.0.1:{port}",
        GD_NUM_PROCESSES="2",
        GD_BAM=str(bam),
        GD_OUT=str(out),
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
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for rank, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{o[-3000:]}"
        assert f"process {rank} merged" in o

    assert out.read_bytes() == expected.read_bytes(), (
        "2-process output differs from the 1-process run"
    )
