"""E. coli-scale sharded exact QMCP timing (2 CPU processes).

Records the VERDICT-r4 done-criterion run: partitioned bucket gather +
replicated bucket-level MCMF at config-4 scale, 2 ranks, with per-rank
remote-footprint stats. Uses the bench's cached config-4 BAM (10M reads /
5 Mb); synthesizes it if absent.

Usage: timeout 1200 python -u scripts/bench_sharded_qmcp.py [reads_M]
"""

import os
import socket
import subprocess
import sys
import textwrap
import time

sys.path.insert(0, ".")

_WORKER = textwrap.dedent(
    """
    import os, sys, time
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["GD_REPO"])

    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.parallel.launch import initialize_distributed
    from genome_downsampler_tpu.parallel import sharded_io as sio

    initialize_distributed()
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    t0 = time.perf_counter()
    merged = sio.run_sharded(
        os.environ["GD_BAM"], int(os.environ["GD_M"]), cfg,
        os.environ["GD_OUT"] if jax.process_index() == 0 else None,
        halo=4096, max_span=256, algorithm="qmcp-cpu",
    )
    dt = time.perf_counter() - t0
    st = sio.LAST_QMCP_STATS
    frac = st["gathered_bytes"] / max(st["replicated_tuple_bytes_r3"], 1)
    print(
        f"rank {jax.process_index()}: {dt:.1f}s merged={len(merged)} "
        f"buckets={st['buckets']} pool_units={st['pool_units']} "
        f"gathered={st['gathered_bytes']/1e6:.1f}MB "
        f"(r3 scheme {st['replicated_tuple_bytes_r3']/1e6:.1f}MB, "
        f"frac={frac:.3f})",
        flush=True,
    )
    """
)


def main():
    reads_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n_reads = int(reads_m * 1e6)
    genome, m = 5_000_000, 50
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    bam = os.path.abspath(
        os.path.join(cache, f"config4_{n_reads}_{genome}.bam")
    )
    if not os.path.exists(bam):
        import numpy as np

        from genome_downsampler_tpu.core.readbatch import ReadBatch
        from genome_downsampler_tpu.testing.bam_writer import (
            write_test_bam_fast,
        )

        rng = np.random.default_rng(12345)
        starts = rng.integers(0, genome - 150, n_reads, dtype=np.int64)
        batch = ReadBatch(
            bam_id=np.arange(n_reads, dtype=np.int64),
            start=starts, end=starts + 149,
            quality=rng.integers(20, 70, n_reads).astype(np.int32),
            seq_length=np.full(n_reads, 150, np.int32),
            is_first=np.tile([True, False], n_reads // 2),
            ref_genome_length=genome,
        )
        t0 = time.perf_counter()
        write_test_bam_fast(bam, batch)
        print(f"synth {bam}: {time.perf_counter()-t0:.1f}s", flush=True)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        GD_REPO=os.path.abspath(os.path.join(os.path.dirname(__file__), "..")),
        GD_COORDINATOR=f"127.0.0.1:{port}",
        GD_NUM_PROCESSES="2",
        GD_BAM=bam,
        GD_OUT="/tmp/gd_sharded_qmcp_out.bam",
        GD_M=str(m),
    )
    worker = "/tmp/gd_sharded_qmcp_worker.py"
    with open(worker, "w") as f:
        f.write(_WORKER)
    t0 = time.perf_counter()
    procs = []
    for rank in (0, 1):
        e = dict(env, GD_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-u", worker], env=e,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    for rank, p in enumerate(procs):
        out = p.communicate(timeout=1100)[0]
        print(f"--- rank {rank} (rc={p.returncode})", flush=True)
        print(out[-1500:], flush=True)
    print(f"total wall: {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
