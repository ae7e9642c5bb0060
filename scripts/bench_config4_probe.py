"""Config-4 deep-coverage probe: where does the device solve time go?

Builds the config-4 shape (10M reads / 5 Mb / M=50, ~300x input coverage)
as an in-memory batch (Weyl starts, no BAM I/O) and times the blocked
device solve phase by phase (GD_TRACE_PHASES) plus the host C++ greedy,
warm, with nonce'd repeats (the dev relay memoizes identical inputs).

Usage: timeout 900 python -u scripts/bench_config4_probe.py [reads_M] [n_Mb] [M] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

READ_LEN = 150
WEYL = np.uint32(2654435761)


def main():
    r = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 10_000_000
    n = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else 5_000_000
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from genome_downsampler_tpu.core.readbatch import ReadBatch
    from genome_downsampler_tpu.solvers.blocked_sweep import (
        BlockedWindowedMcpSolver,
    )
    from genome_downsampler_tpu.solvers.native_greedy import (
        native_greedy_select,
    )

    import jax

    print("backend:", jax.devices()[0].platform, flush=True)
    cov = r * READ_LEN / n
    print(f"shape: {r} reads / {n} bp / M={m} (~{cov:.0f}x)", flush=True)

    for rep in range(reps):
        i = np.arange(r, dtype=np.uint32)
        # nonce the starts per rep so the relay cannot memoize
        s = (((i + np.uint32(rep * 7919)) * WEYL) % np.uint32(
            n - READ_LEN + 1
        )).astype(np.int64)
        e = s + READ_LEN - 1

        t0 = time.perf_counter()
        oracle = native_greedy_select(s, e, n, m)
        host_t = time.perf_counter() - t0

        batch = ReadBatch(
            bam_id=np.arange(r, dtype=np.int64),
            start=s.astype(np.int32),
            end=e.astype(np.int32),
            quality=np.full(r, 60, np.int32),
            seq_length=np.full(r, READ_LEN, np.int32),
            is_first=np.zeros(r, bool),
            ref_genome_length=n,
        )
        solver = BlockedWindowedMcpSolver()
        t0 = time.perf_counter()
        sel = solver.solve(m, batch)
        dev_t = time.perf_counter() - t0
        assert len(sel) == len(oracle), (len(sel), len(oracle))
        print(
            f"rep{rep}: host_greedy={host_t:.3f}s device_solve={dev_t:.3f}s "
            f"stats={solver.last_stats}",
            flush=True,
        )


if __name__ == "__main__":
    main()
