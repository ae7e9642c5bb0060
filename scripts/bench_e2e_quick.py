"""Production-path e2e timing: McpDeviceSweepSolver vs host C++ greedy.

Times the REAL solver entry (pack + transfer + fused solve + device mask +
host bit-test) on identical reads, with phase traces. Usage:
  timeout 900 python -u scripts/bench_e2e_quick.py [reads_M] [seed_blocks]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver


def main():
    reads_m = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    n_reads = int(reads_m * 1e6)
    n = int(n_reads * 2.5)
    m, read_len = 30, 150

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    start = rng.integers(0, n - read_len, n_reads, dtype=np.int64)
    start.sort(kind="stable")
    end = start + read_len - 1
    batch = ReadBatch(
        bam_id=np.arange(n_reads, dtype=np.int64),
        start=start, end=end,
        quality=np.full(n_reads, 60, np.int32),
        seq_length=np.full(n_reads, read_len, np.int32),
        is_first=np.tile([True, False], n_reads // 2 + 1)[:n_reads],
        ref_genome_length=n,
    )
    print(f"{n_reads} reads / {n/1e6:.1f} Mb / M={m}", flush=True)

    host = NativeGreedyMcpSolver()
    t0 = time.perf_counter()
    host_sel = host.solve(m, batch)
    print(f"host cold: {time.perf_counter()-t0:.2f}s "
          f"selected={len(host_sel)}", flush=True)
    t0 = time.perf_counter()
    host_sel = host.solve(m, batch)
    host_t = time.perf_counter() - t0
    print(f"host warm: {host_t:.2f}s", flush=True)

    solver = McpDeviceSweepSolver()
    t0 = time.perf_counter()
    dev_sel = solver.solve(m, batch)
    print(f"device cold (incl compile): {time.perf_counter()-t0:.2f}s "
          f"selected={len(dev_sel)} exact={len(dev_sel)==len(host_sel)}",
          flush=True)
    # nonce the data for honest repeat timing (relay memoizes)
    for rep in range(2):
        delta = 1 + (int.from_bytes(os.urandom(2), "little") % 7)
        b2start = start.copy()
        b2start[0] = max(0, b2start[0] - 0)  # keep sorted; perturb a span
        b2end = end.copy()
        b2end[0] = min(n - 1, b2start[0] + read_len - 1 - delta % 3)
        batch2 = ReadBatch(
            bam_id=batch.bam_id, start=b2start, end=b2end,
            quality=batch.quality, seq_length=batch.seq_length,
            is_first=batch.is_first, ref_genome_length=n,
        )
        t0 = time.perf_counter()
        dev_sel2 = solver.solve(m, batch2)
        dev_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        host_sel2 = host.solve(m, batch2)
        host_t2 = time.perf_counter() - t0
        print(f"rep{rep}: device e2e {dev_t:.2f}s vs host warm {host_t2:.2f}s"
              f" -> device_vs_host {host_t2/dev_t:.2f}"
              f" exact={len(dev_sel2)==len(host_sel2)}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    main()
