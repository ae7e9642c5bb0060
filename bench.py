"""Benchmark: downsampling throughput on the reference's largest workload.

Workload (the biggest the reference exercises,
``/root/reference/src/tests/coverage_tester.cpp:120-135``): 1M read pairs
(2M reads), genome 30,000 bp, read length 150, max coverage 1000, seed 12345.

Metric: end-to-end solver reads/s (padding, device transfer, windowed exact
sweep, host identity reconstruction — everything but BAM I/O).

vs_baseline: ratio against this framework's own exact host greedy
(O(R log R) C-speed sweep) — the stand-in CPU baseline, since the reference
publishes no numbers (BASELINE.md) and OR-Tools is not present in this
image. The greedy is itself faster than the reference's min-cost-flow
solvers, so the ratio is conservative.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

PAIRS = 1_000_000
GENOME = 30_000
READ_LEN = 150
M = 1000
SEED = 12345
N_WINDOWS = 32
REPEATS = 3


def main() -> None:
    use_cpu = "--cpu" in sys.argv
    if use_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from genome_downsampler_tpu.parallel.windows import WindowedMcpSolver
    from genome_downsampler_tpu.solvers.greedy_mcp import GreedyMcpSolver
    from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform

    rng = np.random.default_rng(SEED)
    batch = rand_reads_uniform(rng, PAIRS, GENOME, READ_LEN)
    solver = WindowedMcpSolver(n_windows=N_WINDOWS, max_span=256)

    sel = solver.solve(M, batch)  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        sel = solver.solve(M, batch)
        times.append(time.perf_counter() - t0)
    device_time = min(times)

    t0 = time.perf_counter()
    host_sel = GreedyMcpSolver().solve(M, batch)
    host_time = time.perf_counter() - t0

    # sanity: validity + near-optimality of the device answer
    n = batch.ref_genome_length
    cov = np.zeros(n + 1, np.int64)
    np.add.at(cov, batch.start, 1)
    np.add.at(cov, batch.end + 1, -1)
    cov = np.cumsum(cov)[:n]
    out = np.zeros(n + 1, np.int64)
    np.add.at(out, batch.start[sel], 1)
    np.add.at(out, batch.end[sel] + 1, -1)
    out = np.cumsum(out)[:n]
    assert np.all(np.minimum(cov, M) <= out), "device selection invalid"
    assert len(sel) <= len(host_sel) * 1.02, "device selection far from optimal"

    reads_per_s = batch.n_reads / device_time
    host_reads_per_s = batch.n_reads / host_time
    print(
        json.dumps(
            {
                "metric": "downsample_reads_per_s_2M_reads_M1000",
                "value": round(reads_per_s),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / host_reads_per_s, 3),
                "detail": {
                    "device_s": round(device_time, 4),
                    "host_greedy_s": round(host_time, 4),
                    "selected": int(len(sel)),
                    "host_selected": int(len(host_sel)),
                    "n_windows": N_WINDOWS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
