"""Quick TPU kernel timing (re-runnable; the axon relay stalls sometimes —
just re-run). Usage: timeout 560 python -u scripts/bench_kernel.py"""

import time

import numpy as np
import jax.numpy as jnp

from genome_downsampler_tpu.ops.coverage import capped_coverage, coverage_from_intervals
from genome_downsampler_tpu.ops.pallas_sweep import pallas_sweep_counts
from genome_downsampler_tpu.solvers.device_sweep import build_start_rows, sweep_counts
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def main():
    rng = np.random.default_rng(12345)
    batch = rand_reads_uniform(rng, 1_000_000, 30_000, 150)
    arrays, valid = batch.padded(4096)
    L, n = 256, 30_208
    print("uploading...", flush=True)
    start = jnp.asarray(arrays["start"])
    endv = jnp.asarray(arrays["end"])
    w = jnp.asarray(valid).astype(jnp.int32)
    rows = build_start_rows(start, endv - start + 1, w, n, L)
    rows.block_until_ready()
    print("rows ready", flush=True)
    z = jnp.zeros(L, jnp.int32)
    targets = [
        capped_coverage(coverage_from_intervals(start, endv, n, w), m)
        for m in (1000, 999, 998, 1001)
    ]
    ref = sweep_counts(rows, targets[0], z, z, L)
    s, _, _ = pallas_sweep_counts(rows, targets[0], z, z, L, block=512)
    s.block_until_ready()
    print("matches scan:", bool(jnp.all(ref[0] == s)), flush=True)
    for i, t in enumerate(targets):
        t0 = time.perf_counter()
        s, _, _ = pallas_sweep_counts(rows, t, z, z, L, block=512)
        s.block_until_ready()
        print(f"variant {i}: {(time.perf_counter()-t0)*1000:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
