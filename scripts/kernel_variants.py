"""Experimental Pallas sweep-kernel variants for latency A/B on real TPU.

Run: timeout 560 python -u scripts/kernel_variants.py
(from the repo root; re-run if the relay stalls)

Variants:
  A current production kernel (rolls + cond-gated cumsum)
  B rotation-indexed state: no per-position rolls; the take-split uses one
    plain cumsum with ring-rotated prefix composition
  C like A but branch-free (take-split always runs)
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genome_downsampler_tpu.ops.coverage import capped_coverage, coverage_from_intervals
from genome_downsampler_tpu.ops.pallas_sweep import _lane_cumsum, pallas_sweep_counts
from genome_downsampler_tpu.solvers.device_sweep import build_start_rows, sweep_counts
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def make_variant_c(block, L):
    def kernel(rows_ref, target_ref, out_ref, avail_s, selend_s):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            avail_s[:] = jnp.zeros_like(avail_s)
            selend_s[:] = jnp.zeros_like(selend_s)

        zero_last = (
            jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) < L - 1
        ).astype(jnp.int32)

        def body(i, carry):
            avail, selend = carry
            avail = avail + rows_ref[pl.ds(i, 1), :]
            cur = jnp.sum(selend)
            deficit = jnp.maximum(target_ref[0, i] - cur, 0)
            csum = _lane_cumsum(avail, L)
            take = jnp.clip(deficit - (csum[0, L - 1] - csum), 0, avail)
            avail = avail - take
            selend = selend + take
            out_ref[0, i] = selend[0, 0]
            return (
                pltpu.roll(avail, L - 1, 1) * zero_last,
                pltpu.roll(selend, L - 1, 1) * zero_last,
            )

        a0 = avail_s[0:1, :]
        s0 = selend_s[0:1, :]
        af, sf = jax.lax.fori_loop(0, block, body, (a0, s0))
        avail_s[:] = af
        selend_s[:] = sf

    return kernel


def make_variant_b(block, L):
    """Absolute-slot state: slot = e % L; no rolls. Priority suffix in ring
    order from the current expiry slot via rotated prefix composition."""

    def kernel(rows_ref, target_ref, out_ref, avail_s, selend_s):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            avail_s[:] = jnp.zeros_like(avail_s)
            selend_s[:] = jnp.zeros_like(selend_s)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

        def body(i, carry):
            avail, selend = carry
            # rows pre-rotated host-side: rows[p, k] counts reads with
            # end % L == k starting at p
            avail = avail + rows_ref[pl.ds(i, 1), :]
            p = b * block + i
            s = p % L  # slot of ends at position p (lowest priority)
            is_s = lane == s
            cur = jnp.sum(selend)
            deficit = jnp.maximum(target_ref[0, i] - cur, 0)
            csum = _lane_cumsum(avail, L)
            total = csum[0, L - 1]
            # inclusive ring prefix in ascending-end order (slot s first):
            # cs_excl = plain prefix strictly before slot s
            cs_excl = jnp.sum(jnp.where(is_s, csum - avail, 0))
            ring_prefix = jnp.where(
                lane >= s, csum - cs_excl, csum + total - cs_excl
            )
            # stock at strictly higher ends than slot x
            s_above = total - ring_prefix
            take = jnp.clip(deficit - s_above, 0, avail)
            avail = avail - take
            selend = selend + take
            out_ref[0, i] = jnp.sum(jnp.where(is_s, selend, 0))
            # expire slot s
            keep = 1 - is_s.astype(jnp.int32)
            return avail * keep, selend * keep

        a0 = avail_s[0:1, :]
        s0 = selend_s[0:1, :]
        af, sf = jax.lax.fori_loop(0, block, body, (a0, s0))
        avail_s[:] = af
        selend_s[:] = sf

    return kernel


def run_variant(kernel_factory, rows, target, L, block, rotated=False):
    n = rows.shape[0]
    nb = n // block
    if rotated:
        # rotate each row so column k holds span with (p + span - 1) % L == k
        p = np.arange(n)[:, None]
        k = np.arange(L)[None, :]
        src = np.asarray(rows)
        dest = np.zeros_like(src)
        e_mod = (p + k) % L  # span k+1 -> end p+k
        np.put_along_axis(dest, e_mod, src, axis=1)
        rows = jnp.asarray(dest)
    fn = pl.pallas_call(
        kernel_factory(block, L),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda b: (0, b), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda b: (0, b), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
        ],
    )
    out = fn(rows, target.reshape(1, n))
    out.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(rows, target.reshape(1, n))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return np.asarray(out).reshape(-1), min(times)


def main():
    rng = np.random.default_rng(12345)
    batch = rand_reads_uniform(rng, 1_000_000, 30_000, 150)
    arrays, valid = batch.padded(4096)
    L, n, block = 256, 30_208, 512
    print("uploading...", flush=True)
    start = jnp.asarray(arrays["start"])
    endv = jnp.asarray(arrays["end"])
    w = jnp.asarray(valid).astype(jnp.int32)
    rows = build_start_rows(start, endv - start + 1, w, n, L)
    target = capped_coverage(coverage_from_intervals(start, endv, n, w), 1000)
    rows.block_until_ready()
    z = jnp.zeros(L, jnp.int32)
    ref, _, _ = sweep_counts(rows, target, z, z, L)
    ref = np.asarray(ref)
    print("reference ready", flush=True)

    sel, t = None, None
    t0 = time.perf_counter()
    sel_a, _, _ = pallas_sweep_counts(rows, target, z, z, L, block=block)
    sel_a.block_until_ready()
    times = []
    for _ in range(3):
        t1 = time.perf_counter()
        sel_a, _, _ = pallas_sweep_counts(rows, target, z, z, L, block=block)
        sel_a.block_until_ready()
        times.append(time.perf_counter() - t1)
    print(f"A (prod): {min(times)*1000:.1f}ms match={bool((np.asarray(sel_a)==ref).all())}",
          flush=True)

    sel_c, t_c = run_variant(make_variant_c, rows, target, L, block)
    print(f"C (branch-free): {t_c*1000:.1f}ms match={bool((sel_c==ref).all())}", flush=True)

    sel_b, t_b = run_variant(make_variant_b, rows, target, L, block, rotated=True)
    print(f"B (no-roll ring): {t_b*1000:.1f}ms match={bool((sel_b==ref).all())}", flush=True)


if __name__ == "__main__":
    main()
