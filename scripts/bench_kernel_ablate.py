"""Per-step cost attribution for the blocked sweep kernel (real TPU).

Runs timing-only ablation variants of the CURRENT production kernel body
(position-major tile, target lane, branchless take) with pieces removed, to
attribute the measured ns/position-step. All variants except `full` produce
WRONG results — they exist only to subtract wall-clock.

Usage:
  timeout 900 python -u scripts/bench_kernel_ablate.py [reads_M] [W[:B]] ...
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genome_downsampler_tpu.ops.pallas_sweep import _lane_cumsum
from genome_downsampler_tpu.ops.pallas_blocked import pack_blocked
from genome_downsampler_tpu.solvers.blocked_sweep import _capped_target_host

MODES = ("full", "notake", "noroll", "noemit", "addonly", "tileonly",
         "emptyloop")


def make_kernel(block, chunk, mode):
    def kernel(
        counts_ref, packed_ref, target_ref, avail0_ref, selend0_ref,
        out_ref, availf_ref, selendf_ref,
        tile_s, avail_s, selend_s, tgt_s, out_s,
    ):
        t = pl.program_id(0)
        nb = pl.num_programs(0)
        B, W, L = tile_s.shape
        C = chunk

        @pl.when(t == 0)
        def _():
            avail_s[:] = avail0_ref[:]
            selend_s[:] = selend0_ref[:]

        tgt_s[:] = jnp.swapaxes(target_ref[:, :], 0, 1)

        row_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
        row_l = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0)
        cap = packed_ref.shape[2]
        for w in range(W):
            for j in range(cap // C):
                codes = packed_ref[0, w : w + 1, pl.ds(j * C, C)]
                a = (codes // L == row_b).astype(jnp.float32)
                bm = (codes % L == row_l).astype(jnp.float32)
                part = jax.lax.dot_general(
                    a, bm,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if j == 0:
                    tile_s[:, w, :] = part
                else:
                    tile_s[:, w, :] = tile_s[:, w, :] + part
        tile_s[:, :, L - 1 : L] = tgt_s[:, :].astype(jnp.float32)[:, :, None]

        if mode == "tileonly":
            out_ref[:, :] = jnp.swapaxes(out_s[:, :], 0, 1)
            @pl.when(t == nb - 1)
            def _():
                availf_ref[:] = avail_s[:]
                selendf_ref[:] = selend_s[:]
            return

        zero_last = (
            jax.lax.broadcasted_iota(jnp.int32, (W, L), 1) < L - 1
        ).astype(jnp.int32)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        )

        def body(i, carry):
            avail_in, selend, cur = carry
            if mode == "emptyloop":
                return avail_in, selend, cur + 1
            add = tile_s[pl.ds(i, 1)].reshape(W, L).astype(jnp.int32)
            tgt = add[:, L - 1 : L]
            avail = avail_in + add * zero_last
            if mode == "addonly":
                return avail, selend, cur
            deficit = tgt - cur

            if mode == "notake":
                avail2, selend2, cur2 = avail, selend, cur
            else:
                csum = _lane_cumsum(avail, L)
                total = csum[:, L - 1 : L]
                take = jnp.clip(deficit - (total - csum), 0, avail)
                taken = jnp.minimum(jnp.maximum(deficit, 0), total)
                avail2, selend2, cur2 = (
                    avail - take, selend + take, cur + taken
                )
            em_col = selend2[:, 0:1]
            if mode != "noemit":
                emitted = jnp.sum(
                    jnp.where(eye, jnp.broadcast_to(em_col, (W, W)), 0),
                    axis=0, keepdims=True,
                )
                out_s[pl.ds(i, 1), :] = emitted
            if mode == "noroll":
                return avail2 * zero_last, selend2 * zero_last, cur2 - em_col
            return (
                pltpu.roll(avail2, L - 1, 1) * zero_last,
                pltpu.roll(selend2, L - 1, 1) * zero_last,
                cur2 - em_col,
            )

        def body2(k, carry):
            return body(2 * k + 1, body(2 * k, carry))

        cur0 = jnp.sum(selend_s[:], axis=1, keepdims=True)
        avail_f, selend_f, _ = jax.lax.fori_loop(
            0, block // 2, body2, (avail_s[:], selend_s[:], cur0)
        )
        avail_s[:] = avail_f
        selend_s[:] = selend_f
        out_ref[:, :] = jnp.swapaxes(out_s[:, :], 0, 1)

        @pl.when(t == nb - 1)
        def _():
            availf_ref[:] = avail_f
            selendf_ref[:] = selend_f

    return kernel


def run_mode(mode, packed_d, counts_flat, target_d, W, B, L, cap, chunk, nbw):
    win = nbw * B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbw,),
        in_specs=[
            pl.BlockSpec((1, W, cap), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, B), lambda t, c: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, B), lambda t, c: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, W, L), jnp.float32),
            pltpu.VMEM((W, L), jnp.int32),
            pltpu.VMEM((W, L), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
        ],
    )
    zeros = jnp.zeros((W, L), jnp.int32)

    @jax.jit
    def fn(pd):
        out, af, sf = pl.pallas_call(
            make_kernel(B, chunk, mode),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((W, win), jnp.int32),
                jax.ShapeDtypeStruct((W, L), jnp.int32),
                jax.ShapeDtypeStruct((W, L), jnp.int32),
            ],
        )(counts_flat, pd, target_d, zeros, zeros)
        return af

    t0 = time.perf_counter()
    fn(packed_d).block_until_ready()
    compile_t = time.perf_counter() - t0
    times = []
    for _ in range(2):
        k = int.from_bytes(os.urandom(4), "little") % 1_000_000
        pd = packed_d.at[0, 0, cap - 1].set(-2 - k)
        int(jnp.sum(pd[0, 0, :1]))
        t0 = time.perf_counter()
        int(jnp.sum(fn(pd)))
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"  {mode:9s}: {t*1000:7.1f}ms = {t/win*1e9:6.0f} ns/step "
          f"(compile {compile_t:.1f}s)", flush=True)
    return t


def main():
    reads_m = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    combos = []
    for a in sys.argv[2:]:
        w, _, b = a.partition(":")
        combos.append((int(w), int(b) if b else 256))
    combos = combos or [(64, 128)]
    n_reads = int(reads_m * 1e6)
    n = int(n_reads * 2.5)
    m, read_len, L = 30, 150, 256

    rng = np.random.default_rng(7)
    start = rng.integers(0, n - read_len, n_reads, dtype=np.int64)
    start.sort(kind="stable")
    end = start + read_len - 1
    print(f"{n_reads} reads / {n/1e6:.1f} Mb", flush=True)

    for W, B in combos:
        chunk = 128 if B <= 128 else 256
        packed, counts, win, n_pad = pack_blocked(
            start, end, n, W, B, L, cap_multiple=chunk
        )
        nbw, _, cap = packed.shape
        print(f"W={W} B={B}: cap={cap} nbw={nbw} "
              f"packed={packed.nbytes/1e6:.0f}MB", flush=True)
        target32 = _capped_target_host(start, end, n_pad, m)

        packed_u16 = jnp.asarray(packed.astype(np.uint16))
        counts_flat = jnp.zeros(1, jnp.int32)
        target_i8 = jnp.asarray(target32.astype(np.int8))

        @jax.jit
        def widen(pu16, ti8):
            p32 = pu16.astype(jnp.int32)
            p32 = jnp.where(p32 == 0xFFFF, jnp.int32(-1), p32)
            return p32, ti8.astype(jnp.int32).reshape(W, win)

        packed_d, target_d = widen(packed_u16, target_i8)
        packed_d.block_until_ready()
        print("uploaded", flush=True)

        for mode in MODES:
            run_mode(mode, packed_d, counts_flat, target_d, W, B, L, cap,
                     chunk, nbw)


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    main()
