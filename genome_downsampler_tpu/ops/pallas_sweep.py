"""Pallas TPU kernel for the water-filling sweep.

The ``lax.scan`` formulation of the sweep (``solvers/device_sweep.py``) pays
XLA while-loop overhead per genome position (~us each). This kernel runs the
entire scan *inside one Pallas call*: the carry (two L-lane count vectors)
lives in VMEM scratch across the whole grid, position blocks of the
read-start histogram stream HBM -> VMEM through the BlockSpec pipeline
(double-buffered by the Mosaic compiler), and each position costs ~a dozen
VPU ops on two vregs. The sequential dependency chain — not bandwidth or
FLOPs — sets the floor, which is exactly where a scan-shaped workload should
sit on this hardware.

Math per position p (identical to ``sweep_counts``):
    avail  += rows[p]                                  # reads starting at p
    deficit = max(target[p] - sum(selend), 0)
    s_above = sum(avail) - cumsum(avail)               # stock beyond slot k
    take    = clip(deficit - s_above, 0, avail)        # farthest-first
    avail  -= take; selend += take
    emit selend[0]; shift both left one slot
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tpu_available() -> bool:
    """True when the default JAX backend is a TPU (incl. the axon relay)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _lane_cumsum(x: jax.Array, L: int) -> jax.Array:
    """Inclusive prefix sum along the lane axis (Hillis-Steele log-scan).

    Mosaic has no ``cumsum`` lowering; ``log2(L)`` roll+mask+add steps on the
    VPU replace it.
    """
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < L:
        shifted = pltpu.roll(x, d, 1)
        x = x + jnp.where(lane_idx >= d, shifted, 0)
        d *= 2
    return x


def _sweep_kernel(
    rows_ref,      # int32[B, L] VMEM — SUFFIX histogram rows (see caller)
    target_ref,    # int32[1, B] SMEM — scalar reads at dynamic lane index
    avail0_ref,    # int32[1, L] VMEM — carry-in (window relaxation)
    selend0_ref,   # int32[1, L] VMEM
    out_ref,       # int32[1, B] SMEM — selected count per end position
    availf_ref,    # int32[1, L] VMEM — carry-out
    selendf_ref,   # int32[1, L] VMEM
    avail_s,       # scratch VMEM (1, L)
    selend_s,      # scratch VMEM (1, L)
    *,
    block: int,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    L = avail_s.shape[1]

    @pl.when(b == 0)
    def _():
        avail_s[:] = avail0_ref[:]
        selend_s[:] = selend0_ref[:]

    zero_last = (
        jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) < L - 1
    ).astype(jnp.int32)

    def body(i, carry):
        # Suffix-state take-split (see ops/pallas_blocked.py for the
        # derivation): F[k] = stock at end-slots >= k; arrival rows come
        # pre-suffix-summed, the farthest-first take needs no scan, and
        # the state rides the loop carry (vector registers).
        F_in, selend, cur = carry
        F = F_in + rows_ref[pl.ds(i, 1), :]
        G = pltpu.roll(F, L - 1, 1) * zero_last
        avail = F - G
        deficit = target_ref[0, i] - cur
        take = jnp.clip(deficit - G, 0, avail)
        taken = jnp.minimum(jnp.maximum(deficit, 0), F[0, 0])
        F2 = F - jnp.minimum(taken, F)
        selend2 = selend + take
        emitted = selend2[0, 0]
        out_ref[0, i] = emitted
        return (
            pltpu.roll(F2, L - 1, 1) * zero_last,
            pltpu.roll(selend2, L - 1, 1) * zero_last,
            cur + taken - emitted,
        )

    # carry interface stays avail-shaped; convert to/from suffix per pass
    pref0 = _lane_cumsum(avail_s[0:1, :], L)
    F0 = pref0[:, L - 1 : L] - pref0 + avail_s[0:1, :]
    cur0 = jnp.sum(selend_s[0:1, :])
    F_f, selend_f, _ = jax.lax.fori_loop(
        0, block, body, (F0, selend_s[0:1, :], cur0)
    )
    avail_f = F_f - pltpu.roll(F_f, L - 1, 1) * zero_last
    avail_s[:] = avail_f
    selend_s[:] = selend_f

    @pl.when(b == nb - 1)
    def _():
        availf_ref[:] = avail_f
        selendf_ref[:] = selend_f


@functools.partial(
    jax.jit, static_argnames=("max_span", "block", "interpret")
)
def pallas_sweep_counts(
    rows: jax.Array,    # int32[n, L]
    target: jax.Array,  # int32[n]
    avail0: jax.Array,  # int32[L]
    selend0: jax.Array,  # int32[L]
    max_span: int,
    block: int = 512,
    interpret: bool = False,
):
    """Drop-in replacement for ``sweep_counts`` running as one Pallas kernel.

    Returns ``(sel_per_end[n], avail_out[L], selend_out[L])``.
    """
    n, L = rows.shape
    assert L == max_span
    assert n % block == 0, f"n={n} must be a multiple of block={block}"
    nb = n // block

    # suffix-sum the arrival rows once (fused into the surrounding jit):
    # the kernel's state is the suffix form (see _sweep_kernel)
    rows = jnp.cumsum(rows[:, ::-1], axis=1)[:, ::-1]

    out, availf, selendf = pl.pallas_call(
        functools.partial(_sweep_kernel, block=block),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda b: (0, b), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block), lambda b: (0, b), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
        ],
        interpret=interpret,
    )(rows, target.reshape(1, n), avail0.reshape(1, L), selend0.reshape(1, L))
    return out.reshape(n), availf.reshape(L), selendf.reshape(L)
