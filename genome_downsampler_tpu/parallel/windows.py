"""Genome-window parallelism for the sweep solver (single chip: vmap).

The genome coordinate line is this domain's sequence dimension (SURVEY.md
section 5.7). The exact sweep has a sequential carry — the two L-vectors
``(avail, selend)`` describing reads still covering positions past a window
boundary — so windows cannot run independently. Instead of approximating
the boundary (any pointwise target split double-covers the strip, because
reads physically span the cut), the carry chain is solved by **parallel
fixed-point relaxation**:

- every round, all ``W`` windows sweep *in parallel* (vmap here, shard_map
  in ``parallel.mesh``), each seeded with the carry its left neighbor
  produced in the previous round;
- window 0's carry-in is exactly right from round 0 (zeros), so after round
  ``k`` the first ``k+1`` windows are exactly correct — convergence in at
  most ``W`` rounds is guaranteed, and the carries typically stabilize in
  2-3 rounds because the greedy state forgets its history quickly (whenever
  a deficit tops coverage up to the target, different histories produce the
  same running totals);
- iteration stops when all carries are unchanged (a ``lax.while_loop`` on
  device), at which point the emitted per-end counts are **bit-identical to
  the global sequential greedy** — windowing is exact, not a relaxation.

Per-round cost: W parallel sweeps of length ``n/W``; cross-window traffic is
two L-vectors per boundary per round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.ops.coverage import capped_coverage, coverage_from_intervals
from genome_downsampler_tpu.solvers.base import Solution, Solver
from genome_downsampler_tpu.solvers.device_sweep import (
    DEFAULT_MAX_SPAN,
    build_start_rows,
    reconstruct_selection,
    sweep_counts,
)


@functools.partial(jax.jit, static_argnames=("n_windows", "win", "max_span"))
def windowed_sweep_counts(
    rows: jax.Array,    # int32[n, L]  reads bucketed by absolute start
    target: jax.Array,  # int32[n]     global capped coverage target
    n_windows: int,
    win: int,
    max_span: int,
):
    """Exact global sweep via parallel carry relaxation.

    Returns ``(sel_per_end[n], rounds_used)`` — identical to running
    ``sweep_counts`` over the whole genome, computed with W-way parallelism.
    """
    W, L = n_windows, max_span
    rows_w = rows.reshape(W, win, L)
    target_w = target.reshape(W, win)

    def sweep_all(carry_a, carry_s):
        return jax.vmap(
            lambda r, t, a, s: sweep_counts(r, t, a, s, max_span)
        )(rows_w, target_w, carry_a, carry_s)

    zeros = jnp.zeros((W, L), jnp.int32)
    sel, a_out, s_out = sweep_all(zeros, zeros)

    def shift(c_out):
        return jnp.concatenate([jnp.zeros((1, L), jnp.int32), c_out[:-1]], axis=0)

    def cond(state):
        k, a_in, s_in, sel, a_out, s_out = state
        stable = jnp.all(shift(a_out) == a_in) & jnp.all(shift(s_out) == s_in)
        return (~stable) & (k < W)

    def body(state):
        k, _, _, _, a_out, s_out = state
        a_in, s_in = shift(a_out), shift(s_out)
        sel, a_out2, s_out2 = sweep_all(a_in, s_in)
        return (k + 1, a_in, s_in, sel, a_out2, s_out2)

    k, _, _, sel, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), zeros, zeros, sel, a_out, s_out)
    )
    return sel.reshape(W * win), k


class WindowedMcpSolver(Solver):
    """Exact MCP with W-way window parallelism — the scaling path for long
    genomes; produces the same selection as the global sweep/greedy."""

    uses_quality_of_reads = False

    def __init__(
        self,
        n_windows: int = 8,
        max_span: int = DEFAULT_MAX_SPAN,
        pad_multiple: int = 4096,
    ):
        self.n_windows = n_windows
        self.max_span = max_span
        self.pad_multiple = pad_multiple

    def solve(self, max_coverage: int, batch: ReadBatch) -> Solution:
        n = batch.ref_genome_length
        if batch.n_reads == 0:
            return np.zeros(0, np.int64)
        span_host = batch.end - batch.start + 1
        if int(span_host.max()) > self.max_span:
            raise ValueError(
                f"read span {int(span_host.max())} exceeds max_span={self.max_span}"
            )
        W = self.n_windows
        win = -(-n // W)
        if win < self.max_span:
            raise ValueError(
                f"window length {win} must be >= max_span={self.max_span}; "
                "use fewer windows"
            )
        n_pad = W * win

        arrays, valid = batch.padded(self.pad_multiple)
        start = jnp.asarray(arrays["start"])
        endv = jnp.asarray(arrays["end"])
        w = jnp.asarray(valid).astype(jnp.int32)
        span = endv - start + 1

        rows = build_start_rows(start, span, w, n_pad, self.max_span)
        cov = coverage_from_intervals(start, endv, n_pad, w)
        target = capped_coverage(cov, int(max_coverage))

        sel_per_end, _rounds = windowed_sweep_counts(
            rows, target, W, win, self.max_span
        )
        return reconstruct_selection(
            np.asarray(batch.start, np.int64),
            np.asarray(batch.end, np.int64),
            np.asarray(sel_per_end),
        )
