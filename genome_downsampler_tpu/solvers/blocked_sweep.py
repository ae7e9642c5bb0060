"""Large-genome exact MCP solver: blocked multi-window Pallas sweep.

This is the production device path for genomes where the dense ``(n, L)``
histogram of ``device_sweep.py`` would not fit (E. coli ~5 Mb and up —
BASELINE.md configs 4-5). Device memory is O(R + n): packed read codes, the
capped-coverage target, and the per-end output. See
``ops/pallas_blocked.py`` for the kernel design.

Selection semantics are identical to ``McpDeviceSweepSolver`` (exact
minimum-count; reference parity notes there) because the relaxed windowed
sweep is bit-identical to the global sweep at its fixed point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.ops.pallas_blocked import (
    blocked_windowed_sweep,
    pack_blocked,
)
from genome_downsampler_tpu.solvers.base import Solution, Solver
from genome_downsampler_tpu.solvers.device_sweep import (
    DEFAULT_MAX_SPAN,
    reconstruct_selection,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "block", "max_span", "chunk", "interpret",
        "n_pad", "win", "max_coverage",
    ),
)
def _blocked_pipeline(
    packed: jax.Array,   # int32[nbw, W, cap]
    counts: jax.Array,   # int32[nbw, W]
    start: jax.Array,    # int32[R]
    end: jax.Array,      # int32[R]
    n_windows: int,
    block: int,
    max_span: int,
    chunk: int,
    interpret: bool,
    n_pad: int,
    win: int,
    max_coverage: int,
):
    """Capped-coverage target + relaxed blocked sweep as ONE compiled
    program (one dispatch over the dev relay; eager scatter/cumsum here
    previously cost 10x the kernel time)."""
    s = jnp.clip(start, 0, n_pad)
    e1 = jnp.clip(end + 1, 0, n_pad)
    diff = (
        jnp.zeros(n_pad + 1, jnp.int32)
        .at[s].add(1, mode="drop")
        .at[e1].add(-1, mode="drop")
    )
    target = jnp.minimum(
        jnp.cumsum(diff)[:n_pad], jnp.int32(max_coverage)
    ).reshape(n_windows, win)
    return blocked_windowed_sweep(
        packed, counts, target, n_windows, block, max_span, chunk, interpret
    )


class BlockedWindowedMcpSolver(Solver):
    """Exact minimum-read-count solver, O(R) device memory, W-way parallel."""

    uses_quality_of_reads = False

    def __init__(
        self,
        n_windows: int = 8,
        block: int = 256,
        max_span: int = DEFAULT_MAX_SPAN,
        chunk: int = 256,
        interpret: str | bool = "auto",
    ):
        self.n_windows = n_windows
        self.block = block
        self.max_span = max_span
        self.chunk = chunk
        self.interpret = interpret

    def _interpret(self) -> bool:
        if self.interpret == "auto":
            from genome_downsampler_tpu.ops.pallas_sweep import tpu_available

            return not tpu_available()
        return bool(self.interpret)

    def solve(self, max_coverage: int, batch: ReadBatch) -> Solution:
        n = batch.ref_genome_length
        if batch.n_reads == 0:
            return np.zeros(0, np.int64)

        start = np.asarray(batch.start, np.int64)
        end = np.asarray(batch.end, np.int64)
        packed, counts, win, n_pad = pack_blocked(
            start, end, n, self.n_windows, self.block, self.max_span,
            cap_multiple=self.chunk,
        )

        sel_per_end, _rounds = _blocked_pipeline(
            jnp.asarray(packed),
            jnp.asarray(counts),
            jnp.asarray(start.astype(np.int32)),
            jnp.asarray(end.astype(np.int32)),
            self.n_windows,
            self.block,
            self.max_span,
            self.chunk,
            self._interpret(),
            n_pad,
            win,
            int(max_coverage),
        )
        sel_np = np.asarray(sel_per_end)[:n]
        return reconstruct_selection(start, end, sel_np)
