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
    arena_generation,
    blocked_selection_pass,
    blocked_windowed_sweep,
    expand_flat_codes,
    mask_select,
    pack_blocked,
    pack_flat_direct,
    pack_flat_u16,
)
from genome_downsampler_tpu.solvers.base import Solution, Solver
from genome_downsampler_tpu.solvers.device_sweep import (
    DEFAULT_MAX_SPAN,
    reconstruct_selection,
)
from genome_downsampler_tpu.utils.logging import get_logger

_log = get_logger("solvers.blocked_sweep")


class _Phase:
    """Wall-clock phase tracing for the blocked solve (stderr at DEBUG, or
    always when GD_TRACE_PHASES is set) — the bench post-mortems depend on
    knowing where a multi-second e2e went on the relay-attached dev TPU."""

    def __init__(self):
        import os
        import time

        self.force = bool(os.environ.get("GD_TRACE_PHASES"))
        self.t = time.perf_counter()
        self.clock = time.perf_counter
        self.laps: dict[str, float] = {}

    def lap(self, what: str):
        now = self.clock()
        dt = now - self.t
        self.t = now
        self.laps[what] = round(dt, 3)
        if self.force:
            import sys

            print(f"[blocked {what}] {dt:.2f}s", file=sys.stderr, flush=True)
        else:
            _log.debug("phase %s: %.2fs", what, dt)


def _selection_mask(p32, sel, n_windows, block, max_span, win):
    """Device-side identity reconstruction: per end bucket, the first
    ``sel[e]`` reads by (start, index) — identical rule to
    ``device_sweep.reconstruct_selection`` — computed as a bitmask over
    packed slots so the readback is ~R/8 bytes instead of ``n`` counts.

    Order: two stable argsorts (LSD radix: by start, then by end) give
    (end, start, slot) order; a slot tie-breaks identically to the original
    read index because equal (start, end) reads share a pack group, where
    slots are filled in index order. Rank-in-bucket = position minus the
    bucket's first position (a running max over bucket heads).
    """
    W, B, L = n_windows, block, max_span
    nbw, _, cap = p32.shape
    S = nbw * W * cap
    codes = p32.reshape(S)
    imax = jnp.int32(2**31 - 1)
    valid = codes >= 0
    sidx = jnp.arange(S, dtype=jnp.int32)
    t_idx = sidx // (W * cap)
    w_idx = (sidx // cap) % W
    start = w_idx * win + t_idx * B + codes // L
    end = start + codes % L
    start_key = jnp.where(valid, start, imax)
    end_key = jnp.where(valid, end, imax)
    o1 = jnp.argsort(start_key, stable=True)
    o = o1[jnp.argsort(end_key[o1], stable=True)]
    e_sorted = end_key[o]
    first = jnp.concatenate(
        [jnp.ones(1, bool), e_sorted[1:] != e_sorted[:-1]]
    )
    first_idx = jax.lax.cummax(jnp.where(first, sidx, 0))
    rank = sidx - first_idx
    c = sel[jnp.clip(e_sorted, 0, sel.shape[0] - 1)].astype(jnp.int32)
    take_sorted = (rank < c) & (e_sorted < imax)
    n_selected = jnp.sum(take_sorted.astype(jnp.int32))
    mask = jnp.zeros(S, bool).at[o].set(take_sorted)
    bits = jnp.sum(
        mask.reshape(S // 8, 8).astype(jnp.uint8)
        << jnp.arange(8, dtype=jnp.uint8),
        axis=1, dtype=jnp.uint8,
    )
    return bits, n_selected


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "block", "max_span", "chunk", "interpret",
        "win", "static_chunks", "out_dtype", "max_coverage", "cap",
    ),
)
def _blocked_pipeline_mask(
    packed: jax.Array,
    counts: jax.Array,
    target: jax.Array | None,
    n_windows: int,
    block: int,
    max_span: int,
    chunk: int,
    interpret: bool,
    win: int,
    static_chunks: bool = False,
    out_dtype: str = "int32",  # kept for signature parity; mask is uint8
    max_coverage: int = 0,
    xwin: jax.Array | None = None,
    cap: int = 0,  # static; required when packed is the FLAT code stream
):
    """Like ``_blocked_pipeline`` but reconstructs on device: returns
    ``(mask_bits[S//8] uint8, n_selected, rounds)`` — the full solve plus
    identity assignment in ONE dispatch, shipping back bits instead of
    per-position counts (transfer diet stage 2). ``target=None`` derives
    the capped target in-kernel from ``max_coverage`` (no target array
    is built, shipped, or stored at all). ``xwin`` (required) carries the
    host-computed cross-window bucket offsets for the reconstruction
    kernel; when it is None the argsort fallback engine runs instead
    (kept for cross-validation; its TPU sort compiles minutes-slow).

    A 1-D uint16 ``packed`` is the FLAT valid-code stream (transfer diet
    stage 3): it expands to the padded layout on device, so H2D carries R
    codes instead of groups * cap slots."""
    if packed.ndim == 1:
        p32 = expand_flat_codes(packed, counts, win // block, n_windows, cap)
    elif packed.dtype == jnp.uint16:
        p32 = packed.astype(jnp.int32)
        p32 = jnp.where(p32 == 0xFFFF, jnp.int32(-1), p32)
    else:
        p32 = packed
    auto = target is None
    tgt = None if auto else target.astype(jnp.int32).reshape(n_windows, win)
    sel, rounds = blocked_windowed_sweep(
        p32, counts, tgt, n_windows, block, max_span, chunk, interpret,
        static_chunks=static_chunks,
        auto_target=auto, max_coverage=max_coverage,
    )
    if xwin is None:
        bits, n_selected = _selection_mask(
            p32, sel, n_windows, block, max_span, win
        )
        return bits, n_selected, rounds
    selbytes = blocked_selection_pass(
        p32, counts, sel, xwin, n_windows, block, max_span, chunk,
        interpret, static_chunks,
    )
    flat = selbytes.reshape(-1)
    n_selected = jnp.sum(flat.astype(jnp.int32))
    bits = jnp.sum(
        flat.reshape(-1, 8).astype(jnp.uint8)
        << jnp.arange(8, dtype=jnp.uint8),
        axis=1, dtype=jnp.uint8,
    )
    return bits, n_selected, rounds


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "block", "max_span", "chunk", "interpret",
        "win", "static_chunks", "out_dtype", "max_coverage",
    ),
)
def _blocked_pipeline(
    packed: jax.Array,   # int32 | uint16 [nbw, W, cap] (u16 sentinel 0xFFFF)
    counts: jax.Array,   # int32[nbw, W]
    target: jax.Array | None,  # int8/16/32 [W * win]; None = in-kernel
    n_windows: int,
    block: int,
    max_span: int,
    chunk: int,
    interpret: bool,
    win: int,
    static_chunks: bool = False,
    out_dtype: str = "int32",
    max_coverage: int = 0,
):
    """Dtype restoration + relaxed blocked sweep as ONE compiled program.

    Transfer diet for the dev relay (and any PCIe-attached host): read codes
    ship as uint16 when ``block * max_span <= 2^16`` (sentinel -1 becomes
    0xFFFF under the int32 -> uint16 cast, restored here), the target ships
    at the narrowest dtype that holds ``max_coverage``, and the selection
    ships back at that same width (``sel_per_end[e] <= max(target)``: the
    sweep only takes against a deficit, so selected reads covering any
    position never exceed the target there). The kernel itself always runs
    int32."""
    if packed.dtype == jnp.uint16:
        p32 = packed.astype(jnp.int32)
        p32 = jnp.where(p32 == 0xFFFF, jnp.int32(-1), p32)
    else:
        p32 = packed
    auto = target is None
    tgt = None if auto else target.astype(jnp.int32).reshape(n_windows, win)
    sel, rounds = blocked_windowed_sweep(
        p32, counts, tgt, n_windows, block, max_span, chunk, interpret,
        static_chunks=static_chunks,
        auto_target=auto, max_coverage=max_coverage,
    )
    return sel.astype(out_dtype), rounds


def _capped_target_host(
    start: np.ndarray, end: np.ndarray, n_pad: int, max_coverage: int
) -> np.ndarray:
    """min(coverage, M) per base as int32[n_pad], computed host-side (C
    threaded histogram, numpy fallback) — cheaper than shipping start/end
    to the device just to scatter them."""
    try:
        import ctypes

        from genome_downsampler_tpu.io.build import build_bamio

        lib = ctypes.CDLL(str(build_bamio()))
        lib.gd_capped_target.restype = ctypes.c_int64
        lib.gd_capped_target.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        s = np.ascontiguousarray(start, np.int64)
        e = np.ascontiguousarray(end, np.int64)
        out = np.empty(n_pad, np.int32)
        rc = lib.gd_capped_target(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            s.shape[0], n_pad, int(max_coverage),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
    except OSError:
        pass
    d = np.bincount(start, minlength=n_pad + 1).astype(np.int64)
    d[1:] -= np.bincount(end, minlength=n_pad + 1)[: n_pad]
    return np.minimum(np.cumsum(d[:n_pad]), max_coverage).astype(np.int32)


def _cross_window_offsets(
    start: np.ndarray, end: np.ndarray, win: int, W: int, B: int, L: int
) -> np.ndarray:
    """xwin[w, e'] = count of reads from windows < w whose end falls at
    window-w-relative position e' — the bucket-rank offset those reads
    contribute (their starts are all smaller than any window-w start).
    Tiny: only reads within max_span of a window boundary qualify."""
    xw = np.zeros((W, B + L), np.int32)
    if len(start) == 0:
        return xw
    w_id = start // win
    spill = np.flatnonzero(end >= (w_id + 1) * win)
    if len(spill):
        rows = w_id[spill] + 1
        cols = end[spill] - rows * win
        np.add.at(xw, (rows, cols), 1)
    return xw


def _narrow_dtype(max_value: int) -> np.dtype:
    if max_value <= np.iinfo(np.int8).max:
        return np.dtype(np.int8)
    if max_value <= np.iinfo(np.int16).max:
        return np.dtype(np.int16)
    return np.dtype(np.int32)


class BlockedWindowedMcpSolver(Solver):
    """Exact minimum-read-count solver, O(R) device memory, W-way parallel.

    ``device_reconstruct`` (default) runs the identity assignment on device
    too and reads back a per-slot bitmask (~R/8 bytes) instead of ``n``
    per-end counts — solve and reconstruction become ONE device dispatch.
    """

    uses_quality_of_reads = False

    def __init__(
        self,
        n_windows: int | None = None,
        block: int | None = None,
        max_span: int = DEFAULT_MAX_SPAN,
        chunk: int | None = None,
        interpret: str | bool = "auto",
        device_reconstruct: bool = True,
    ):
        self.n_windows = n_windows
        self.block = block
        self.max_span = max_span
        self.chunk = chunk
        self.interpret = interpret
        self.device_reconstruct = device_reconstruct
        # filled by solve(): relaxation rounds actually used, geometry
        self.last_stats: dict | None = None

    def _interpret(self) -> bool:
        if self.interpret == "auto":
            from genome_downsampler_tpu.ops.pallas_sweep import tpu_available

            return not tpu_available()
        return bool(self.interpret)

    def _geometry(self, n: int, span_max: int, density: float = 0.0):
        """(W, B, L, chunk) for this genome. More windows = fewer sequential
        positions per pass (relaxation rounds stay ~2 at ~60x, measured r4);
        W is capped so each window keeps >= 8 blocks of genome, and B
        shrinks at W=64 to keep the (B, W, L) f32 tile inside VMEM (16 MB).

        ``density`` = input coverage (reads * mean_span / n). Deep coverage
        (>= ~150x, the config-4 regime) caps the geometry at W=32
        (B stays 128 — the VMEM gate below rules out B=256 at W=32):
        carry corrections propagate a genome-metric distance d_p that grows
        with tie density (measured r4/r5: 12 relaxation rounds at 300x
        random starts, the full W-round worst case on adversarially flat
        Weyl starts — seeding cannot fix it, ROADMAP r4 item 4), so fewer,
        longer windows trade round count against pass length at equal
        step totals while HALVING the per-step VPU cost (the sweep state is
        (W, L): 8 vregs at W=32 vs 16 at W=64)."""
        L = self.max_span
        if span_max >= L:  # lane L-1 is the target lane: need span <= L-2
            L = -(-(span_max + 2) // 128) * 128
        W = self.n_windows
        deep = density >= 150.0 and n >= 1_000_000
        if W is None:
            W = 8
            wcap = 32 if deep else 64
            while W < wcap and n // (2 * W) >= 8 * 256:
                W *= 2
        # the reconstruction pass tiles its halo in B-sized steps and needs
        # L % B == 0; L is always a 128-multiple, so B=128 is always legal
        # but B=256 is only legal when the (possibly span-upgraded) L is a
        # 256-multiple. VMEM gate: the binding scratch is the RECON pass's
        # (W, B, B + L) f32 tile (16.7 MB at W=32/B=256/L=256 — measured
        # vmem OOM on chip), not the sweep's (B, W, L) tile the old rule
        # modeled.
        B = self.block or (
            128
            if (W * 256 * (256 + L) * 4 > 14 * 2**20 or L % 256 != 0)
            else 256
        )
        chunk = self.chunk or (128 if B <= 128 else 256)
        return W, B, L, chunk

    def solve(self, max_coverage: int, batch: ReadBatch) -> Solution:
        n = batch.ref_genome_length
        if batch.n_reads == 0:
            return np.zeros(0, np.int64)

        ph = _Phase()
        start = np.asarray(batch.start, np.int64)
        end = np.asarray(batch.end, np.int64)
        span_max = int((end - start).max()) + 1 if len(start) else 1
        # density = input coverage; a 4096-read sample of the mean span is
        # plenty (only the >=150x geometry threshold consumes it)
        density = float(len(start)) * max(
            float(np.mean((end[:4096] - start[:4096]) + 1)), 1.0
        ) / max(n, 1)
        W, B, L, chunk = self._geometry(n, span_max, density)
        # cap rides the jit key; a fixed floor keeps it stable across
        # nonce'd datasets at a given scale so XLA/relay compile caches hit
        # (the padding lives only in device HBM — the H2D stream is flat)
        cap_floor = 2 * chunk if self.device_reconstruct else 0
        flat_path = self.device_reconstruct and B * L <= 1 << 16
        if flat_path:
            try:
                # pack STRAIGHT to the flat uint16 stream: no padded int32
                # arena is built at all (the two-step path filled ~2.5x of
                # sentinel padding only to compact it away — ~1 GB at chr1
                # scale, the largest host cost of the device solve)
                packed, counts, win, n_pad, cap, slots = pack_flat_direct(
                    start, end, n, W, B, L,
                    cap_multiple=chunk, cap_floor=cap_floor,
                )
            except (OSError, AttributeError):
                # native lib unavailable, or a stale GD_BAMIO_SO override
                # without the symbol: two-step fallback
                flat_path = False
        if not flat_path:
            res = pack_blocked(
                start, end, n, W, B, L,
                cap_multiple=chunk, return_slots=self.device_reconstruct,
                cap_floor=cap_floor,
            )
            if self.device_reconstruct:
                packed, counts, win, n_pad, slots = res
            else:
                packed, counts, win, n_pad = res
            cap = packed.shape[2]
            if self.device_reconstruct and B * L <= 1 << 16:
                # transfer diet stage 3 via the two-step compaction (numpy
                # fallback path). Real codes are <= B*L - 2 (span cap is
                # L-1), so the 0xFFFF sentinel never collides.
                packed = pack_flat_u16(packed, counts)
        ph.lap("pack")
        # counts ride SMEM (scalar prefetch); past ~512 KB switch to the
        # counts-free kernel variant (same auto rule as parallel/blocked_mesh)
        static_chunks = (win // B) * W * 4 > 512 * 1024
        # `slots` (and the packed/counts views) are zero-copy C-arena views:
        # snapshot the generation now and verify it before consuming slots
        # at the end of the solve, so any interleaved pack call (a second
        # solver instance, an overlapping warmup) fails loudly instead of
        # silently corrupting the selection
        arena_gen0 = arena_generation()

        small = _narrow_dtype(int(max_coverage))

        if self.device_reconstruct:
            # target derived in-kernel (auto_target): nothing to compute or
            # ship — the r3 path built an n-length capped-coverage array on
            # the host and transferred it every solve
            xwin = _cross_window_offsets(start, end, win, W, B, L)
            bits, n_selected, _rounds = _blocked_pipeline_mask(
                jnp.asarray(packed),
                jnp.asarray(np.ascontiguousarray(counts)),
                None,
                W,
                B,
                L,
                chunk,
                self._interpret(),
                win,
                static_chunks=static_chunks,
                max_coverage=int(max_coverage),
                xwin=jnp.asarray(xwin),
                cap=cap,
            )
            ph.lap("device dispatch")
            bits_np = np.asarray(bits)
            ph.lap("bits readback")
            self.last_stats = {
                "rounds": int(_rounds), "n_windows": W, "block": B,
                "positions_per_pass": win, "phases_s": ph.laps,
            }
            if arena_generation() != arena_gen0:
                raise RuntimeError(
                    "native pack arenas were overwritten mid-solve "
                    "(interleaved pack call); slots view is stale"
                )
            out = mask_select(bits_np, slots)
            ph.lap("bit test")
            if len(out) != int(n_selected):
                raise RuntimeError(
                    "device mask readback mismatch: "
                    f"{len(out)} != {int(n_selected)}"
                )
            return out

        sel_per_end, _rounds = _blocked_pipeline(
            jnp.asarray(packed),
            jnp.asarray(counts),
            None,
            W,
            B,
            L,
            chunk,
            self._interpret(),
            win,
            static_chunks=static_chunks,
            out_dtype=str(small),
            max_coverage=int(max_coverage),
        )
        self.last_stats = {
            "rounds": int(_rounds), "n_windows": W, "block": B,
            "positions_per_pass": win,
        }
        sel_np = np.asarray(sel_per_end)[:n].astype(np.int64)
        return reconstruct_selection(start, end, sel_np)
