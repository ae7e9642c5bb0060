"""Blocked multi-window Pallas sweep: the large-genome device path.

The baseline device path materializes a dense ``(n, L)`` read-start
histogram (``solvers/device_sweep.build_start_rows``) — 5 GB at E. coli
scale (n = 5 Mb, L = 256) and impossible at chr1 scale. This kernel removes
the dense array entirely:

- **HBM holds O(R) read codes, not O(n*L).** Reads are bucketed host-side
  by (window, block) into a padded code array; a code packs
  ``start_rel * L + (span - 1)`` into one int32. Sentinel ``-1`` pads.
- **The histogram tile is built in-kernel on the MXU.** For each grid step
  a ``(B, L)`` tile per window is accumulated as ``onehot(start_rel)^T @
  onehot(span)`` over chunks of codes — a one-hot matmul, the canonical TPU
  scatter. f32 accumulation is exact below 2^24 counts per cell.
- **W genome windows ride the sublane axis.** The sweep carry for one
  window is two ``(1, L)`` vectors that leave 7 of 8 sublanes idle; packing
  W=8 windows gives an ``(8, L)`` state with the *same* vector-register
  footprint, so all eight windows advance in one chain of VPU ops —
  8x position throughput per pass.
- **Windows couple only through the boundary carry**, solved by Jacobi
  fixed-point relaxation exactly as ``parallel/windows.py``: each round
  seeds window ``w`` with window ``w-1``'s carry-out from the previous
  round; window 0 is exact immediately, so exactness propagates at least
  one window per round and the loop stops when carries stabilize. At the
  fixed point the selection is bit-identical to the global sequential
  sweep.

Parity note: this is the scaling replacement for the reference's CUDA
push-relabel solver (``/root/reference/libs/qmcp-solver/src/
quasi_mcp_cuda_max_flow_solver.cu``), whose CSR graph is likewise O(R + n)
— but where that kernel iterates to convergence with atomics, this one is a
single deterministic sweep per relaxation round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genome_downsampler_tpu.ops.pallas_sweep import _lane_cumsum


_ARENA_GEN = 0


def arena_generation() -> int:
    """Monotone counter of native-arena pack calls.

    ``pack_blocked`` / ``pack_flat_u16`` / ``pack_to_u16`` return ZERO-COPY
    views of shared process-lifetime C arenas; any later pack call silently
    repurposes that memory. Consumers that hold a view across other work
    (e.g. ``slots`` held for the whole device dispatch and only consumed by
    ``mask_select`` at the end of a solve) snapshot this counter when the
    view is created and assert it is unchanged when the view is consumed,
    so stale-view reuse fails loudly instead of corrupting the selection.
    """
    return _ARENA_GEN


def _bump_arena_gen():
    global _ARENA_GEN
    _ARENA_GEN += 1


def pack_blocked(
    start: np.ndarray,
    end: np.ndarray,
    n: int,
    n_windows: int,
    block: int,
    max_span: int,
    cap_multiple: int = 256,
    use_native: bool = True,
    return_slots: bool = False,
    cap_floor: int = 0,
):
    """Bucket reads into per-(block, window) padded code lists (host side).

    Returns ``(packed[nbw, W, cap], counts[nbw, W], win, n_pad)`` where
    ``win = nbw * block`` is the per-window length and ``n_pad = W * win``.
    ``packed[t, w, s]`` holds ``start_rel * L + (span - 1)`` for the s-th
    read whose start lies in block ``t`` of window ``w``; ``-1`` pads.
    (Lane axis = cap, a 128-multiple: the natural VMEM tiling.)

    ``return_slots=True`` appends ``slots[R]`` — each read's flat index into
    ``packed`` — used to address the device-computed selection bitmask.
    """
    W, B, L = n_windows, block, max_span
    win = -(-n // W)
    win = -(-win // B) * B
    nbw = win // B
    n_pad = W * win

    start = np.asarray(start, np.int64)
    end = np.asarray(end, np.int64)
    span = end - start + 1
    # spans are capped at L-1: the kernel reserves code lane L-1 for the
    # injected per-position target (see _blocked_kernel)
    if span.size and int(span.max()) > L - 1:
        raise ValueError(
            f"read span {int(span.max())} exceeds max_span-1={L - 1} "
            "(lane L-1 is the target lane); raise max_span"
        )

    if use_native and start.size:
        try:
            return _pack_blocked_native(
                start, end, n, W, B, L, cap_multiple, return_slots,
                cap_floor,
            )
        except OSError:  # native lib unavailable: numpy fallback below
            pass

    w_id = start // win
    t_id = (start % win) // B
    start_rel = start % B
    code = (start_rel * L + (span - 1)).astype(np.int32)

    group = t_id * W + w_id  # group key in (t, w) order
    # groups are code-sorted (stable by index) — the order contract of the
    # device reconstruction mask; see gd_pack_blocked
    order = np.argsort(group.astype(np.int64) * (B * L) + code, kind="stable")
    g_sorted = group[order]
    counts_flat = np.bincount(g_sorted, minlength=nbw * W).astype(np.int32)
    cap = int(counts_flat.max()) if counts_flat.size else 0
    cap = max(cap_multiple, cap_floor, -(-cap // cap_multiple) * cap_multiple)

    # rank of each read within its group
    group_starts = np.zeros(nbw * W + 1, np.int64)
    np.cumsum(counts_flat, out=group_starts[1:])
    rank = np.arange(start.size, dtype=np.int64) - group_starts[g_sorted]

    packed = np.full((nbw, W, cap), -1, np.int32)
    t_s = g_sorted // W
    w_s = g_sorted % W
    packed[t_s, w_s, rank] = code[order]
    counts = counts_flat.reshape(nbw, W)
    if return_slots:
        slots = np.empty(start.size, np.int64)
        slots[order] = g_sorted * cap + rank
        return packed, counts, win, n_pad, slots
    return packed, counts, win, n_pad


def _pack_blocked_native(start, end, n, W, B, L, cap_multiple,
                         return_slots=False, cap_floor=0):
    """C counting-sort packing (io/csrc/greedy.cpp gd_pack_blocked) — the
    numpy argsort path costs minutes at 10M+ reads on slow-fault VMs.

    Returned arrays are ZERO-COPY VIEWS of process-lifetime C arenas:
    valid only until the next ``pack_blocked`` call. Every consumer either
    transfers them to device or finishes with them inside one solve; the
    copies this used to make were pure first-touch page-fault cost
    (~1-2 s/call at 6M reads on the dev VM)."""
    import ctypes

    from genome_downsampler_tpu.io.build import build_bamio

    lib = ctypes.CDLL(str(build_bamio()))
    lib.gd_pack_blocked.restype = ctypes.c_int64
    lib.gd_pack_blocked.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
    ]
    s = np.ascontiguousarray(start, np.int64)
    e = np.ascontiguousarray(end, np.int64)
    p_packed = ctypes.POINTER(ctypes.c_int32)()
    p_counts = ctypes.POINTER(ctypes.c_int32)()
    p_slots = ctypes.POINTER(ctypes.c_int64)()
    win = ctypes.c_int64()
    cap = ctypes.c_int64()
    rc = lib.gd_pack_blocked(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        s.shape[0], n, W, B, L, cap_multiple, cap_floor, 8,
        ctypes.byref(p_packed), ctypes.byref(p_counts),
        ctypes.byref(win), ctypes.byref(cap),
        ctypes.byref(p_slots) if return_slots else None,
    )
    if rc != 0:
        raise ValueError("gd_pack_blocked: invalid reads (span/start bounds)")
    _bump_arena_gen()
    nbw = win.value // B
    packed = np.ctypeslib.as_array(p_packed, shape=(nbw, W, cap.value))
    counts = np.ctypeslib.as_array(p_counts, shape=(nbw, W))
    if return_slots:
        slots = np.ctypeslib.as_array(p_slots, shape=(s.shape[0],))
        return packed, counts, win.value, W * win.value, slots
    return packed, counts, win.value, W * win.value


def pack_flat_direct(
    start: np.ndarray,
    end: np.ndarray,
    n: int,
    n_windows: int,
    block: int,
    max_span: int,
    cap_multiple: int = 256,
    cap_floor: int = 0,
):
    """Pack STRAIGHT to the flat uint16 valid-code stream (plus counts,
    cap, and padded-index slots) without materializing the padded int32
    arena — byte-identical outputs to ``pack_blocked`` + ``pack_flat_u16``
    but skipping the ~2.5x sentinel-padded arena entirely (~1 GB of pure
    fill-and-discard at chr1 scale; the pack phase was the largest
    device-path host cost in the r5 config-5 bench).

    Returns ``(flat_u16[R], counts[nbw, W], win, n_pad, cap, slots[R])``.
    Arrays are zero-copy C-arena views (see ``arena_generation``).
    Raises OSError when the native library is unavailable (callers fall
    back to the two-step path).
    """
    import ctypes

    from genome_downsampler_tpu.io.build import build_bamio

    W, B, L = n_windows, block, max_span
    if B * L > 1 << 16:
        raise ValueError("codes exceed uint16; use pack_blocked")
    lib = ctypes.CDLL(str(build_bamio()))
    lib.gd_pack_flat_direct.restype = ctypes.c_int64
    lib.gd_pack_flat_direct.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
    ]
    s = np.ascontiguousarray(start, np.int64)
    e = np.ascontiguousarray(end, np.int64)
    p_flat = ctypes.POINTER(ctypes.c_uint16)()
    p_counts = ctypes.POINTER(ctypes.c_int32)()
    p_slots = ctypes.POINTER(ctypes.c_int64)()
    win = ctypes.c_int64()
    cap = ctypes.c_int64()
    rc = lib.gd_pack_flat_direct(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        s.shape[0], n, W, B, L, cap_multiple, cap_floor, 8,
        ctypes.byref(p_flat), ctypes.byref(p_counts),
        ctypes.byref(win), ctypes.byref(cap), ctypes.byref(p_slots),
    )
    if rc != 0:
        raise ValueError(
            "gd_pack_flat_direct: invalid reads (span/start bounds)"
        )
    _bump_arena_gen()
    nbw = win.value // B
    flat = np.ctypeslib.as_array(p_flat, shape=(s.shape[0],))
    counts = np.ctypeslib.as_array(p_counts, shape=(nbw, W))
    slots = np.ctypeslib.as_array(p_slots, shape=(s.shape[0],))
    return flat, counts, win.value, W * win.value, cap.value, slots


def pack_flat_u16(packed: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Compact padded codes to the flat valid-codes stream (group order,
    uint16) through the C arena; numpy fallback. The padded device layout
    is rebuilt by ``expand_flat_codes`` after transfer, so H2D carries R
    codes instead of ``groups * cap`` slots (~2.5x less at typical skew).
    The view is valid until the next call."""
    import ctypes

    from genome_downsampler_tpu.io.build import build_bamio

    groups = packed.shape[0] * packed.shape[1]
    cap = packed.shape[2]
    try:
        lib = ctypes.CDLL(str(build_bamio()))
    except OSError:
        flat32 = packed.reshape(groups, cap)
        keep = (
            np.arange(cap)[None, :] < counts.reshape(groups, 1)
        )
        return flat32[keep].astype(np.uint16)
    lib.gd_pack_flat_u16.restype = ctypes.c_int64
    lib.gd_pack_flat_u16.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
    ]
    pk = np.ascontiguousarray(packed.reshape(-1), np.int32)
    ct = np.ascontiguousarray(counts.reshape(-1), np.int32)
    p16 = ctypes.POINTER(ctypes.c_uint16)()
    total = lib.gd_pack_flat_u16(
        pk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ct.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        groups, cap, ctypes.byref(p16),
    )
    _bump_arena_gen()
    return np.ctypeslib.as_array(p16, shape=(int(total),))


def expand_flat_codes(flat_u16, counts, nbw: int, W: int, cap: int):
    """Device-side inverse of ``pack_flat_u16``: scatter the flat stream
    back into the padded (nbw, W, cap) int32 layout with -1 sentinels.
    Runs inside the solve jit; one 25M-element scatter costs ~ms next to a
    multi-second relay transfer of the padded array."""
    G = nbw * W
    R = flat_u16.shape[0]
    c = counts.reshape(G).astype(jnp.int32)
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(c, dtype=jnp.int32)[:-1]]
    )
    g = jnp.repeat(
        jnp.arange(G, dtype=jnp.int32), c, total_repeat_length=R
    )
    idx = jnp.arange(R, dtype=jnp.int32) - off[g] + g * cap
    codes32 = flat_u16.astype(jnp.int32)
    codes32 = jnp.where(codes32 == 0xFFFF, jnp.int32(-1), codes32)
    full = jnp.full(G * cap, jnp.int32(-1)).at[idx].set(codes32)
    return full.reshape(nbw, W, cap)


def pack_to_u16(packed: np.ndarray) -> np.ndarray:
    """Narrow int32 codes to uint16 (sentinel -1 -> 0xFFFF) through the C
    arena — avoids a page-faulting numpy astype copy on the hot path.
    The view is valid until the next call."""
    import ctypes

    from genome_downsampler_tpu.io.build import build_bamio

    try:
        lib = ctypes.CDLL(str(build_bamio()))
    except OSError:
        return packed.astype(np.uint16)
    lib.gd_pack_to_u16.restype = ctypes.c_int64
    lib.gd_pack_to_u16.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
    ]
    flat = np.ascontiguousarray(packed.reshape(-1), np.int32)
    p16 = ctypes.POINTER(ctypes.c_uint16)()
    lib.gd_pack_to_u16(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flat.shape[0], ctypes.byref(p16),
    )
    _bump_arena_gen()
    return np.ctypeslib.as_array(p16, shape=packed.shape)


def mask_select(bits: np.ndarray, slots: np.ndarray) -> np.ndarray:
    """Selected read indices from the device bitmask (threaded C bit test;
    numpy fallback)."""
    import ctypes

    from genome_downsampler_tpu.io.build import build_bamio

    r = slots.shape[0]
    try:
        lib = ctypes.CDLL(str(build_bamio()))
    except OSError:
        sel01 = (bits[slots >> 3] >> (slots & 7)) & 1
        return np.flatnonzero(sel01).astype(np.int64)
    lib.gd_mask_select.restype = ctypes.c_int64
    lib.gd_mask_select.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    b = np.ascontiguousarray(bits, np.uint8)
    sl = np.ascontiguousarray(slots, np.int64)
    out01 = np.empty(r, np.uint8)
    lib.gd_mask_select(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        r, out01.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return np.flatnonzero(out01).astype(np.int64)


def _blocked_kernel(
    counts_ref,   # int32[nbw_total * W] SMEM (scalar prefetch) — codes per
                  #   (block, window), flattened 1-D (2-D SMEM pads the lane
                  #   axis to 128 and overflows SMEM at large nbw)
    packed_ref,   # int32[1, W, cap] VMEM — read codes
    target_ref,   # int32[W, B]   VMEM — capped coverage targets (dummy
                  #   (W, B) zeros under auto_target)
    avail0_ref,   # int32[W, L]   VMEM — carry-in (relaxation round seed)
    selend0_ref,  # int32[W, L]   VMEM
    avail0i_ref,  # int32[W, L]   VMEM — input-coverage ring carry-in
    out_ref,      # int32[W, B]   VMEM — selected count per end position
    availf_ref,   # int32[W, L]   VMEM — carry-out
    selendf_ref,  # int32[W, L]   VMEM
    availfi_ref,  # int32[W, L]   VMEM — input-coverage ring carry-out
    tile_s,       # f32[B, W, L]  VMEM scratch — position-major histogram
    avail_s,      # int32[W, L]   VMEM scratch — state between grid steps
    selend_s,     # int32[W, L]   VMEM scratch
    availi_s,     # int32[W, L]   VMEM scratch
    tgt_s,        # int32[B, W]   VMEM scratch — block-transposed target
    out_s,        # int32[B, W]   VMEM scratch — block-transposed output
    *,
    block: int,
    chunk: int,
    static_chunks: bool,
    grid_offset: int = 0,
    auto_target: bool = False,
    max_coverage: int = 0,
):
    t_loc = pl.program_id(0)          # grid-local step
    t = t_loc + grid_offset           # block-within-window index (counts key)
    nb = pl.num_programs(0)
    B, W, L = tile_s.shape
    C = chunk

    @pl.when(t_loc == 0)
    def _():
        avail_s[:] = avail0_ref[:]
        selend_s[:] = selend0_ref[:]
        availi_s[:] = avail0i_ref[:]

    if not auto_target:
        # per-position access needs positions on the SUBLANE axis, but
        # keeping (win, W) arrays in HBM would pad the 8-lane minor dim to
        # 128 (16x memory). So HBM stays (W, win) and each (W, B) block
        # transposes once into VMEM scratch here.
        tgt_s[:] = jnp.swapaxes(target_ref[:, :], 0, 1)

    # --- build this block's SUFFIX histogram tile per window (MXU) ---
    # Tile layout is POSITION-major (B, W, L): the per-step read is then a
    # contiguous leading-axis slab instead of a strided middle-axis gather.
    # Codes live on the lane axis; the start one-hot compares a broadcast
    # (1, C) code row against a sublane iota, then contracts over C.
    #
    # The span side uses >= instead of ==, so the tile directly holds
    # SUFFIX-summed arrivals: tile[b, w, k] = # reads starting at b with
    # span - 1 >= k. The sweep then never computes a prefix scan: its state
    # is F[k] = sum_{k' >= k} avail[k'], arrivals add in suffix form for
    # free, and the farthest-first take-split becomes O(1) elementwise ops
    # (see the loop body). The r4 ablation measured the per-step
    # Hillis-Steele scan this replaces at ~65-70% of total kernel time.
    row_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
    row_l = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0)
    cap = packed_ref.shape[2]
    for w in range(W):  # static unroll
        if static_chunks:
            # all cap/C chunks always run; sentinel codes add nothing.
            # Needed when per-group counts would overflow SMEM (large nbw):
            # counts_ref is a dummy then
            nch = cap // C
        else:
            cnt = counts_ref[t * W + w]
            nch = (cnt + C - 1) // C

        def chunk_body(j, _, w=w):
            codes = packed_ref[0, w : w + 1, pl.ds(j * C, C)]  # (1, C) int32
            # sentinel -1: -1 // L == -1 matches no row
            a = (codes // L == row_b).astype(jnp.float32)  # (B, C)
            bm = (codes % L >= row_l).astype(jnp.float32)  # (L, C) suffix
            part = jax.lax.dot_general(
                a,
                bm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            if isinstance(j, int):  # static unroll: plain python branch
                if j == 0:
                    tile_s[:, w, :] = part
                else:
                    tile_s[:, w, :] = tile_s[:, w, :] + part
                return 0

            @pl.when(j == 0)
            def _():
                tile_s[:, w, :] = part

            @pl.when(j > 0)
            def _():
                tile_s[:, w, :] = tile_s[:, w, :] + part

            return 0

        if static_chunks:
            for j in range(nch):
                chunk_body(j, 0)
        else:
            @pl.when(nch == 0)
            def _(w=w):
                tile_s[:, w, :] = jnp.zeros((B, L), jnp.float32)

            jax.lax.fori_loop(0, nch, chunk_body, 0)

    if not auto_target:
        # Inject the per-position target into tile lane L-1 (spans are
        # capped at L-1, so that lane never holds read counts): the hot loop
        # then gets the target as a STATIC lane slice of the slab it already
        # reads, replacing a per-position (W, W) eye-masked transpose
        # (O(W^2) per step).
        tile_s[:, :, L - 1 : L] = tgt_s[:, :].astype(jnp.float32)[:, :, None]

    # --- the water-filling sweep over B positions, all W windows at once ---
    zero_last = (
        jax.lax.broadcasted_iota(jnp.int32, (W, L), 1) < L - 1
    ).astype(jnp.int32)
    # (W, W) identity mask for the emitted-column transpose (out write)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    )
    def body(i, carry):
        # Branchless take-split on the suffix state — no scan, no cond:
        #   F[k]     = stock at end-slots >= k      (suffix sums of avail)
        #   G[k]     = F[k+1] = stock strictly above k
        #   avail    = F - G
        #   take[k]  = clip(deficit - G[k], 0, avail[k])   farthest-first
        #   taken    = min(max(deficit, 0), F[0])
        #   F'       = F - min(taken, F)
        # The last identity holds because a farthest-first take empties a
        # suffix region: above the partial slot the whole stock is taken
        # (suffix_take = F there), below it suffix_take = taken.
        # `cur` (selected reads covering the position, (W, 1)) rides the
        # carry; it changes by `taken` and by the emitted column.
        F_in, Fi_in, selend, cur = carry
        add = tile_s[pl.ds(i, 1)].reshape(W, L).astype(jnp.int32)
        if auto_target:
            # Fi is the same suffix ring WITHOUT takes, so Fi[0] is the
            # input coverage at the current position — the capped target is
            # derived in-register and no target array is built, shipped, or
            # read at all.
            F = F_in + add
            Fi = Fi_in + add
            tgt = jnp.minimum(Fi[:, 0:1], jnp.int32(max_coverage))
        else:
            F = F_in + add * zero_last
            Fi = Fi_in
            tgt = add[:, L - 1 : L]  # (W, 1) — injected target lane
        G = pltpu.roll(F, L - 1, 1) * zero_last
        avail = F - G
        deficit = tgt - cur
        take = jnp.clip(deficit - G, 0, avail)
        taken = jnp.minimum(jnp.maximum(deficit, 0), F[:, 0:1])
        F2 = F - jnp.minimum(taken, F)
        selend2 = selend + take
        em_col = selend2[:, 0:1]  # (W, 1)
        emitted = jnp.sum(
            jnp.where(eye, jnp.broadcast_to(em_col, (W, W)), 0),
            axis=0,
            keepdims=True,
        )  # (1, W)
        out_s[pl.ds(i, 1), :] = emitted
        return (
            pltpu.roll(F2, L - 1, 1) * zero_last,
            pltpu.roll(Fi, L - 1, 1) * zero_last if auto_target else Fi,
            pltpu.roll(selend2, L - 1, 1) * zero_last,
            cur + taken - em_col,
        )

    def body2(k, carry):
        # two positions per trip: halves loop bookkeeping and gives Mosaic
        # independent work (tile loads / stores) to overlap across the
        # sequential dependency chain
        return body(2 * k + 1, body(2 * k, carry))

    # carry interface stays avail-shaped (seeds, mesh halos, tests are all
    # expressed in avail space); convert to/from suffix form once per pass
    cur0 = jnp.sum(selend_s[:], axis=1, keepdims=True)
    pref0 = _lane_cumsum(avail_s[:], L)
    F0 = pref0[:, L - 1 : L] - pref0 + avail_s[:]
    prefi = _lane_cumsum(availi_s[:], L)
    Fi0 = prefi[:, L - 1 : L] - prefi + availi_s[:]
    F_f, Fi_f, selend_f, _ = jax.lax.fori_loop(
        0, block // 2, body2, (F0, Fi0, selend_s[:], cur0)
    )
    avail_f = F_f - pltpu.roll(F_f, L - 1, 1) * zero_last
    availi_f = Fi_f - pltpu.roll(Fi_f, L - 1, 1) * zero_last
    avail_s[:] = avail_f
    selend_s[:] = selend_f
    availi_s[:] = availi_f
    out_ref[:, :] = jnp.swapaxes(out_s[:, :], 0, 1)

    @pl.when(t_loc == nb - 1)
    def _():
        availf_ref[:] = avail_f
        selendf_ref[:] = selend_f
        availfi_ref[:] = availi_f


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "block", "max_span", "chunk", "interpret",
        "static_chunks", "grid_offset", "auto_target", "max_coverage",
    ),
)
def blocked_sweep_pass(
    packed: jax.Array,   # int32[nbw, W, cap]
    counts: jax.Array,   # int32[nbw, W]
    target: jax.Array | None,  # int32[W, win]; None under auto_target
    avail0: jax.Array,   # int32[W, L]
    selend0: jax.Array,  # int32[W, L]
    n_windows: int,
    block: int,
    max_span: int,
    chunk: int = 256,
    interpret: bool = False,
    static_chunks: bool = False,
    grid_offset: int = 0,
    avail0i: jax.Array | None = None,  # int32[W, L] coverage-ring carry
    auto_target: bool = False,
    max_coverage: int = 0,
):
    """One relaxation round: sweep all W windows in parallel with the given
    carry seeds. Returns
    ``(sel[W, wlen], availf[W, L], selendf[W, L], availfi[W, L])``.

    ``auto_target=True`` derives the capped target ``min(coverage,
    max_coverage)`` inside the kernel from an untaken copy of the arrival
    ring (carried in ``avail0i``/``availfi``), so no target array exists on
    host or device.

    ``static_chunks=True`` runs all ``cap // chunk`` code chunks for every
    (block, window) unconditionally (sentinels contribute nothing) and
    ignores ``counts`` — required when ``nbw * W`` counts would overflow
    SMEM (chr1-scale grids), free when ``cap == chunk``.

    ``grid_offset=k`` sweeps only the tail blocks ``k..nbw-1`` of every
    window (zero-cold-started at block ``k``) and returns the tail-local
    selection ``sel[W, (nbw-k)*B]`` plus the carry at the window end — the
    cheap boundary-local pre-pass that seeds the relaxation loop (see
    ``blocked_windowed_sweep``)."""
    W, B, L = n_windows, block, max_span
    nbw, Wp, cap = packed.shape
    assert Wp == W
    assert 0 <= grid_offset < nbw
    ngrid = nbw - grid_offset
    if static_chunks:
        counts_flat = jnp.zeros(1, jnp.int32)
    else:
        assert counts.shape == (nbw, W)
        counts_flat = counts.reshape(nbw * W)
    win = nbw * B
    if auto_target:
        assert target is None
        target = jnp.zeros((W, B), jnp.int32)
        tgt_map = lambda t, c: (0, 0)  # noqa: E731 — dummy, never read
    else:
        assert target is not None and target.shape == (W, win)
        off_ = grid_offset
        tgt_map = lambda t, c: (0, t + off_)  # noqa: E731
    if avail0i is None:
        avail0i = jnp.zeros((W, L), jnp.int32)
    assert cap % chunk == 0, (cap, chunk)
    assert B % 2 == 0, B  # the sweep loop advances two positions per trip

    off = grid_offset
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # counts: full array in SMEM, indexed [t, w]
        grid=(ngrid,),
        in_specs=[
            pl.BlockSpec(
                (1, W, cap), lambda t, c: (t + off, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((W, B), tgt_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, B), lambda t, c: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L), lambda t, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, W, L), jnp.float32),
            pltpu.VMEM((W, L), jnp.int32),
            pltpu.VMEM((W, L), jnp.int32),
            pltpu.VMEM((W, L), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
        ],
    )
    out, availf, selendf, availfi = pl.pallas_call(
        functools.partial(
            _blocked_kernel, block=B, chunk=chunk,
            static_chunks=static_chunks, grid_offset=off,
            auto_target=auto_target, max_coverage=max_coverage,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((W, ngrid * B), jnp.int32),
            jax.ShapeDtypeStruct((W, L), jnp.int32),
            jax.ShapeDtypeStruct((W, L), jnp.int32),
            jax.ShapeDtypeStruct((W, L), jnp.int32),
        ],
        interpret=interpret,
    )(counts_flat, packed, target, avail0, selend0, avail0i)
    return out, availf, selendf, availfi


def _recon_kernel(
    counts_ref,   # int32[nbw_total * W] SMEM — same contract as the sweep
    packed_ref,   # int32[1, W, cap] VMEM
    xwin_ref,     # int32[W, Lring] VMEM — cross-window bucket offsets
    *sel_and_out,  # n_halo x sel tiles (W, B) VMEM, then outputs/scratch
    block: int,
    chunk: int,
    max_span: int,
    static_chunks: bool,
    n_halo: int,
):
    """Identity-reconstruction mask: for each packed read, decide
    ``bucket_rank < sel_per_end[end]`` where bucket_rank orders the end
    bucket by (start, original index).

    No sorting: the bucket rank decomposes per read as
      (reads in earlier windows ending here)            -> xwin input
    + (reads in earlier blocks of this window, same end) -> ring accumulator
    + (reads in this block with smaller start, same end) -> strictly-lower
                                                            one-hot against
                                                            the absolute-
                                                            end tile
    + (equal-(start,end) reads with smaller index)       -> within/cross
                                                            chunk equal-code
                                                            counts (groups
                                                            are code-sorted)
    All per-slot gathers ride the same one-hot matmuls as the tile build
    (value = colsum(start_onehot * (M @ end_onehot))), so the kernel is
    MXU-bound like the build and touches each code O(1) times. This
    replaced an argsort-based epilogue whose TPU sort compiled for ~9
    minutes and ran ~1s per 25M slots.
    """
    sel_refs = sel_and_out[:n_halo]
    selb_ref = sel_and_out[n_halo]
    tile_s = sel_and_out[n_halo + 1]
    acc_s = sel_and_out[n_halo + 2]
    t_loc = pl.program_id(0)
    W, B, Lring = tile_s.shape
    L = max_span
    C = chunk
    cap = packed_ref.shape[3]

    @pl.when(t_loc == 0)
    def _():
        acc_s[:] = xwin_ref[:].astype(jnp.float32)

    row_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
    ring_l = jax.lax.broadcasted_iota(jnp.int32, (Lring, C), 0)

    # Both window loops run as fori_loops with a DYNAMIC window index: a
    # static W-unroll at W=64 made Mosaic's scoped stack hold every
    # iteration's temporaries at once and blew the 16 MB VMEM budget at
    # chr1-class grids. Every W-indexed buffer is laid out W-LEADING
    # (untiled axis) because Mosaic cannot prove alignment of a dynamic
    # index on a tiled sublane axis. All chunks run unconditionally
    # (sentinels contribute nothing / are masked), so the body is
    # w-uniform.
    nch_all = cap // C

    # ---- build the absolute-end tile: tile[w, b, e'] = reads starting at
    # block-relative b with end - t*B == e'
    def build_w(w, _):
        for j in range(nch_all):
            codes = packed_ref[pl.ds(w, 1), 0, 0, pl.ds(j * C, C)].reshape(1, C)
            a = (codes // L == row_b).astype(jnp.float32)
            e1 = (codes // L + codes % L == ring_l).astype(jnp.float32)
            part = jax.lax.dot_general(
                a, e1,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if j == 0:
                tile_s[pl.ds(w, 1)] = part[None]
            else:
                tile_s[pl.ds(w, 1)] = tile_s[pl.ds(w, 1)] + part[None]
        return 0

    jax.lax.fori_loop(0, W, build_w, 0)

    coltot = jnp.sum(tile_s[:], axis=1, keepdims=True)  # (W, 1, Lring)

    # ---- per-slot gathers and the mask decision
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    )

    def gather_w(w, _):
        sel_row = jnp.concatenate(
            [sr[pl.ds(w, 1), 0, 0, :].reshape(1, -1) for sr in sel_refs], axis=1
        ).astype(jnp.float32)  # (1, n_halo * B) == (1, Lring)
        accw = acc_s[pl.ds(w, 1), 0, :].reshape(1, -1)  # (1, Lring)
        cpw = tile_s[pl.ds(w, 1)].reshape(B, Lring)
        for j in range(nch_all):
            codes = packed_ref[pl.ds(w, 1), 0, 0, pl.ds(j * C, C)].reshape(1, C)
            # strictly-lower one-hot: row b contributes iff b < the slot's
            # start row — the per-slot column prefix without any scan
            a_lt = (codes // L > row_b).astype(jnp.float32)
            e1 = (codes // L + codes % L == ring_l).astype(jnp.float32)
            m1 = jax.lax.dot_general(
                cpw, e1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, C) — m1[b, s] = tile[b, end_of_slot_s]
            celloff = jnp.sum(a_lt * m1, axis=0, keepdims=True)
            acc_c = jax.lax.dot_general(
                accw, e1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            c_s = jax.lax.dot_general(
                sel_row, e1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # same-cell (equal-code) earlier-index counts; groups are
            # code-sorted with stable index order, so equal codes from
            # earlier chunks/slots are exactly the earlier-index cellmates
            codes_t = codes.reshape(C, 1)
            eq_in = (codes_t == codes) & tri
            rank = jnp.sum(eq_in.astype(jnp.float32), axis=0, keepdims=True)
            for j2 in range(j):
                prev = packed_ref[pl.ds(w, 1), 0, 0, pl.ds(j2 * C, C)].reshape(1, C)
                eq_x = prev.reshape(C, 1) == codes
                rank = rank + jnp.sum(
                    eq_x.astype(jnp.float32), axis=0, keepdims=True
                )
            bucket_rank = celloff + acc_c + rank
            selbit = (bucket_rank < c_s) & (codes >= 0)
            selb_ref[
                pl.ds(w, 1), 0:1, 0:1, pl.ds(j * C, C)
            ] = selbit.astype(jnp.int8).reshape(1, 1, 1, C)
        return 0

    jax.lax.fori_loop(0, W, gather_w, 0)

    # ring shift the accumulator to the next block's origin
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, 1, Lring), 2)
    acc_s[:] = jnp.where(
        lane < Lring - B,
        pltpu.roll(acc_s[:] + coltot, Lring - B, 2),
        0.0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "block", "max_span", "chunk", "interpret",
        "static_chunks",
    ),
)
def blocked_selection_pass(
    packed: jax.Array,   # int32[nbw, W, cap]
    counts: jax.Array,   # int32[nbw, W]
    sel: jax.Array,      # int32[W * win] — sweep output
    xwin: jax.Array,     # int32[W, B + max_span] cross-window offsets
    n_windows: int,
    block: int,
    max_span: int,
    chunk: int = 256,
    interpret: bool = False,
    static_chunks: bool = False,
):
    """Pass 2: per-slot selection bytes for the whole packed array.

    Returns ``selbytes (nbw, W, cap) int8`` — 1 where the slot's read is
    selected under the canonical first-by-(start, index) bucket rule.
    """
    W, B, L = n_windows, block, max_span
    nbw, Wp, cap = packed.shape
    assert Wp == W
    assert L % B == 0, (L, B)  # halo tiling needs an integral tile count
    Lring = B + L
    n_halo = Lring // B
    win = nbw * B
    if static_chunks:
        counts_flat = jnp.zeros(1, jnp.int32)
    else:
        counts_flat = counts.reshape(nbw * W)
    assert xwin.shape == (W, Lring)

    # sel with a cross-window + end-of-genome halo: row w continues into
    # row w+1's first L columns (global end coordinates)
    sel2 = sel.reshape(W, win)
    nxt = jnp.concatenate(
        [sel2[1:, :L], jnp.zeros((1, L), sel2.dtype)], axis=0
    )
    # all W-indexed kernel operands are W-LEADING (see _recon_kernel); the
    # transposes are device-side HBM copies, negligible next to the solve
    sel_halo = jnp.concatenate([sel2, nxt], axis=1).reshape(
        W, (win + L) // B, 1, B
    )
    packed_t = jnp.swapaxes(packed, 0, 1).reshape(W, nbw, 1, cap)
    xwin3 = xwin.reshape(W, 1, Lring)

    # Block shapes insert singleton dims so the last-two block dims EQUAL
    # the array's (the Pallas lowering rule) while the dynamic window index
    # stays on the untiled leading axis.
    def halo_map(k):
        return lambda t, c, k=k: (0, t + k, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbw,),
        in_specs=[
            pl.BlockSpec(
                (W, 1, 1, cap), lambda t, c: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (W, 1, Lring), lambda t, c: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *[
                pl.BlockSpec(
                    (W, 1, 1, B), halo_map(k), memory_space=pltpu.VMEM
                )
                for k in range(n_halo)
            ],
        ],
        out_specs=[
            pl.BlockSpec(
                (W, 1, 1, cap), lambda t, c: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B, Lring), jnp.float32),
            pltpu.VMEM((W, 1, Lring), jnp.float32),
        ],
    )
    (selbytes_t,) = pl.pallas_call(
        functools.partial(
            _recon_kernel, block=B, chunk=chunk, max_span=L,
            static_chunks=static_chunks, n_halo=n_halo,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((W, nbw, 1, cap), jnp.int8)],
        interpret=interpret,
    )(counts_flat, packed_t, xwin3, *([sel_halo] * n_halo))
    # back to (nbw, W, cap) flat-slot order
    return jnp.swapaxes(selbytes_t.reshape(W, nbw, cap), 0, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "block", "max_span", "chunk", "interpret",
        "static_chunks", "seed_blocks", "auto_target", "max_coverage",
    ),
)
def blocked_windowed_sweep(
    packed: jax.Array,
    counts: jax.Array,
    target: jax.Array | None,  # int32[W, win]; None under auto_target
    n_windows: int,
    block: int,
    max_span: int,
    chunk: int = 256,
    interpret: bool = False,
    static_chunks: bool = False,
    seed_blocks: int = 8,
    auto_target: bool = False,
    max_coverage: int = 0,
):
    """Exact global sweep via carry relaxation over the blocked kernel.

    Returns ``(sel_per_end[W * win], rounds_used)`` — bit-identical to the
    global sequential ``sweep_counts`` at the fixed point. Soundness does
    not depend on how rounds are seeded: at any state where every window's
    carry-in equals its left neighbor's carry-out (which is what the
    stability check asserts), window 0 ran from the true genome-start state
    (zeros), so by induction along the windows every carry — and therefore
    the whole selection — equals the global sequential sweep's.

    ``seed_blocks > 0`` prepends a cheap boundary-local pre-pass: sweep only
    the last ``seed_blocks`` blocks of every window (cold-started), and use
    those window-end carries as round-1 seeds. Any selected read crossing a
    window boundary starts within ``L`` of it, so a few blocks of local
    history predict the true carry almost exactly — zero-seeded relaxation
    needs ~0.6 * W rounds (measured r3) because corrections crawl one window
    per round, while seeded relaxation typically converges in 2-3 rounds
    regardless of W, unlocking wider W (more parallel windows = fewer
    sequential positions per pass).
    """
    W, L = n_windows, max_span
    nbw = packed.shape[0]
    win = nbw * block

    def passes(a_in, s_in, ai_in, grid_offset=0):
        return blocked_sweep_pass(
            packed, counts, target, a_in, s_in,
            n_windows, block, max_span, chunk, interpret, static_chunks,
            grid_offset=grid_offset, avail0i=ai_in,
            auto_target=auto_target, max_coverage=max_coverage,
        )

    def shift(c_out):
        return jnp.concatenate(
            [jnp.zeros((1, L), jnp.int32), c_out[:-1]], axis=0
        )

    zeros = jnp.zeros((W, L), jnp.int32)
    if seed_blocks > 0 and W > 1 and nbw > seed_blocks:
        _, a_t, s_t, ai_t = passes(
            zeros, zeros, zeros, grid_offset=nbw - seed_blocks
        )
        a_seed, s_seed, ai_seed = shift(a_t), shift(s_t), shift(ai_t)
    else:
        a_seed, s_seed, ai_seed = zeros, zeros, zeros
    sel, a_out, s_out, ai_out = passes(a_seed, s_seed, ai_seed)

    def cond(state):
        k, a_in, s_in, ai_in, sel, a_out, s_out, ai_out = state
        stable = (
            jnp.all(shift(a_out) == a_in)
            & jnp.all(shift(s_out) == s_in)
            & jnp.all(shift(ai_out) == ai_in)
        )
        return (~stable) & (k < W + 1)

    def body(state):
        k, _, _, _, _, a_out, s_out, ai_out = state
        a_in, s_in, ai_in = shift(a_out), shift(s_out), shift(ai_out)
        sel, a_out2, s_out2, ai_out2 = passes(a_in, s_in, ai_in)
        return (k + 1, a_in, s_in, ai_in, sel, a_out2, s_out2, ai_out2)

    k, _, _, _, sel, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), a_seed, s_seed, ai_seed, sel, a_out, s_out, ai_out),
    )
    return sel.reshape(W * win), k
