"""ctypes binding for the C++ cost-scaling min-cost flow (io/csrc/mcmf.cpp).

The production-scale exact QMCP solver: minimizes
``sum(max_quality - quality + 1)`` over feasible selections, like the
reference ``qmcp-cpu`` (``qmcp_cpu_cost_scaling_solver.cpp:44-49``).
"""

from __future__ import annotations

import ctypes

import numpy as np

from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.io.build import build_bamio
from genome_downsampler_tpu.solvers.base import Solution, Solver

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_bamio()))
        lib.gd_qmcp_mcmf.restype = ctypes.c_int64
        lib.gd_qmcp_mcmf.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.gd_qmcp_mcmf_flows.restype = ctypes.c_int64
        lib.gd_qmcp_mcmf_flows.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gd_qmcp_mcmf_convex.restype = ctypes.c_int64
        lib.gd_qmcp_mcmf_convex.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gd_free_i64.argtypes = [ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    return _lib


def _fast_unique(key: np.ndarray):
    """np.unique(key, return_inverse/counts) via one stable argsort.

    This VM's ``np.unique`` is ~40x slower than ``np.argsort`` on int64, so
    the grouping is done by hand.
    """
    r = key.shape[0]
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.empty(r, bool)
    first[0] = True
    np.not_equal(ks[1:], ks[:-1], out=first[1:])
    uniq = ks[first]
    gid_sorted = np.cumsum(first) - 1
    inverse = np.empty(r, np.int64)
    inverse[order] = gid_sorted
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, r))
    return uniq, inverse, counts


def mcmf_select_convex(
    start: np.ndarray,
    end: np.ndarray,
    cost: np.ndarray,
    genome_length: int,
    max_coverage: int,
) -> np.ndarray:
    """Exact weighted selection with convex bucket compression.

    All reads sharing ``(start, end)`` collapse into ONE flow arc whose cost
    is convex piecewise-linear (the k-th unit costs the k-th cheapest read
    of the bucket), so the network size is the number of distinct spans —
    tens of thousands — independent of the read count. The solver returns
    per-bucket take counts; the cheapest reads of each bucket (ties by
    index) are selected.
    """
    lib = _load()
    s = np.asarray(start, np.int64)
    e = np.asarray(end, np.int64)
    c = np.asarray(cost, np.int64)
    r = s.shape[0]
    if r == 0:
        return np.zeros(0, np.int64)
    span = e - s + 1
    if not (
        int(span.max()) < (1 << 12)
        and int(c.max()) < (1 << 10)
        and int(c.min()) >= 0
        and int(s.max()) < (1 << 41)
        and int(s.min()) >= 0
    ):
        return mcmf_select_bucketed(s, e, c, genome_length, max_coverage)

    # one stable argsort of (s, span, c): groups = distinct (s, span), with
    # costs ascending (and index-ascending within equal cost) inside each
    key = (s << 22) | (span << 10) | c
    order = np.argsort(key, kind="stable")
    ks = key[order]
    gkey = ks >> 10  # (s, span) part
    first = np.empty(r, bool)
    first[0] = True
    np.not_equal(gkey[1:], gkey[:-1], out=first[1:])
    starts_idx = np.flatnonzero(first)
    b = starts_idx.shape[0]
    off = np.empty(b + 1, np.int64)
    off[:b] = starts_idx
    off[b] = r
    guniq = gkey[starts_idx]
    bs = np.ascontiguousarray(guniq >> 12)
    bspan = guniq & ((1 << 12) - 1)
    be = np.ascontiguousarray(bs + bspan - 1)
    pool = np.ascontiguousarray(ks & ((1 << 10) - 1))

    flows = np.zeros(b, np.int64)
    rc = lib.gd_qmcp_mcmf_convex(
        bs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        be.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pool.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, genome_length, max_coverage,
        flows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError("gd_qmcp_mcmf_convex: invalid or infeasible input")

    # expand: the first flows[g] pool entries of each bucket are selected
    rank = np.arange(r, dtype=np.int64) - np.repeat(off[:b], np.diff(off))
    take = rank < np.repeat(flows, np.diff(off))
    return np.sort(order[take]).astype(np.int64)


def mcmf_flows_convex(
    bstart: np.ndarray,
    bend: np.ndarray,
    off: np.ndarray,
    pool: np.ndarray,
    genome_length: int,
    max_coverage: int,
) -> np.ndarray:
    """Bucket-level entry: exact per-bucket take counts for pre-built
    convex buckets (``pool[off[b]:off[b+1]]`` ascending unit costs).
    Used by the partitioned sharded QMCP, which gathers buckets rather
    than reads."""
    lib = _load()
    b = int(bstart.shape[0])
    if b == 0:
        return np.zeros(0, np.int64)
    bs = np.ascontiguousarray(bstart, np.int64)
    be = np.ascontiguousarray(bend, np.int64)
    of = np.ascontiguousarray(off, np.int64)
    pl = np.ascontiguousarray(pool, np.int64)
    flows = np.zeros(b, np.int64)
    rc = lib.gd_qmcp_mcmf_convex(
        bs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        be.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        of.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, genome_length, max_coverage,
        flows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError("gd_qmcp_mcmf_convex: invalid or infeasible input")
    return flows


def mcmf_select_bucketed(
    start: np.ndarray,
    end: np.ndarray,
    cost: np.ndarray,
    genome_length: int,
    max_coverage: int,
) -> np.ndarray:
    """Exact weighted selection with bucket compression.

    Reads sharing ``(start, end, cost)`` are interchangeable in the flow
    network, so they collapse to one capacitated arc; the solver returns how
    many units each bucket carries and the lowest-index reads of each bucket
    are selected (a deterministic representative of the optimal set). On
    typical data this cuts the arc count by 10-100x.
    """
    lib = _load()
    s = np.asarray(start, np.int64)
    e = np.asarray(end, np.int64)
    c = np.asarray(cost, np.int64)
    r = s.shape[0]
    if r == 0:
        return np.zeros(0, np.int64)

    # composite int64 key (s, span, c): one flat unique is ~100x faster
    # than np.unique(axis=0) on the stacked rows
    span = e - s + 1
    if (
        span.size
        and int(span.max()) < (1 << 12)
        and int(c.max()) < (1 << 10)
        and int(c.min()) >= 0
        and int(s.max()) < (1 << 41)
        and int(s.min()) >= 0
    ):
        key = (s << 22) | (span << 10) | c
        uniq_key, inverse, counts = _fast_unique(key)
        bs = uniq_key >> 22
        bspan = (uniq_key >> 10) & ((1 << 12) - 1)
        be = bs + bspan - 1
        bc = uniq_key & ((1 << 10) - 1)
    else:  # rare shapes: fall back to row-wise unique
        key = np.stack([s, e, c], axis=1)
        uniq, inverse, counts = np.unique(
            key, axis=0, return_inverse=True, return_counts=True
        )
        bs = np.ascontiguousarray(uniq[:, 0])
        be = np.ascontiguousarray(uniq[:, 1])
        bc = np.ascontiguousarray(uniq[:, 2])
    a = bs.shape[0]
    bs = np.ascontiguousarray(bs)
    be = np.ascontiguousarray(be)
    bc = np.ascontiguousarray(bc)
    bcap = np.ascontiguousarray(counts.astype(np.int64))
    flows = np.zeros(a, np.int64)
    rc = lib.gd_qmcp_mcmf_flows(
        bs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        be.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bcap.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        a, genome_length, max_coverage,
        flows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError("gd_qmcp_mcmf_flows: invalid or infeasible input")

    # expand: take the first flows[b] reads (by index) of each bucket
    order = np.argsort(inverse, kind="stable")
    b_sorted = inverse[order]
    first = np.zeros(a + 1, np.int64)
    np.cumsum(counts, out=first[1:])
    rank = np.arange(r, dtype=np.int64) - first[b_sorted]
    take = rank < flows[b_sorted]
    return np.sort(order[take]).astype(np.int64)


def mcmf_select(
    start: np.ndarray,
    end: np.ndarray,
    cost: np.ndarray,
    genome_length: int,
    max_coverage: int,
) -> np.ndarray:
    lib = _load()
    s = np.ascontiguousarray(start, np.int64)
    e = np.ascontiguousarray(end, np.int64)
    c = np.ascontiguousarray(cost, np.int64)
    out = ctypes.POINTER(ctypes.c_int64)()
    count = lib.gd_qmcp_mcmf(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(s), genome_length, max_coverage, ctypes.byref(out),
    )
    if count < 0:
        raise ValueError("gd_qmcp_mcmf: invalid or infeasible input")
    try:
        if count == 0:
            return np.zeros(0, np.int64)
        return np.ctypeslib.as_array(out, shape=(count,)).astype(np.int64, copy=True)
    finally:
        lib.gd_free_i64(out)


class NativeQmcpSolver(Solver):
    """Exact quality-weighted solver, C++ cost-scaling MCMF (registered as
    the ``qmcp-cpu`` fast path)."""

    uses_quality_of_reads = True

    def solve(self, max_coverage: int, batch: ReadBatch) -> Solution:
        q = np.asarray(batch.quality, np.int64)
        max_q = int(q.max(initial=0))
        cost = max_q - q + 1
        return mcmf_select_convex(
            batch.start, batch.end, cost, batch.ref_genome_length, max_coverage
        )
