"""ctypes binding for the C++ exact greedy (io/csrc/greedy.cpp).

The C-speed host production path for very large read sets (BASELINE config 5
scale); bit-compatible with the device sweep solvers (same counts and
earliest-start-per-end-bucket tie-break).
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
        lib.gd_greedy_mcp.restype = ctypes.c_int64
        lib.gd_greedy_mcp.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.gd_free_i64.argtypes = [ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    return _lib


def native_greedy_select(
    start: np.ndarray,
    end: np.ndarray,
    genome_length: int,
    max_coverage: int,
    target: np.ndarray | None = None,
) -> np.ndarray:
    lib = _load()
    s = np.ascontiguousarray(start, np.int64)
    e = np.ascontiguousarray(end, np.int64)
    tgt_ptr = None
    if target is not None:
        t = np.ascontiguousarray(target, np.int64)
        tgt_ptr = t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    out = ctypes.POINTER(ctypes.c_int64)()
    count = lib.gd_greedy_mcp(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(s), genome_length, max_coverage, tgt_ptr, ctypes.byref(out),
    )
    if count < 0:
        raise ValueError("gd_greedy_mcp: invalid input (bounds or spans)")
    try:
        if count == 0:
            return np.zeros(0, np.int64)
        return np.ctypeslib.as_array(out, shape=(count,)).astype(np.int64, copy=True)
    finally:
        lib.gd_free_i64(out)


class NativeGreedyMcpSolver(Solver):
    """Exact MCP, C++ sweep (registered as the ``mcp-cpu`` fast path)."""

    uses_quality_of_reads = False

    def solve(self, max_coverage: int, batch: ReadBatch) -> Solution:
        return native_greedy_select(
            batch.start, batch.end, batch.ref_genome_length, max_coverage
        )
