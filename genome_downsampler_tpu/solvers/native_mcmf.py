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
        lib.gd_free_i64.argtypes = [ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    return _lib


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
        return mcmf_select(
            batch.start, batch.end, cost, batch.ref_genome_length, max_coverage
        )
