"""Solver interface.

Mirrors the reference abstract solver
(``/root/reference/libs/qmcp-solver/include/qmcp-solver/solver.hpp:15-20``):
``solve(max_coverage, reads) -> Solution`` plus ``uses_quality_of_reads``
(which the app layer uses to pick amplicon GRADE vs FILTER behaviour,
``/root/reference/src/app.cpp:120-128``).

A ``Solution`` is an int64 array of *read indices* (positions in the
``ReadBatch``, not BAM line ids — the reference's ``ReadIndex`` vs
``BAMReadId`` distinction, ``read.hpp:11-14``).
"""

from __future__ import annotations

import abc

import numpy as np

from genome_downsampler_tpu.core.readbatch import ReadBatch

Solution = np.ndarray  # int64[k] read indices


class Solver(abc.ABC):
    """Abstract read-selection solver."""

    #: Whether arc costs derive from MAPQ (True selects amplicon GRADE
    #: behaviour in the app layer, False selects FILTER).
    uses_quality_of_reads: bool = False

    @abc.abstractmethod
    def solve(self, max_coverage: int, batch: ReadBatch) -> Solution:
        """Select read indices whose coverage reaches
        ``min(input_coverage, max_coverage)`` at every base."""
        raise NotImplementedError
