"""Exact weighted QMCP LP solver: integrality, optimality, validity."""

import itertools

import numpy as np
import pytest

from genome_downsampler_tpu.solvers.greedy_mcp import GreedyMcpSolver
from genome_downsampler_tpu.solvers.sequential_mcmf import (
    McpLpOracle,
    QmcpSequentialSolver,
)
from genome_downsampler_tpu.testing.fixtures import small_example_batch
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def np_coverage(start, end, n, sel=None):
    cov = np.zeros(n + 1, np.int64)
    s = start if sel is None else start[sel]
    e = end if sel is None else end[sel]
    np.add.at(cov, np.clip(s, 0, n), 1)
    np.add.at(cov, np.clip(e + 1, 0, n), -1)
    return np.cumsum(cov)[:n]


def brute_force_min_cost(start, end, n, m, cost):
    cov_in = np_coverage(start, end, n)
    capped = np.minimum(cov_in, m)
    best = np.inf
    r = len(start)
    for k in range(r + 1):
        for subset in itertools.combinations(range(r), k):
            sel = np.array(subset, np.int64)
            if np.all(np_coverage(start, end, n, sel) >= capped):
                c = cost[sel].sum() if len(sel) else 0.0
                best = min(best, c)
    return best


@pytest.mark.parametrize("seed", range(8))
def test_qmcp_lp_optimal_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = 12
    r = int(rng.integers(4, 10))
    start = rng.integers(0, n, r)
    length = rng.integers(1, 6, r)
    end = np.minimum(start + length - 1, n - 1)
    quality = rng.integers(0, 60, r)
    m = int(rng.integers(1, 3))

    from genome_downsampler_tpu.core.readbatch import ReadBatch

    batch = ReadBatch(
        bam_id=np.arange(r),
        start=start,
        end=end,
        quality=quality,
        seq_length=length,
        is_first=np.tile([True, False], (r + 1) // 2)[:r],
        ref_genome_length=n,
    )
    sel = QmcpSequentialSolver().solve(m, batch)
    cov_in = np_coverage(start, end, n)
    capped = np.minimum(cov_in, m)
    assert np.all(np_coverage(start, end, n, sel) >= capped)
    max_q = quality.max()
    cost = (max_q - quality + 1).astype(np.float64)
    got = cost[sel].sum() if len(sel) else 0.0
    want = brute_force_min_cost(start, end, n, m, cost)
    assert got == pytest.approx(want)


def test_mcp_lp_oracle_agrees_with_greedy():
    rng = np.random.default_rng(3)
    batch = rand_reads_uniform(rng, 200, 1000, 40)
    m = 5
    greedy = GreedyMcpSolver().solve(m, batch)
    opt = McpLpOracle.optimal_count(
        np.asarray(batch.start, np.int64), np.asarray(batch.end, np.int64),
        batch.ref_genome_length, m,
    )
    assert len(greedy) == opt


def test_qmcp_prefers_quality():
    """Two stacked identical intervals, one high-quality; M=1 keeps the
    high-quality one."""
    from genome_downsampler_tpu.core.readbatch import ReadBatch

    batch = ReadBatch(
        bam_id=[0, 1],
        start=[0, 0],
        end=[9, 9],
        quality=[5, 50],
        seq_length=[10, 10],
        is_first=[True, False],
        ref_genome_length=10,
    )
    sel = QmcpSequentialSolver().solve(1, batch)
    assert sel.tolist() == [1]


def test_qmcp_small_example():
    batch = small_example_batch()
    sel = QmcpSequentialSolver().solve(4, batch)
    cov_in = np_coverage(batch.start, batch.end, batch.ref_genome_length)
    capped = np.minimum(cov_in, 4)
    assert np.all(
        np_coverage(batch.start, batch.end, batch.ref_genome_length, sel) >= capped
    )
