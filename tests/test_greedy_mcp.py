"""Exactness and validity of the greedy MCP sweep solver."""

import itertools

import numpy as np
import pytest

from genome_downsampler_tpu.solvers.greedy_mcp import GreedyMcpSolver, greedy_mcp_select
from genome_downsampler_tpu.testing.fixtures import (
    SMALL_EXAMPLE_MAX_COVERAGE,
    dist_low_coverage_on_both_sides,
    dist_with_hole,
    dist_zero_coverage_on_both_sides,
    small_example_batch,
)
from genome_downsampler_tpu.testing.reads_gen import rand_reads, rand_reads_uniform


def np_coverage(start, end, n, sel=None):
    cov = np.zeros(n + 1, np.int64)
    s = start if sel is None else start[sel]
    e = end if sel is None else end[sel]
    np.add.at(cov, np.clip(s, 0, n), 1)
    np.add.at(cov, np.clip(e + 1, 0, n), -1)
    return np.cumsum(cov)[:n]


def assert_valid(batch, sel, m):
    cov_in = np_coverage(batch.start, batch.end, batch.ref_genome_length)
    cov_out = np_coverage(batch.start, batch.end, batch.ref_genome_length, sel)
    capped = np.minimum(cov_in, m)
    assert np.all(capped <= cov_out), "coverage validity violated"


def brute_force_min_count(start, end, n, m):
    """Minimum selection size by exhaustive search (tiny instances only)."""
    r = len(start)
    cov_in = np_coverage(start, end, n)
    capped = np.minimum(cov_in, m)
    for k in range(r + 1):
        for subset in itertools.combinations(range(r), k):
            sel = np.array(subset, np.int64)
            if np.all(np_coverage(start, end, n, sel) >= capped):
                return k
    raise AssertionError("unreachable: full set is always feasible")


def test_small_example_valid_and_optimal():
    batch = small_example_batch()
    m = SMALL_EXAMPLE_MAX_COVERAGE
    sel = GreedyMcpSolver().solve(m, batch)
    assert_valid(batch, sel, m)
    opt = brute_force_min_count(batch.start, batch.end, batch.ref_genome_length, m)
    assert len(sel) == opt


@pytest.mark.parametrize("seed", range(20))
def test_greedy_optimal_vs_bruteforce_random(seed):
    rng = np.random.default_rng(seed)
    n = 14
    r = rng.integers(4, 11)
    start = rng.integers(0, n, r)
    length = rng.integers(1, 7, r)
    end = np.minimum(start + length - 1, n - 1)
    m = int(rng.integers(1, 4))
    sel = greedy_mcp_select(start, end, n, m)
    cov_in = np_coverage(start, end, n)
    capped = np.minimum(cov_in, m)
    assert np.all(np_coverage(start, end, n, sel) >= capped)
    assert len(sel) == brute_force_min_count(start, end, n, m)


@pytest.mark.parametrize(
    "dist",
    [None, dist_low_coverage_on_both_sides, dist_with_hole, dist_zero_coverage_on_both_sides],
    ids=["uniform", "low_sides", "hole", "zero_sides"],
)
def test_random_fixture_validity(dist):
    """Scaled-down versions of the reference CoverageTester fixtures
    (coverage_tester.cpp:120-175): full-size runs live in the benchmark."""
    rng = np.random.default_rng(12345)
    pairs = 20_000
    genome = 30_000
    if dist is None:
        batch = rand_reads_uniform(rng, pairs, genome, 150)
        m = 1000
    else:
        batch = rand_reads(rng, pairs, genome, 150, dist)
        m = 8000
    sel = GreedyMcpSolver().solve(m, batch)
    assert_valid(batch, sel, m)
    assert len(sel) <= batch.n_reads


def test_greedy_respects_external_target():
    batch = small_example_batch()
    n = batch.ref_genome_length
    target = np.zeros(n, np.int64)
    sel = greedy_mcp_select(batch.start, batch.end, n, 4, target=target)
    assert len(sel) == 0


def test_greedy_deterministic():
    rng = np.random.default_rng(7)
    batch = rand_reads_uniform(rng, 2000, 5000, 100)
    a = GreedyMcpSolver().solve(50, batch)
    b = GreedyMcpSolver().solve(50, batch)
    np.testing.assert_array_equal(a, b)
