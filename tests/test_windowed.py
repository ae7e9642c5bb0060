"""Windowed sweep: bit-exact equality with the global greedy."""

import numpy as np
import pytest

from genome_downsampler_tpu.parallel.windows import WindowedMcpSolver
from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
from genome_downsampler_tpu.solvers.greedy_mcp import GreedyMcpSolver
from genome_downsampler_tpu.testing.fixtures import dist_with_hole
from genome_downsampler_tpu.testing.reads_gen import rand_reads, rand_reads_uniform


def np_coverage(start, end, n, sel=None):
    cov = np.zeros(n + 1, np.int64)
    s = start if sel is None else start[sel]
    e = end if sel is None else end[sel]
    np.add.at(cov, np.clip(s, 0, n), 1)
    np.add.at(cov, np.clip(e + 1, 0, n), -1)
    return np.cumsum(cov)[:n]


def assert_valid(batch, sel, m):
    n = batch.ref_genome_length
    capped = np.minimum(np_coverage(batch.start, batch.end, n), m)
    out = np_coverage(batch.start, batch.end, n, sel)
    bad = np.nonzero(capped > out)[0]
    assert bad.size == 0, f"validity violated at {bad.size} bases, first {bad[:5]}"


@pytest.mark.parametrize("n_windows", [1, 2, 4, 8])
def test_windowed_bit_equal_to_single_sweep(n_windows):
    rng = np.random.default_rng(0)
    batch = rand_reads_uniform(rng, 4000, 8192, 60)
    m = 8
    sel = WindowedMcpSolver(n_windows=n_windows, max_span=64).solve(m, batch)
    single = McpDeviceSweepSolver(max_span=64).solve(m, batch)
    assert_valid(batch, sel, m)
    np.testing.assert_array_equal(sel, single)
    assert len(sel) == len(GreedyMcpSolver().solve(m, batch))


def test_windowed_shaped_distribution_exact():
    rng = np.random.default_rng(12345)
    batch = rand_reads(rng, 20_000, 30_000, 150, dist_with_hole)
    m = 800
    sel = WindowedMcpSolver(n_windows=8, max_span=256).solve(m, batch)
    assert_valid(batch, sel, m)
    single = McpDeviceSweepSolver(max_span=256).solve(m, batch)
    np.testing.assert_array_equal(sel, single)


def test_windowed_high_m_exact():
    rng = np.random.default_rng(12345)
    batch = rand_reads_uniform(rng, 50_000, 30_000, 150)
    m = 1000
    sel = WindowedMcpSolver(n_windows=16, max_span=256).solve(m, batch)
    single = McpDeviceSweepSolver(max_span=256).solve(m, batch)
    np.testing.assert_array_equal(sel, single)


def test_windowed_deterministic():
    rng = np.random.default_rng(7)
    batch = rand_reads_uniform(rng, 2000, 8192, 60)
    s = WindowedMcpSolver(n_windows=4, max_span=64)
    np.testing.assert_array_equal(s.solve(6, batch), s.solve(6, batch))


def test_window_too_small_raises():
    rng = np.random.default_rng(1)
    batch = rand_reads_uniform(rng, 100, 1000, 60)
    with pytest.raises(ValueError, match="window length"):
        WindowedMcpSolver(n_windows=64, max_span=64).solve(5, batch)
