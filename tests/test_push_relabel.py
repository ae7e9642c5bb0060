"""Device push-relabel max-flow solver: feasibility + determinism."""

import numpy as np
import pytest

from genome_downsampler_tpu.solvers.push_relabel import QuasiMcpPushRelabelSolver
from genome_downsampler_tpu.testing.fixtures import (
    SMALL_EXAMPLE_MAX_COVERAGE,
    small_example_batch,
)
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


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
    bad = np.nonzero(capped > cov_out)[0]
    assert bad.size == 0, (
        f"coverage validity violated at {bad.size} positions, first {bad[:5]}"
    )


def test_small_example_feasible():
    batch = small_example_batch()
    solver = QuasiMcpPushRelabelSolver(pad_multiple=32)
    sel = solver.solve(SMALL_EXAMPLE_MAX_COVERAGE, batch)
    assert_valid(batch, sel, SMALL_EXAMPLE_MAX_COVERAGE)


@pytest.mark.parametrize("seed,m", [(0, 3), (1, 5), (2, 2), (3, 8)])
def test_random_small_feasible(seed, m):
    rng = np.random.default_rng(seed)
    batch = rand_reads_uniform(rng, 150, 600, 40)
    solver = QuasiMcpPushRelabelSolver(pad_multiple=512)
    sel = solver.solve(m, batch)
    assert_valid(batch, sel, m)


def test_medium_feasible():
    rng = np.random.default_rng(5)
    batch = rand_reads_uniform(rng, 500, 1200, 60)
    solver = QuasiMcpPushRelabelSolver(pad_multiple=1024)
    sel = solver.solve(10, batch)
    assert_valid(batch, sel, 10)
    # downsampling actually happened
    assert len(sel) < batch.n_reads


def test_superstep_cap_raises_not_silent():
    """An exhausted superstep budget must be a hard error (round-1 weakness:
    silent infeasible return)."""
    rng = np.random.default_rng(5)
    batch = rand_reads_uniform(rng, 500, 1200, 60)
    solver = QuasiMcpPushRelabelSolver(pad_multiple=1024, max_supersteps=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        solver.solve(10, batch)


def test_reference_largest_workload_scale():
    """The reference's biggest exercised workload: 1M pairs / 30 kb / M=1000
    (coverage_tester.cpp:120-135). Global relabel makes this converge in few
    supersteps; round 1 only reached 500 pairs."""
    rng = np.random.default_rng(12345)
    batch = rand_reads_uniform(rng, 1_000_000, 30_000, 150)
    solver = QuasiMcpPushRelabelSolver()
    sel = solver.solve(1000, batch)
    assert_valid(batch, sel, 1000)
    assert len(sel) < batch.n_reads


def test_deterministic():
    rng = np.random.default_rng(9)
    batch = rand_reads_uniform(rng, 300, 1000, 60)
    solver = QuasiMcpPushRelabelSolver(pad_multiple=1024)
    a = solver.solve(4, batch)
    b = solver.solve(4, batch)
    np.testing.assert_array_equal(a, b)
