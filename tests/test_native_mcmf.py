"""C++ cost-scaling MCMF: exact weighted optimum vs the LP oracle."""

import numpy as np
import pytest

from genome_downsampler_tpu.solvers.native_mcmf import NativeQmcpSolver
from genome_downsampler_tpu.solvers.sequential_mcmf import QmcpSequentialSolver
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def np_coverage(batch, n, sel=None):
    cov = np.zeros(n + 1, np.int64)
    s = batch.start if sel is None else batch.start[sel]
    e = batch.end if sel is None else batch.end[sel]
    np.add.at(cov, np.clip(s, 0, n), 1)
    np.add.at(cov, np.clip(e + 1, 0, n), -1)
    return np.cumsum(cov)[:n]


# both native engines (SSP and eps-scaling) must match the LP oracle; the
# dispatcher would otherwise only ever exercise SSP at test sizes
@pytest.mark.parametrize("engine", ["ssp", "scale"])
@pytest.mark.parametrize("seed", range(6))
def test_mcmf_matches_lp_optimum(seed, engine, monkeypatch):
    monkeypatch.setenv("GD_MCMF_ENGINE", engine)
    rng = np.random.default_rng(seed)
    batch = rand_reads_uniform(rng, 80, 400, 30)
    m = int(rng.integers(1, 5))
    lp = QmcpSequentialSolver().solve(m, batch)
    nat = NativeQmcpSolver().solve(m, batch)
    q = np.asarray(batch.quality, np.int64)
    cost = q.max() - q + 1
    assert cost[nat].sum() == cost[lp].sum()
    n = batch.ref_genome_length
    capped = np.minimum(np_coverage(batch, n), m)
    assert np.all(np_coverage(batch, n, nat) >= capped)


@pytest.mark.parametrize("engine", ["ssp", "scale"])
def test_mcmf_medium_valid_and_quality_preferring(engine, monkeypatch):
    monkeypatch.setenv("GD_MCMF_ENGINE", engine)
    rng = np.random.default_rng(12345)
    batch = rand_reads_uniform(rng, 2500, 6000, 150)
    m = 50
    sel = NativeQmcpSolver().solve(m, batch)
    n = batch.ref_genome_length
    capped = np.minimum(np_coverage(batch, n), m)
    assert np.all(np_coverage(batch, n, sel) >= capped)
    # weighted objective must not exceed the unit-cost optimum's objective
    from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver

    mcp = NativeGreedyMcpSolver().solve(m, batch)
    q = np.asarray(batch.quality, np.int64)
    cost = q.max() - q + 1
    assert cost[sel].sum() <= cost[mcp].sum()


def test_mcmf_empty():
    from genome_downsampler_tpu.core.readbatch import ReadBatch

    sel = NativeQmcpSolver().solve(5, ReadBatch.empty(100))
    assert len(sel) == 0
