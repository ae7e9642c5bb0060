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


def test_ssp_grade_remapped_costs_regression(monkeypatch):
    """Regression: SSP's augmentation walk once followed STALE parent
    pointers past a phase's Dijkstra roots (parent[] was never re-cleared
    per phase), which cycled forever on this GRADE-remapped workload —
    amplicon-graded qualities spread costs 1..59 over a dip-heavy target,
    driving many alternating forward/reverse phases. Both engines must
    terminate and agree on the optimum cost."""
    rng = np.random.default_rng(3)
    batch = rand_reads_uniform(rng, 1500, 4000, 120)
    # GRADE-like remap: in-amplicon pairs boosted above the rest
    q = np.asarray(batch.quality) % 30 + 31
    boost = (np.asarray(batch.start) < 1500) | (np.asarray(batch.start) >= 1800)
    batch.quality = np.where(boost, q + 28, q - 31).astype(np.int32)
    costs = {}
    for engine in ("ssp", "scale"):
        monkeypatch.setenv("GD_MCMF_ENGINE", engine)
        sel = NativeQmcpSolver().solve(10, batch)
        q64 = np.asarray(batch.quality, np.int64)
        cost = q64.max() - q64 + 1
        costs[engine] = int(cost[sel].sum())
        n = batch.ref_genome_length
        capped = np.minimum(np_coverage(batch, n), 10)
        assert np.all(np_coverage(batch, n, sel) >= capped), engine
    assert costs["ssp"] == costs["scale"]


def test_mcmf_empty():
    from genome_downsampler_tpu.core.readbatch import ReadBatch

    sel = NativeQmcpSolver().solve(5, ReadBatch.empty(100))
    assert len(sel) == 0


def test_bench_chr1_qmcp_smoke():
    """The chromosome-scale QMCP bench script runs exactly at a reduced
    ladder size (reproducible Weyl reads, validity asserted in-script)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, "-u", str(repo / "scripts" / "bench_chr1.py"),
         "--qmcp", "0.2", "30"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK exact weighted QMCP" in proc.stdout
