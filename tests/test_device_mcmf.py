"""Device-exact weighted QMCP (scan-based SSP): optimality vs the LP
oracle, validity, dispatch, and registry wiring.

Closes the round-1 gap: the accelerator QMCP path is now *exact* in the
reference objective ``sum(max_quality - quality + 1)``
(``/root/reference/libs/qmcp-solver/src/qmcp_cpu_cost_scaling_solver.cpp:44-49``),
not minimum-count-then-quality.
"""

import numpy as np
import pytest

from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.solvers.device_mcmf import (
    QmcpDeviceMcmfSolver,
    build_convex_buckets,
    ssp_device_select,
)
from genome_downsampler_tpu.solvers.sequential_mcmf import (
    capped_target,
    lp_select,
)
from genome_downsampler_tpu.testing.fixtures import small_example_batch


def np_coverage(start, end, n, sel=None):
    cov = np.zeros(n + 1, np.int64)
    s = start if sel is None else start[sel]
    e = end if sel is None else end[sel]
    np.add.at(cov, np.clip(s, 0, n), 1)
    np.add.at(cov, np.clip(e + 1, 0, n), -1)
    return np.cumsum(cov)[:n]


def assert_exact(start, end, cost, n, m):
    sel = ssp_device_select(start, end, cost, n, m)
    tgt = capped_target(start, end, n, m)
    assert np.all(np_coverage(start, end, n, sel) >= tgt), "invalid coverage"
    lp = lp_select(start, end, n, tgt, cost)
    assert cost[sel].sum() == cost[lp].sum(), (
        f"device cost {cost[sel].sum()} != LP optimum {cost[lp].sum()}"
    )
    return sel


# One fixed genome length so the jitted phase compiles once for the sweep.
N = 600


@pytest.mark.parametrize("seed", range(6))
def test_device_ssp_matches_lp_random(seed):
    rng = np.random.default_rng(seed)
    r = int(rng.integers(8, 300))
    start = rng.integers(0, N, r)
    length = rng.integers(1, N // 4, r)
    end = np.minimum(start + length, N - 1)
    cost = rng.integers(1, 60, r)
    m = int(rng.integers(1, 9))
    assert_exact(start, end, cost, N, m)


def test_device_ssp_trades_count_for_quality():
    """The exact weighted optimum can select MORE reads than the minimum
    count when that lowers total cost — the case the round-1 sweep
    heuristic provably missed (old tests/test_qmcp_sweep.py:42-49)."""
    # one read covering [0, 9] at terrible quality vs two cheap halves
    start = np.array([0, 0, 5])
    end = np.array([9, 4, 9])
    cost = np.array([50, 1, 1])
    sel = ssp_device_select(start, end, cost, 10, 1)
    assert sorted(sel.tolist()) == [1, 2]


def test_device_ssp_small_example_fixture():
    batch = small_example_batch()
    q = np.asarray(batch.quality, np.int64)
    cost = q.max() - q + 1
    assert_exact(
        np.asarray(batch.start, np.int64),
        np.asarray(batch.end, np.int64),
        cost,
        batch.ref_genome_length,
        4,
    )


def test_solver_class_exact_and_quality_flag():
    rng = np.random.default_rng(11)
    r = 120
    start = rng.integers(0, N, r)
    end = np.minimum(start + rng.integers(5, 80, r), N - 1)
    quality = rng.integers(0, 70, r)
    batch = ReadBatch(
        bam_id=np.arange(r),
        start=start,
        end=end,
        quality=quality,
        seq_length=end - start + 1,
        is_first=np.tile([True, False], r // 2),
        ref_genome_length=N,
    )
    solver = QmcpDeviceMcmfSolver()
    assert solver.uses_quality_of_reads
    sel = solver.solve(3, batch)
    cost = (quality.max() - quality + 1).astype(np.int64)
    tgt = capped_target(start, end, N, 3)
    lp = lp_select(start, end, N, tgt, cost)
    assert cost[sel].sum() == cost[lp].sum()
    assert np.all(np_coverage(start, end, N, sel) >= tgt)


def test_long_genome_dispatches_to_host_engine():
    rng = np.random.default_rng(5)
    r = 60
    n = 900
    start = rng.integers(0, n, r)
    end = np.minimum(start + rng.integers(5, 60, r), n - 1)
    quality = rng.integers(0, 50, r)
    batch = ReadBatch(
        bam_id=np.arange(r),
        start=start,
        end=end,
        quality=quality,
        seq_length=end - start + 1,
        is_first=np.tile([True, False], r // 2),
        ref_genome_length=n,
    )
    # force the host-MCMF fallback by shrinking the device limit
    host_path = QmcpDeviceMcmfSolver(device_genome_limit=10).solve(2, batch)
    dev_path = QmcpDeviceMcmfSolver().solve(2, batch)
    cost = (quality.max() - quality + 1).astype(np.int64)
    assert cost[host_path].sum() == cost[dev_path].sum()


def test_registry_qmcp_tpu_is_exact_solver():
    from genome_downsampler_tpu.solvers.base import SpanGuard
    from genome_downsampler_tpu.solvers.registry import default_registry

    reg = default_registry()
    solver = reg.get("qmcp-tpu")
    # the registry shields every solver from zero-span reads (SpanGuard);
    # the production engine underneath must be the exact device MCMF
    assert isinstance(solver, SpanGuard)
    assert isinstance(solver.inner, QmcpDeviceMcmfSolver)
    assert reg.uses_quality_of_reads("qmcp-tpu")


def test_bucket_packing_fast_and_lexsort_paths_agree():
    rng = np.random.default_rng(3)
    r = 500
    start = rng.integers(0, 2000, r)
    end = start + rng.integers(0, 300, r)
    cost = rng.integers(0, 900, r)
    bs1, be1, off1, pool1, order1, first1 = build_convex_buckets(
        start, end, cost
    )
    # force the lexsort path with one huge cost
    cost2 = cost.copy()
    cost2[0] += 1 << 20
    cost2[0] -= 1 << 20
    big = cost.astype(np.int64)
    big[r - 1] = 1 << 12  # >= 1<<10 breaks the packed-key precondition
    bs2, be2, off2, pool2, order2, first2 = build_convex_buckets(
        start, end, big
    )
    assert np.array_equal(bs1, bs2)
    assert np.array_equal(be1, be2)
    assert np.array_equal(off1, off2)
    # pools agree except the perturbed entry's value
    mask = pool2 < (1 << 12)
    assert np.array_equal(pool1[mask], pool2[mask])
