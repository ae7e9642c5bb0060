"""C++ greedy vs the Python greedy and device sweep: exactness + bit-parity."""

import numpy as np
import pytest

from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
from genome_downsampler_tpu.solvers.greedy_mcp import GreedyMcpSolver
from genome_downsampler_tpu.solvers.native_greedy import (
    NativeGreedyMcpSolver,
    native_greedy_select,
)
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


def test_small_example_matches_python():
    batch = small_example_batch()
    m = SMALL_EXAMPLE_MAX_COVERAGE
    native = NativeGreedyMcpSolver().solve(m, batch)
    python = GreedyMcpSolver().solve(m, batch)
    assert len(native) == len(python)
    capped = np.minimum(np_coverage(batch.start, batch.end, 11), m)
    assert np.all(np_coverage(batch.start, batch.end, 11, native) >= capped)


@pytest.mark.parametrize("seed,m", [(0, 3), (1, 7), (2, 40), (3, 1)])
def test_native_exact_and_bit_equal_to_sweep(seed, m):
    rng = np.random.default_rng(seed)
    batch = rand_reads_uniform(rng, 3000, 6144, 60)
    native = NativeGreedyMcpSolver().solve(m, batch)
    sweep = McpDeviceSweepSolver(max_span=64, use_pallas=False).solve(m, batch)
    np.testing.assert_array_equal(native, sweep)
    python = GreedyMcpSolver().solve(m, batch)
    assert len(native) == len(python)


def test_native_large_scale_fast():
    rng = np.random.default_rng(12345)
    batch = rand_reads_uniform(rng, 1_000_000, 30_000, 150)
    import time

    t0 = time.perf_counter()
    native = NativeGreedyMcpSolver().solve(1000, batch)
    dt = time.perf_counter() - t0
    python = GreedyMcpSolver().solve(1000, batch)
    assert len(native) == len(python) == 200_000
    capped = np.minimum(np_coverage(batch.start, batch.end, 30_000), 1000)
    assert np.all(
        np_coverage(batch.start, batch.end, 30_000, native) >= capped
    )
    assert dt < 2.0, f"native greedy too slow: {dt:.2f}s for 2M reads"


def test_external_target():
    batch = small_example_batch()
    target = np.zeros(11, np.int64)
    sel = native_greedy_select(batch.start, batch.end, 11, 4, target=target)
    assert len(sel) == 0


def test_invalid_bounds_raise():
    with pytest.raises(ValueError):
        native_greedy_select(
            np.array([5], np.int64), np.array([20], np.int64), 10, 3
        )


def test_native_reconstruction_matches_numpy():
    """gd_reconstruct (C counting sorts) agrees with the numpy lexsort
    reconstruction bit-for-bit, above and below the dispatch threshold."""
    from genome_downsampler_tpu.solvers.device_sweep import (
        _reconstruct_native,
        reconstruct_selection,
    )

    rng = np.random.default_rng(11)
    n, r = 5_000, 250_000  # above the native-dispatch threshold
    start = rng.integers(0, n - 160, r)
    end = start + rng.integers(0, 160, r)
    # a valid per-end quota: never exceeds each bucket's read count
    bucket = np.bincount(end, minlength=n)
    sel_per_end = rng.integers(0, bucket + 1)

    native = _reconstruct_native(start, end, sel_per_end)
    # numpy path, forced (r below threshold by slicing logic is not enough;
    # call the lexsort branch by monkey-free direct comparison on a copy)
    order = np.lexsort((np.arange(r), start, end))
    e_sorted = end[order]
    group_first = np.concatenate([[True], e_sorted[1:] != e_sorted[:-1]])
    idx = np.arange(r)
    first_idx = np.maximum.accumulate(np.where(group_first, idx, 0))
    rank = idx - first_idx
    take = sel_per_end[e_sorted] > rank
    expected = np.sort(order[take])
    np.testing.assert_array_equal(native, expected)

    # the public entry point picks the native path at this size and agrees
    np.testing.assert_array_equal(
        reconstruct_selection(start, end, sel_per_end), expected
    )


def test_native_reconstruction_rejects_overquota():
    from genome_downsampler_tpu.solvers.device_sweep import _reconstruct_native

    start = np.array([0, 1], np.int64)
    end = np.array([4, 4], np.int64)
    sel = np.zeros(10, np.int64)
    sel[4] = 3  # bucket has only 2 reads
    with pytest.raises(ValueError):
        _reconstruct_native(start, end, sel)
