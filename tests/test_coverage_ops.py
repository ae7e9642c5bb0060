"""Coverage op parity with the reference's per-base loops."""

import numpy as np
import jax.numpy as jnp

from genome_downsampler_tpu.ops.coverage import (
    capped_coverage,
    coverage_from_intervals,
    coverage_is_valid,
    demand_from_capped,
)
from genome_downsampler_tpu.testing.fixtures import small_example_batch


def naive_coverage(start, end, n):
    """Reference semantics: BamApi::find_input_cover (bam_api.cpp:275-286)."""
    cov = np.zeros(n, np.int64)
    for s, e in zip(start, end):
        for j in range(s, e + 1):
            cov[j] += 1
    return cov


def naive_demand(capped):
    """Reference create_demand_function (quasi_mcp_cpu_max_flow_solver.cpp:75-87)."""
    n = len(capped)
    b = np.zeros(n + 1, np.int64)
    b[1:] = capped
    d = np.zeros(n + 1, np.int64)
    b1 = b[1]
    d[1:n] = b[1:n] - b[2 : n + 1]
    d[0] = -b1
    d[n] = b[n]
    return d


def test_coverage_matches_naive_small():
    batch = small_example_batch()
    got = np.asarray(
        coverage_from_intervals(
            jnp.asarray(batch.start), jnp.asarray(batch.end), batch.ref_genome_length
        )
    )
    want = naive_coverage(batch.start, batch.end, batch.ref_genome_length)
    np.testing.assert_array_equal(got, want)


def test_coverage_matches_naive_random():
    rng = np.random.default_rng(0)
    n = 500
    r = 300
    start = rng.integers(0, n - 1, r)
    length = rng.integers(1, 80, r)
    end = np.minimum(start + length - 1, n - 1)
    got = np.asarray(
        coverage_from_intervals(jnp.asarray(start), jnp.asarray(end), n)
    )
    np.testing.assert_array_equal(got, naive_coverage(start, end, n))


def test_coverage_weighted_mask_ignores_padding():
    n = 50
    start = np.array([0, 10, 0], np.int32)
    end = np.array([9, 19, -1], np.int32)  # last is a padded sentinel
    w = np.array([1, 1, 0], np.int32)
    got = np.asarray(
        coverage_from_intervals(jnp.asarray(start), jnp.asarray(end), n, jnp.asarray(w))
    )
    want = naive_coverage(start[:2], end[:2], n)
    np.testing.assert_array_equal(got, want)


def test_demand_matches_reference_formula():
    rng = np.random.default_rng(1)
    capped = rng.integers(0, 12, 40)
    got = np.asarray(demand_from_capped(jnp.asarray(capped)))
    np.testing.assert_array_equal(got, naive_demand(capped))
    assert got.sum() == 0


def test_demand_small_example():
    batch = small_example_batch()
    cov = coverage_from_intervals(
        jnp.asarray(batch.start), jnp.asarray(batch.end), batch.ref_genome_length
    )
    capped = capped_coverage(cov, 4)
    d = np.asarray(demand_from_capped(capped))
    assert d.shape == (batch.ref_genome_length + 1,)
    assert d.sum() == 0
    np.testing.assert_array_equal(d, naive_demand(np.asarray(capped)))


def test_coverage_validity_property():
    batch = small_example_batch()
    cov = coverage_from_intervals(
        jnp.asarray(batch.start), jnp.asarray(batch.end), batch.ref_genome_length
    )
    assert bool(coverage_is_valid(cov, cov, 4))
    assert not bool(coverage_is_valid(cov, jnp.zeros_like(cov), 4))
