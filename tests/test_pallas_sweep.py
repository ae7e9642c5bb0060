"""Pallas sweep kernel vs the lax.scan reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from genome_downsampler_tpu.ops.coverage import (
    capped_coverage,
    coverage_from_intervals,
)
from genome_downsampler_tpu.ops.pallas_sweep import pallas_sweep_counts
from genome_downsampler_tpu.solvers.device_sweep import (
    build_start_rows,
    sweep_counts,
)
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def make_problem(seed, pairs, n, read_len, m, L):
    rng = np.random.default_rng(seed)
    batch = rand_reads_uniform(rng, pairs, n, read_len)
    arrays, valid = batch.padded(1024)
    start = jnp.asarray(arrays["start"])
    end = jnp.asarray(arrays["end"])
    w = jnp.asarray(valid).astype(jnp.int32)
    rows = build_start_rows(start, end - start + 1, w, n, L)
    target = capped_coverage(coverage_from_intervals(start, end, n, w), m)
    return rows, target


@pytest.mark.parametrize("seed,m", [(0, 3), (1, 9)])
def test_pallas_matches_scan(seed, m):
    L = 64
    rows, target = make_problem(seed, 2000, 4096, 60, m, L)
    z = jnp.zeros(L, jnp.int32)
    ref = sweep_counts(rows, target, z, z, L)
    pal = pallas_sweep_counts(rows, target, z, z, L, block=512, interpret=True)
    for r, p in zip(ref, pal):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(p))


def test_pallas_carry_in_matches_scan():
    L = 64
    rows, target = make_problem(5, 1500, 2048, 50, 4, L)
    rng = np.random.default_rng(9)
    a0 = jnp.asarray(rng.integers(0, 3, L).astype(np.int32))
    s0 = jnp.asarray(rng.integers(0, 2, L).astype(np.int32))
    ref = sweep_counts(rows, target, a0, s0, L)
    pal = pallas_sweep_counts(rows, target, a0, s0, L, block=256, interpret=True)
    for r, p in zip(ref, pal):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(p))


def test_solver_pallas_flag_matches_scan_backend():
    from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver

    rng = np.random.default_rng(2)
    batch = rand_reads_uniform(rng, 1000, 4096, 60)
    scan_sel = McpDeviceSweepSolver(max_span=64, use_pallas=False).solve(5, batch)
    # interpret-mode pallas via monkeypatched kernel entry is covered above;
    # here ensure the auto flag stays off on CPU and matches
    auto_sel = McpDeviceSweepSolver(max_span=64, use_pallas="auto").solve(5, batch)
    np.testing.assert_array_equal(scan_sel, auto_sel)
