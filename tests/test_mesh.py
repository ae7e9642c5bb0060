"""Multi-device mesh solver over the 8-device virtual CPU mesh."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from genome_downsampler_tpu.parallel.mesh import solve_on_mesh
from genome_downsampler_tpu.parallel.windows import WindowedMcpSolver
from genome_downsampler_tpu.solvers.device_sweep import reconstruct_selection
from genome_downsampler_tpu.solvers.greedy_mcp import GreedyMcpSolver
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def np_coverage(start, end, n, sel=None):
    cov = np.zeros(n + 1, np.int64)
    s = start if sel is None else start[sel]
    e = end if sel is None else end[sel]
    np.add.at(cov, np.clip(s, 0, n), 1)
    np.add.at(cov, np.clip(e + 1, 0, n), -1)
    return np.cumsum(cov)[:n]


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must force 8 virtual CPU devices"
    return Mesh(np.array(devices[:8]), ("x",))


def test_mesh_solve_exact(mesh8):
    rng = np.random.default_rng(0)
    batch = rand_reads_uniform(rng, 4000, 8192, 60)
    m = 8
    start = np.asarray(batch.start, np.int64)
    end = np.asarray(batch.end, np.int64)
    sel_counts = solve_on_mesh(mesh8, start, end, 8192, m, max_span=64)
    sel = reconstruct_selection(start, end, sel_counts)
    n = batch.ref_genome_length
    capped = np.minimum(np_coverage(start, end, n), m)
    assert np.all(capped <= np_coverage(start, end, n, sel))
    # exact: same count as the global greedy
    assert len(sel) == len(GreedyMcpSolver().solve(m, batch))


def test_mesh_matches_vmap_windows(mesh8):
    """The shard_map path must produce the same selection as the single-chip
    vmapped windows (same relaxation, different execution)."""
    rng = np.random.default_rng(5)
    batch = rand_reads_uniform(rng, 2000, 8192, 60)
    m = 6
    start = np.asarray(batch.start, np.int64)
    end = np.asarray(batch.end, np.int64)
    sel_counts = solve_on_mesh(mesh8, start, end, 8192, m, max_span=64)
    mesh_sel = reconstruct_selection(start, end, sel_counts)
    vmap_sel = WindowedMcpSolver(n_windows=8, max_span=64).solve(m, batch)
    np.testing.assert_array_equal(mesh_sel, vmap_sel)
