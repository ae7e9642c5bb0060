"""Host-sharded pipeline: indexed region reads + mesh solve + voffset merge.

Single-process correctness here; the 2-process bit-equality run lives in
``test_multiprocess_sharded.py``.
"""

import numpy as np
import pytest

from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.io.bam import read_bam
from genome_downsampler_tpu.parallel.sharded_io import (
    bam_genome_length,
    run_sharded,
)
from genome_downsampler_tpu.testing.bam_writer import write_test_bam

from tests.test_region_io import make_bounded_insert_batch


@pytest.fixture
def sorted_indexed_bam(tmp_path):
    batch = make_bounded_insert_batch(
        pairs=2000, n=16_384, read_len=100, max_insert=600, seed=11
    )
    path = tmp_path / "in.bam"
    write_test_bam(path, batch, coordinate_sorted=True, make_index=True)
    return path


def test_bam_genome_length(sorted_indexed_bam):
    assert bam_genome_length(sorted_indexed_bam) == 16_384


def test_run_sharded_output_valid_and_matches_solver(
    sorted_indexed_bam, tmp_path
):
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    out = tmp_path / "out.bam"
    m = 6
    merged = run_sharded(
        sorted_indexed_bam, m, cfg, out, halo=1024, max_span=128
    )
    assert out.exists()

    # the written records' coverage satisfies the validity invariant
    full, _, _ = read_bam(sorted_indexed_bam, cfg)
    sel_b, _, _ = read_bam(out, cfg)
    n = full.ref_genome_length
    ci = np.zeros(n + 1, np.int64)
    np.add.at(ci, full.start, 1)
    np.add.at(ci, full.end + 1, -1)
    ci = np.cumsum(ci)[:n]
    co = np.zeros(n + 1, np.int64)
    np.add.at(co, sel_b.start, 1)
    np.add.at(co, sel_b.end + 1, -1)
    co = np.cumsum(co)[:n]
    assert np.all(np.minimum(ci, m) <= co)
    assert sel_b.n_reads == len(merged)
    assert sel_b.n_reads < full.n_reads  # actually downsampled


def test_run_sharded_blocked_engine_matches_dense(
    sorted_indexed_bam, tmp_path
):
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    m = 6
    dense = run_sharded(
        sorted_indexed_bam, m, cfg, None, halo=1024, max_span=128,
        engine="dense",
    )
    blocked = run_sharded(
        sorted_indexed_bam, m, cfg, tmp_path / "out_b.bam", halo=1024,
        max_span=128, engine="blocked", block=64, windows_per_device=2,
    )
    np.testing.assert_array_equal(dense, blocked)
