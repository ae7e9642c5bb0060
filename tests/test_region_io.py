"""Indexed region reads + voffset-keyed writing (host-sharded input path)."""

import numpy as np
import pytest

from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.io.bai import parse_bai, seek_voffset_for, write_bai
from genome_downsampler_tpu.io.bam import read_bam, read_bam_region, write_bam
from genome_downsampler_tpu.testing.bam_writer import write_test_bam
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def make_sorted_bam(tmp_path, pairs=800, n=20_000, read_len=120, seed=0):
    rng = np.random.default_rng(seed)
    batch = rand_reads_uniform(rng, pairs, n, read_len)
    path = tmp_path / "in.bam"
    write_test_bam(path, batch, coordinate_sorted=True, make_index=True)
    return path, batch


def test_bai_roundtrip(tmp_path):
    starts = np.array([0, 100, 20_000, 40_000], np.int64)
    ends = starts + 149
    voffs = np.array([5, 7, 900, 1200], np.uint64)
    p = tmp_path / "x.bai"
    write_bai(p, starts, ends, voffs)
    linear = parse_bai(p)
    assert len(linear) == 1
    ioff = linear[0]
    assert seek_voffset_for(ioff, 0) == 5
    assert seek_voffset_for(ioff, 100) == 5       # same 16kb window
    assert seek_voffset_for(ioff, 20_000) == 900
    assert seek_voffset_for(ioff, 30_000) == 900  # gap filled backward
    assert seek_voffset_for(ioff, 45_000) == 1200


def test_region_read_matches_full_read_filtered(tmp_path):
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    path, _ = make_sorted_bam(tmp_path)
    full, _, _ = read_bam(path, cfg)

    lo, hi = 4_000, 12_000
    region, _, _ = read_bam_region(path, cfg, lo, hi)
    # same reads as the full read restricted to pairs with both starts in
    # [lo, hi] (region pairing sees only the window)
    keep = []
    for i in range(0, full.n_reads, 2):
        if lo <= full.start[i] <= hi and lo <= full.start[i + 1] <= hi:
            keep += [i, i + 1]
    want = full.select(np.array(keep, np.int64))
    order_w = np.lexsort((want.is_first, want.start))
    order_g = np.lexsort((region.is_first, region.start))
    np.testing.assert_array_equal(
        want.start[order_w], region.start[order_g]
    )
    np.testing.assert_array_equal(want.end[order_w], region.end[order_g])
    np.testing.assert_array_equal(
        want.quality[order_w], region.quality[order_g]
    )
    assert region.ref_genome_length == full.ref_genome_length


def test_region_seek_skips_file_prefix(tmp_path):
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    path, _ = make_sorted_bam(tmp_path, pairs=3000, n=100_000)
    # with the index, a tail region scans far fewer records than the file has
    region, _, _ = read_bam_region(path, cfg, 80_000, 100_000)
    assert region.n_reads > 0
    assert (region.start >= 80_000).all()


def test_write_by_voffsets_roundtrip(tmp_path):
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    path, _ = make_sorted_bam(tmp_path)
    region, _, _ = read_bam_region(path, cfg, 0, 6_000)
    out = tmp_path / "out.bam"
    wrote = write_bam(path, out, region.bam_id, ids_are_voffsets=True)
    assert wrote == region.n_reads
    back, _, _ = read_bam(out, cfg)
    assert back.n_reads == region.n_reads
    np.testing.assert_array_equal(
        np.sort(back.start), np.sort(region.start)
    )


def make_bounded_insert_batch(pairs, n, read_len, max_insert, seed):
    """Pairs whose mate distance is bounded (real paired-end geometry) —
    the sharded-read contract requires halo > max mate distance, which the
    reference-style generator (independent mate positions) violates."""
    rng = np.random.default_rng(seed)
    first = rng.integers(0, n - read_len - max_insert, pairs)
    second = first + rng.integers(0, max_insert - read_len + 1, pairs)
    start = np.empty(2 * pairs, np.int64)
    start[0::2] = first
    start[1::2] = second
    return ReadBatch(
        bam_id=np.arange(2 * pairs, dtype=np.int64),
        start=start,
        end=start + read_len - 1,
        quality=rng.integers(0, 101, 2 * pairs),
        seq_length=np.full(2 * pairs, read_len, np.int64),
        is_first=np.tile([True, False], pairs),
        ref_genome_length=n,
    )


def test_sharded_union_covers_everything(tmp_path):
    """Two hosts with halo'd windows: owned-pair union == full read."""
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    batch = make_bounded_insert_batch(1200, 20_000, 120, 800, seed=3)
    path = tmp_path / "in.bam"
    write_test_bam(path, batch, coordinate_sorted=True, make_index=True)
    full, _, _ = read_bam(path, cfg)
    halo = 1_000  # > max mate distance (800) by construction
    cut = 10_000
    owned_starts = []
    for lo, hi, own_lo, own_hi in [
        (0, cut - 1 + halo, 0, cut),
        (cut - halo, 20_000, cut, 20_001),
    ]:
        b, _, _ = read_bam_region(path, cfg, lo, hi)
        # pair ownership: leftmost mate start in [own_lo, own_hi)
        for i in range(0, b.n_reads, 2):
            s = min(int(b.start[i]), int(b.start[i + 1]))
            if own_lo <= s < own_hi:
                owned_starts += [int(b.start[i]), int(b.start[i + 1])]
    np.testing.assert_array_equal(
        np.sort(np.array(owned_starts)), np.sort(full.start)
    )
