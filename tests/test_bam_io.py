"""Native BAM I/O: roundtrip, pairing, filters, GRADE, writer re-stream."""

import numpy as np
import pytest

from genome_downsampler_tpu.config import AmpliconBehaviour, BamApiConfig
from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.io.bam import BamReader, read_bam, write_bam
from genome_downsampler_tpu.testing.bam_writer import write_test_bam
from genome_downsampler_tpu.testing.fixtures import small_example_batch
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def no_filter_config(**kw):
    return BamApiConfig(min_seq_length=0, min_mapq=0, **kw)


def test_roundtrip_small(tmp_path):
    batch = small_example_batch()
    path = tmp_path / "small.bam"
    write_test_bam(path, batch)
    got, filtered_out, _ = read_bam(path, no_filter_config())
    assert got.ref_genome_length == 11
    assert got.n_reads == 16
    assert len(filtered_out) == 0
    np.testing.assert_array_equal(got.start, batch.start)
    np.testing.assert_array_equal(got.end, batch.end)
    np.testing.assert_array_equal(got.seq_length, batch.seq_length)
    np.testing.assert_array_equal(got.is_first, batch.is_first)


def test_roundtrip_large_coordinate_sorted(tmp_path):
    rng = np.random.default_rng(4)
    batch = rand_reads_uniform(rng, 5000, 30_000, 150)
    path = tmp_path / "big.bam"
    write_test_bam(path, batch, coordinate_sorted=True)
    got, filtered_out, _ = read_bam(path, no_filter_config())
    assert got.n_reads == batch.n_reads
    assert len(filtered_out) == 0
    # same multiset of intervals regardless of file order
    np.testing.assert_array_equal(
        np.sort(got.start), np.sort(np.asarray(batch.start))
    )
    # mates stay adjacent, first mate first
    assert np.all(got.is_first[0::2])
    assert np.all(~got.is_first[1::2])


def test_min_mapq_filter(tmp_path):
    batch = small_example_batch()
    q = np.asarray(batch.quality).copy()
    q[:] = 50
    q[2] = 5  # second pair's first mate fails -> both mates dropped
    batch.quality = q
    path = tmp_path / "q.bam"
    write_test_bam(path, batch)
    got, filtered_out, _ = read_bam(path, BamApiConfig(min_seq_length=0, min_mapq=30))
    assert got.n_reads == 14
    assert sorted(filtered_out.tolist()) == [2, 3]


def test_min_length_filter(tmp_path):
    batch = small_example_batch()  # seq lengths 2..5
    path = tmp_path / "l.bam"
    write_test_bam(path, batch)
    got, filtered_out, _ = read_bam(path, BamApiConfig(min_seq_length=3, min_mapq=0))
    # pairs where either mate has seq_length < 3 drop: reads 6/7 (4,2) and
    # 10/11 (3,2)
    assert sorted(filtered_out.tolist()) == [6, 7, 10, 11]
    assert got.n_reads == 12


def test_unpaired_read_dropped(tmp_path):
    rows = [
        (0, 0, 9, 40, 10, True),
        (1, 5, 14, 40, 10, False),
        (2, 3, 12, 40, 10, True),  # mate never appears
    ]
    batch = ReadBatch.from_reads(rows, ref_genome_length=20)
    path = tmp_path / "u.bam"
    write_test_bam(path, batch)
    got, filtered_out, _ = read_bam(path, no_filter_config())
    assert got.n_reads == 2
    assert filtered_out.tolist() == [2]


def test_amplicon_filter(tmp_path):
    bed = tmp_path / "amp.bed"
    bed.write_text(
        "ref1\t0\t5\ta_LEFT\nref1\t15\t20\ta_RIGHT\n"
    )
    rows = [
        (0, 0, 9, 40, 10, True),
        (1, 8, 17, 40, 10, False),   # inside amplicon [0,20]
        (2, 10, 19, 40, 10, True),
        (3, 21, 29, 40, 9, False),   # outside -> pair dropped under FILTER
    ]
    batch = ReadBatch.from_reads(rows, ref_genome_length=40)
    path = tmp_path / "a.bam"
    write_test_bam(path, batch)
    cfg = no_filter_config(
        amplicon_behaviour=AmpliconBehaviour.FILTER, bed_path=bed
    )
    got, filtered_out, _ = read_bam(path, cfg)
    assert got.n_reads == 2
    assert sorted(filtered_out.tolist()) == [2, 3]


def test_amplicon_grade_remap(tmp_path):
    bed = tmp_path / "amp.bed"
    bed.write_text("ref1\t0\t5\ta_LEFT\nref1\t15\t20\ta_RIGHT\n")
    rows = [
        (0, 0, 9, 10, 10, True),
        (1, 8, 17, 20, 10, False),   # in single amplicon
        (2, 10, 19, 30, 10, True),
        (3, 21, 29, 40, 9, False),   # not inside any amplicon
    ]
    batch = ReadBatch.from_reads(rows, ref_genome_length=40)
    path = tmp_path / "g.bam"
    write_test_bam(path, batch)
    cfg = no_filter_config(
        amplicon_behaviour=AmpliconBehaviour.GRADE, bed_path=bed
    )
    got, filtered_out, in_single = read_bam(path, cfg)
    assert got.n_reads == 4
    # min_mapq=10, max_mapq=40 over accepted pairs;
    # remap: q - 10 + (30 if in single amplicon else 0)
    np.testing.assert_array_equal(got.quality, [30, 40, 20, 30])
    np.testing.assert_array_equal(in_single, [True, True, False, False])


def test_writer_restream_subset(tmp_path):
    rng = np.random.default_rng(7)
    batch = rand_reads_uniform(rng, 500, 10_000, 100)
    src = tmp_path / "in.bam"
    out = tmp_path / "out.bam"
    write_test_bam(src, batch, coordinate_sorted=True)
    loaded, _, _ = read_bam(src, no_filter_config())
    keep = np.arange(0, loaded.n_reads, 3)
    wrote = write_bam(src, out, loaded.bam_id[keep])
    assert wrote == len(keep)
    again, _, _ = read_bam(out, no_filter_config())
    # re-read drops now-unpaired mates; record count check via identity ids
    # instead: reload with the identity config and compare raw multisets
    kept_ids = set(loaded.bam_id[keep].tolist())
    # all remaining pairs in `again` must come from kept ids' pairs
    assert again.n_reads <= len(keep)


def test_writer_full_copy_bit_equal(tmp_path):
    batch = small_example_batch()
    src = tmp_path / "in.bam"
    out = tmp_path / "out.bam"
    write_test_bam(src, batch)
    loaded, _, _ = read_bam(src, no_filter_config())
    wrote = write_bam(src, out, loaded.bam_id)
    assert wrote == 16
    a, _, _ = read_bam(out, no_filter_config())
    np.testing.assert_array_equal(a.start, loaded.start)
    np.testing.assert_array_equal(a.end, loaded.end)
    np.testing.assert_array_equal(a.quality, loaded.quality)


def test_bam_reader_facade(tmp_path):
    batch = small_example_batch()
    src = tmp_path / "in.bam"
    write_test_bam(src, batch)
    reader = BamReader(src, no_filter_config())
    got = reader.get_batch()
    assert got.n_reads == 16
    out = tmp_path / "sol.bam"
    wrote = reader.write_paired_reads(out, np.array([0, 1, 2, 3]))
    assert wrote == 4


def test_multi_contig_uses_first_and_skips_rest(tmp_path):
    """Reference quirk: genome length comes from the first contig
    (bam_api.cpp:422); our deviation skips other-contig records safely."""
    batch = small_example_batch()
    src = tmp_path / "m.bam"
    write_test_bam(src, batch, extra_refs=[("ref2", 999)])
    got, _, _ = read_bam(src, no_filter_config())
    assert got.ref_genome_length == 11
    assert got.n_reads == 16


def test_missing_file_raises():
    with pytest.raises(IOError):
        read_bam("/nonexistent/file.bam", no_filter_config())


def test_writer_id_past_eof_raises(tmp_path):
    batch = small_example_batch()
    path = tmp_path / "eof.bam"
    write_test_bam(path, batch)
    # id 999 is past the last record: must error, not silently under-write
    with pytest.raises(IOError, match="past end of stream"):
        write_bam(path, tmp_path / "out.bam", np.array([0, 1, 999]))


def test_writer_voffset_past_eof_raises(tmp_path):
    batch = small_example_batch()
    path = tmp_path / "eof2.bam"
    write_test_bam(path, batch, coordinate_sorted=True)
    got, _, _ = read_bam(path, no_filter_config())
    with pytest.raises(IOError, match="past end of stream"):
        write_bam(
            path, tmp_path / "out.bam",
            np.array([1 << 60], np.int64), ids_are_voffsets=True,
        )


def test_whole_file_scan_thread_invariance(tmp_path):
    """r5 batch-parallel record scan: the emitted arrays (and their ORDER
    — the pair-completion contract) must be bit-identical across thread
    counts, on a file large enough to span several inflate batches and
    force records to straddle batch boundaries."""
    import numpy as np

    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.io.bam import read_bam
    from genome_downsampler_tpu.testing.bam_writer import write_test_bam
    from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform

    rng = np.random.default_rng(17)
    batch = rand_reads_uniform(rng, 60_000, 100_000, 150)
    bam = tmp_path / "ti.bam"
    write_test_bam(bam, batch, coordinate_sorted=True)

    cfgs = [
        BamApiConfig(min_mapq=0, min_seq_length=0, hts_thread_count=t)
        for t in (1, 2, 8)
    ]
    ref, ref_fo, _ = read_bam(bam, cfgs[0])
    assert ref.n_reads == batch.n_reads
    for cfg in cfgs[1:]:
        got, got_fo, _ = read_bam(bam, cfg)
        np.testing.assert_array_equal(got.bam_id, ref.bam_id)
        np.testing.assert_array_equal(got.start, ref.start)
        np.testing.assert_array_equal(got.end, ref.end)
        np.testing.assert_array_equal(got.quality, ref.quality)
        np.testing.assert_array_equal(got.is_first, ref.is_first)
        np.testing.assert_array_equal(got_fo, ref_fo)
