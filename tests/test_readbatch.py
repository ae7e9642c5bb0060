"""ReadBatch container and pairing semantics."""

import numpy as np

from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.testing.fixtures import small_example_batch
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def test_small_example_shapes():
    b = small_example_batch()
    assert b.n_reads == 16
    assert b.ref_genome_length == 11
    assert b.is_first[0] and not b.is_first[1]


def test_pairs_adjacent_invariant():
    rng = np.random.default_rng(3)
    b = rand_reads_uniform(rng, 100, 2000, 50)
    assert np.all(b.is_first[0::2])
    assert np.all(~b.is_first[1::2])
    # mate = id ^ 1 under the adjacency invariant
    for i in [0, 1, 10, 11]:
        assert b.mate_index(i) == (i ^ 1)


def test_find_pairs_dedup_and_order():
    b = small_example_batch()
    # solution selects reads 0 (first of pair 0) and 1 (second of pair 0),
    # plus read 4 (first of pair 2): expect [0, 1, 4, 5] in first-seen order
    sol = np.array([0, 1, 4])
    got = b.find_pairs(sol)
    np.testing.assert_array_equal(got, [0, 1, 4, 5])


def test_find_pairs_mate_first_order():
    b = small_example_batch()
    # selecting a second-mate first puts (id, mate) in that order, like the
    # reference loop (bam_api.cpp:252-266)
    got = b.find_pairs(np.array([3]))
    np.testing.assert_array_equal(got, [3, 2])


def test_padding_neutral():
    b = small_example_batch()
    arrays, valid = b.padded(multiple=32)
    assert arrays["start"].shape == (32,)
    assert valid.sum() == 16
    assert np.all(arrays["end"][16:] == -1)


def test_select_roundtrip():
    b = small_example_batch()
    sub = b.select([2, 3])
    assert sub.n_reads == 2
    assert sub.bam_id.tolist() == [2, 3]
