"""Multi-op CIGAR reference-length parity with htslib's bam_cigar2rlen.

The reference computes ``end = pos + bam_cigar2rlen - 1`` (read.cpp:11-13):
M/D/N/=/X consume reference; I/S/H/P do not.
"""

import numpy as np

from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.core.readbatch import ReadBatch
from genome_downsampler_tpu.io.bam import read_bam
from genome_downsampler_tpu.testing.bam_writer import write_test_bam


def test_multi_op_cigar_end(tmp_path):
    # pair 0: read A 10S20M5I30D15M  -> rlen = 20+30+15 = 65, end = 5+65-1=69
    #         read B 40M10N10M       -> rlen = 40+10+10 = 60, end = 100+59=159
    rows = [
        (0, 5, 69, 50, 50, True),
        (1, 100, 159, 50, 60, False),
    ]
    batch = ReadBatch.from_reads(rows, ref_genome_length=300)
    cigars = [
        [(10, "S"), (20, "M"), (5, "I"), (30, "D"), (15, "M")],
        [(40, "M"), (10, "N"), (10, "M")],
    ]
    path = tmp_path / "c.bam"
    write_test_bam(path, batch, cigars=cigars)
    got, _, _ = read_bam(path, BamApiConfig(min_seq_length=0, min_mapq=0))
    assert got.n_reads == 2
    np.testing.assert_array_equal(got.start, [5, 100])
    np.testing.assert_array_equal(got.end, [69, 159])


def test_hard_pad_ops_ignored(tmp_path):
    rows = [
        (0, 10, 29, 50, 20, True),
        (1, 50, 69, 50, 20, False),
    ]
    batch = ReadBatch.from_reads(rows, ref_genome_length=200)
    cigars = [
        [(5, "H"), (20, "M"), (3, "P")],
        [(20, "=",)],
    ]
    path = tmp_path / "h.bam"
    write_test_bam(path, batch, cigars=cigars)
    got, _, _ = read_bam(path, BamApiConfig(min_seq_length=0, min_mapq=0))
    np.testing.assert_array_equal(got.end, [29, 69])
