"""BASELINE config 3: the amplicon BED+TSV path end-to-end through the CLI.

FILTER behaviour with a count-based solver, GRADE with a quality-based one
(the app picks per ``uses_quality_of_reads``, ``src/app.cpp:120-128``).
"""

import numpy as np
import pytest

from genome_downsampler_tpu.cli.main import main
from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.io.bam import read_bam
from genome_downsampler_tpu.testing.bam_writer import write_test_bam
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


@pytest.fixture()
def amplicon_setup(tmp_path):
    # genome of 4000 with two amplicons [0,1500] and [1800,3600]
    rng = np.random.default_rng(3)
    batch = rand_reads_uniform(rng, 1500, 4000, 120)
    batch.quality = np.asarray(batch.quality) % 30 + 31  # pass default MAPQ
    src = tmp_path / "in.bam"
    write_test_bam(src, batch, coordinate_sorted=True)
    bed = tmp_path / "amp.bed"
    bed.write_text(
        "ref1\t0\t120\tA1_LEFT\nref1\t1380\t1500\tA1_RIGHT\n"
        "ref1\t1800\t1920\tA2_LEFT\nref1\t3480\t3600\tA2_RIGHT\n"
    )
    tsv = tmp_path / "amp.tsv"
    tsv.write_text("A1_LEFT\tA1_RIGHT\nA2_LEFT\tA2_RIGHT\n")
    return src, bed, tsv, batch


def test_filter_path_cli(amplicon_setup, tmp_path):
    src, bed, tsv, batch = amplicon_setup
    out = tmp_path / "out.bam"
    rc = main([str(src), "10", "-o", str(out), "-a", "mcp-cpu",
               "-b", str(bed), "-t", str(tsv), "-l", "0", "-q", "0"])
    assert rc == 0
    result, _, _ = read_bam(out, BamApiConfig(min_seq_length=0, min_mapq=0))
    # FILTER: every surviving pair fully inside one amplicon
    for i in range(0, result.n_reads, 2):
        s1, e1 = result.start[i], result.end[i]
        s2, e2 = result.start[i + 1], result.end[i + 1]
        in_a1 = s1 >= 0 and e1 <= 1500 and s2 >= 0 and e2 <= 1500
        in_a2 = s1 >= 1800 and e1 <= 3600 and s2 >= 1800 and e2 <= 3600
        assert in_a1 or in_a2, f"pair {i} outside amplicons"


def test_grade_path_cli(amplicon_setup, tmp_path):
    src, bed, tsv, batch = amplicon_setup
    out = tmp_path / "out.bam"
    # qmcp-cpu uses quality -> GRADE behaviour: nothing filtered by
    # amplicons, qualities remapped to prioritize in-amplicon pairs
    rc = main([str(src), "10", "-o", str(out), "-a", "qmcp-cpu",
               "-b", str(bed), "-t", str(tsv), "-l", "0", "-q", "0"])
    assert rc == 0
    result, _, _ = read_bam(out, BamApiConfig(min_seq_length=0, min_mapq=0))
    assert result.n_reads > 0


def test_bed_without_tsv_pairs_alphabetically(tmp_path):
    from genome_downsampler_tpu.io.bed_tsv import load_amplicons

    bed = tmp_path / "a.bed"
    # deliberately unsorted in file; map sorts by name: b_LEFT, b_RIGHT,
    # c_LEFT, c_RIGHT -> two amplicons
    bed.write_text(
        "ref\t500\t600\tc_LEFT\nref\t0\t100\tb_LEFT\n"
        "ref\t900\t1000\tc_RIGHT\nref\t300\t400\tb_RIGHT\n"
    )
    amps = load_amplicons(bed)
    assert [(a.start, a.end) for a in amps] == [(0, 400), (500, 1000)]
