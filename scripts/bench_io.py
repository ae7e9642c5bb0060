"""Host BAM I/O throughput (SURVEY.md section 7 hard part 5).

Synthesizes a BAM with the pure-python test writer (slow, excluded from
timing), then measures the native reader (BGZF batch-parallel inflate +
record parse + QNAME pairing) and the re-stream writer at several thread
counts.

Usage: timeout 900 python -u scripts/bench_io.py [pairs_millions]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np

from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.io.bam import read_bam, write_bam
from genome_downsampler_tpu.testing.bam_writer import write_test_bam
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def main():
    pairs = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(12345)
    batch = rand_reads_uniform(rng, pairs, 30_000, 150)
    tmp = Path(tempfile.mkdtemp())
    path = tmp / "in.bam"
    t0 = time.perf_counter()
    write_test_bam(path, batch, coordinate_sorted=True, make_index=True)
    size_mb = path.stat().st_size / 1e6
    print(
        f"synth {batch.n_reads} records -> {size_mb:.0f} MB "
        f"({time.perf_counter()-t0:.0f}s, python writer, untimed path)",
        flush=True,
    )

    for threads in (1, 4, 8):
        cfg = BamApiConfig(min_mapq=0, min_seq_length=0,
                           hts_thread_count=threads)
        t0 = time.perf_counter()
        b, fo, _ = read_bam(path, cfg)
        dt = time.perf_counter() - t0
        print(
            f"read  -@{threads}: {dt:5.1f}s  {b.n_reads/dt/1e6:5.2f}M rec/s "
            f"{size_mb/dt:6.0f} MB/s",
            flush=True,
        )

    sel = np.arange(0, batch.n_reads, 2, dtype=np.int64)  # half the records
    for threads in (1, 4, 8):
        t0 = time.perf_counter()
        wrote = write_bam(path, tmp / "out.bam", sel, threads=threads)
        dt = time.perf_counter() - t0
        print(
            f"write -@{threads}: {dt:5.1f}s  {wrote/dt/1e6:5.2f}M rec/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
