from genome_downsampler_tpu.io.bam import BamReader, read_bam, write_bam  # noqa: F401
from genome_downsampler_tpu.io.bed_tsv import (  # noqa: F401
    Amplicon,
    load_amplicons,
    parse_bed,
    parse_tsv,
)
