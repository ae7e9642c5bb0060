from genome_downsampler_tpu.testing.reads_gen import (  # noqa: F401
    rand_reads,
    rand_reads_uniform,
)
from genome_downsampler_tpu.testing.fixtures import small_example_batch  # noqa: F401
