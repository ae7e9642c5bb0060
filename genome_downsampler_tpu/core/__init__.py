from genome_downsampler_tpu.core.readbatch import ReadBatch  # noqa: F401
