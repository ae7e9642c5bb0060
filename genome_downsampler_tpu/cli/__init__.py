from genome_downsampler_tpu.cli.main import main  # noqa: F401
