from genome_downsampler_tpu.parallel.windows import (  # noqa: F401
    windowed_sweep_counts,
    WindowedMcpSolver,
)
