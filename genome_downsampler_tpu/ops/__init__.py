from genome_downsampler_tpu.ops.coverage import (  # noqa: F401
    coverage_from_intervals,
    capped_coverage,
    demand_from_capped,
    coverage_is_valid,
)
