from genome_downsampler_tpu.utils.logging import get_logger, set_verbosity  # noqa: F401
from genome_downsampler_tpu.utils.timer import ScopedTimer, timed  # noqa: F401
