from genome_downsampler_tpu.solvers.base import Solver, Solution  # noqa: F401
from genome_downsampler_tpu.solvers.registry import (  # noqa: F401
    SolverRegistry,
    default_registry,
    DEFAULT_SOLVER_NAME,
)
