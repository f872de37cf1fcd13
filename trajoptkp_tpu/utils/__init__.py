from . import math  # noqa: F401
from .checkpoint import save_trajectory, load_trajectory  # noqa: F401
from .profiling import trace, phase_banner, Timer  # noqa: F401
