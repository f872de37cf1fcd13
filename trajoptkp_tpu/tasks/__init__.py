from .base import (Task, residuals_at, cost_from_residuals,  # noqa: F401
                   residual_derivatives, cost_derivatives_gn, control_limits)
from .toys import make_acrobot  # noqa: F401
