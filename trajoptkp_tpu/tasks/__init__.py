from .base import (Task, residuals_at, cost_from_residuals,  # noqa: F401
                   residual_derivatives, cost_derivatives_gn, control_limits)
from .toys import (make_acrobot, make_pentabot, make_piston_block,  # noqa: F401
                   make_floating_cube)
from .reaching import make_reaching  # noqa: F401
from .locomotion import make_walker  # noqa: F401
from .pushing import make_pushing, jacobian_ee_init_controls  # noqa: F401
