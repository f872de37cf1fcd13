from .ilqr import (ILQRConfig, ILQRStats, Trajectory, optimise, rollout,  # noqa: F401
                   backward_pass, backward_pass_lambda_loop, forward_pass,
                   compute_derivatives, default_alphas, make_phase_fns)
from .ilqr_svr import SVRConfig, make_svr_optimise, dof_importances  # noqa: F401
from .fused import make_fused_optimise, FusedResult  # noqa: F401
from .sampling import (SamplingConfig, make_sampling_optimise,  # noqa: F401
                       GradDescentConfig, make_grad_descent_optimise)
