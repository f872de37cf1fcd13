from .model import Model, Data, make_data  # noqa: F401
from .mjcf import load_mjcf, load_mjcf_string, from_mj  # noqa: F401
from .step import step, forward, step_state  # noqa: F401
from .fk import forward_kinematics, body_jacobian  # noqa: F401
from .integrate import integrate_pos, differentiate_pos  # noqa: F401
