from .methods import (KeypointConfig, generate_keypoints, set_interval,  # noqa: F401
                      adaptive, velocity_change, jerk_profile, accel_profile,
                      order_of_importance, auto_adjust_mask, desired_percentages,
                      percentage_derivs)
from .interpolate import interpolate_derivatives, prev_next_keypoints  # noqa: F401
