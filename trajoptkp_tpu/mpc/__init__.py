from .sync import make_sync_mpc, MPCRunResult, gravity_compensation_ctrl  # noqa: F401
from .async_mpc import AsyncMPC, ControlBuffer  # noqa: F401
