from .harness import (openloop_campaign, write_summary, method_name,  # noqa: F401
                      TrialRow, SUMMARY_HEADER)
from .campaigns import (sync_mpc_horizon_sweep, async_mpc_campaign,  # noqa: F401
                        dump_derivatives)
