from .harness import (openloop_campaign, write_summary, method_name,  # noqa: F401
                      TrialRow, SUMMARY_HEADER)
