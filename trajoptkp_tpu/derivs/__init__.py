from .fd import (DerivJobs, jobs_from_mask, keypoint_jacobians,  # noqa: F401
                 fd_job_columns, ad_job_columns)
