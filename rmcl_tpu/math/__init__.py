from rmcl_tpu.math.se3 import Transform, Quaternion, EulerAngles  # noqa: F401
from rmcl_tpu.math.gaussian import Gaussian1D, CrossStatistics  # noqa: F401
from rmcl_tpu.math.stats import (  # noqa: F401
    umeyama_transform,
    markley_mean,
    pose_covariance_6x6,
    sample_pose_gaussian,
)
