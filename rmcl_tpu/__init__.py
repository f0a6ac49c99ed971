"""rmcl_tpu — TPU-native differentiable mesh localization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of uos/rmcl
(reference: /root/reference): 6-DoF robot localization in triangle meshes and
geometric scene graphs.

Two algorithm families (reference README.md:29-77):
  * MICP-L  — mesh-based ICP pose tracking via ray-cast correspondences
              (``rmcl_tpu.micp``)
  * RMCL    — global Monte-Carlo localization from 1-D range likelihoods
              (``rmcl_tpu.mcl``)

Architecture stance (SURVEY.md §7): there is ONE compute backend — flattened
BVH arrays in HBM traversed by a batched ray-cast kernel — instead of the
reference's Embree/OptiX/Vulkan triplication. Sensors are pure ray-generator
functions, metrics are reduction monoids, and the whole MICP iteration and
MCL step are jitted differentiable programs sharded with ``shard_map``.
"""

__version__ = "0.1.0"

from rmcl_tpu.math.se3 import Transform, Quaternion  # noqa: F401
from rmcl_tpu.math.gaussian import Gaussian1D, CrossStatistics  # noqa: F401
