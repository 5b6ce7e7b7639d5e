"""Model families built on the renderer.

  - :mod:`voge_tpu.models.pose`    -- NeMo-style render-and-compare pose
    estimation (the reference's flagship downstream use; cf. the brute-force
    ray-tracing API ``RayTracing.py:97-123`` it exists to serve).
  - :mod:`voge_tpu.models.fitting` -- gradient-based scene fitting (shape /
    color / covariance optimization training steps, single- and multi-chip).
"""

from voge_tpu.models.pose import (
    PoseHypothesisScorer,
    refine_pose,
    pose_matrices,
)
from voge_tpu.models.fitting import ShapeFitter
