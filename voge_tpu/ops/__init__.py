"""Compute core: ray-ellipsoid tracing ops.

  - :mod:`voge_tpu.ops.dense`  -- dense (all rays x all Gaussians) oracle and
    NeMo-style brute-force API (reference ``voge_ray_tracing_ray.cu``,
    ``RayTracing.py:97-123``).
  - :mod:`voge_tpu.ops.coarse` -- tile/bin culling (reference
    ``rasterize_coarse.cu``, ``RayTracing.py:33-73``).
  - :mod:`voge_tpu.ops.fine`   -- binned production ray tracer with analytic
    custom VJP (reference ``ray_trace_voge.cu``).
"""

from voge_tpu.ops.dense import (
    ray_trace_voge_ray,
    find_nearest_k,
    find_farest_k,
)
from voge_tpu.ops.coarse import rasterize_coarse, coarse_bin_config
from voge_tpu.ops.fine import ray_tracing_fine, ray_tracing
