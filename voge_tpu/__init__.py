"""VoGE-TPU: a TPU-native differentiable volume renderer using Gaussian ellipsoids.

A from-scratch JAX/XLA/Pallas framework with the capabilities of VoGE
(Angtian/VoGE, ICLR 2023, arXiv 2205.15401): scenes represented as sets of
anisotropic 3-D Gaussian kernels are rendered by closed-form volume ray
tracing, producing per-pixel ``Fragments`` (kernel indices + occlusion-aware
weights) that can be composited with per-kernel attributes or inversely
sampled to pull image features back onto kernels.  The whole pipeline is
differentiable w.r.t. Gaussian centers, covariances and ray directions.

Layout (TPU-first, not a port):
  - :mod:`voge_tpu.cameras` / :mod:`voge_tpu.rays` -- pinhole camera model and
    ray generation with PyTorch3D-compatible conventions (replaces the
    reference's dependency on pytorch3d cameras/raysamplers).
  - :mod:`voge_tpu.ops` -- the compute core: a dense jnp oracle, a tiled
    production ray tracer with analytic custom VJP, and Pallas kernels.
  - :mod:`voge_tpu.aggregation` -- closed-form erf transmittance compositing.
  - :mod:`voge_tpu.renderer` -- ``GaussianRenderer`` / ``Fragments`` /
    ``GaussianRenderSettings`` API (same surface as VoGE/Renderer.py).
  - :mod:`voge_tpu.sampler` -- inverse rendering (feature sampling).
  - :mod:`voge_tpu.converter` -- mesh/pointcloud -> Gaussians, cuboid
    generator, OFF/COFF/GOFF IO.
  - :mod:`voge_tpu.parallel` -- chunked execution and multi-chip sharding
    (``shard_map`` over camera / Gaussian mesh axes).
"""

__version__ = "0.1.0"

from voge_tpu import utils
from voge_tpu import cameras
from voge_tpu import camera_op as CameraOP
from voge_tpu import rays
from voge_tpu import meshes
from voge_tpu import aggregation
from voge_tpu import ops
from voge_tpu import renderer
from voge_tpu import sampler
from voge_tpu import converter
from voge_tpu import parallel
from voge_tpu import checkpoint
from voge_tpu import timing

from voge_tpu.meshes import GaussianMeshes, GaussianMeshesNaive
from voge_tpu.renderer import (
    CameraCtx,
    Fragments,
    GaussianRenderer,
    GaussianRenderSettings,
    interpolate_attr,
    get_overflow_points,
    get_silhouette,
    precompute_camera_ctx,
    to_colored_background,
    to_white_background,
)
from voge_tpu.sampler import sample_features, scatter_max_weight
