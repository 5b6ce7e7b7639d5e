"""Measured workload statistics for the reference's CUDA chain at the
headline configs — the inputs to BASELINE.md's A100 roofline bound.

Computes, under the REFERENCE's own heuristics (bin_size =
max(2^ceil(log2 maxHW - 5), 10), max_points_per_bin = min(max(10K, P/10),
P) — RayTracing.py:14-19), the per-bin candidate counts its fine kernel
would walk (one thread per pixel, ray_trace_voge.cu:155-215), using our
coarse stage (exact-parity vs the NDC oracle) to reproduce its binning.

Run: JAX_PLATFORMS=cpu python tools/ref_workload_stats.py
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.aggregation import expend_sigma
from voge_tpu.cameras import look_at_view_transform, camera_centers
from voge_tpu.converter import Cuboid
from voge_tpu.ops.coarse import coarse_bin_config, rasterize_coarse
from voge_tpu.rays import camera_rays


def stats(n_gauss, H, W, K):
    g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), n_gauss,
                            percentage=0.6, as_obj=True)
    verts = jnp.asarray(g.verts)
    sig33 = expend_sigma(jnp.asarray(g.sigmas))
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    focal = jnp.asarray([[300.0, 300.0]])
    principal = jnp.asarray([[W / 2, H / 2]])
    P = verts.shape[0]

    bin_size = max(int(2 ** math.ceil(math.log2(max(H, W)) - 5)), 10)
    mppb = min(int(max(10 * K, P / 10)), P)

    C = camera_centers(R, T)
    mus = (verts[None] - C[:, None, :]).astype(jnp.float32)
    isig = (2.0 * sig33[None]).astype(jnp.float32)
    bin_points, counts = rasterize_coarse(
        R, T, focal, principal, mus, isig, (H, W), 0.01, bin_size, mppb,
        return_counts=True,
    )
    counts = np.asarray(counts)[0]
    BH, BW = counts.shape
    pixel_visits = counts.sum() * bin_size * bin_size
    print(f"P={P} {H}x{W} K={K}: bin_size={bin_size} grid={BH}x{BW} "
          f"mppb(heuristic)={mppb}")
    print(f"  bin counts: mean={counts.mean():.1f} max={counts.max()} "
          f"nonzero_bins={(counts > 0).sum()}/{BH * BW}")
    print(f"  candidate visits (pixels x bin count): {pixel_visits / 1e6:.1f}M")
    print(f"  fwd FLOPs @45/visit: {pixel_visits * 45 / 1e9:.2f} GFLOP; "
          f"(pixel,K) bwd slots: {H * W * K / 1e6:.1f}M")
    # torch aggregation traffic: get_cross_activation builds [B,H,W,K,K]
    # f32 (Aggregation.py:30-51), assign2weight runs ~8 elementwise passes
    # over it (exp/erf/mul/sum, :54-79); autograd doubles it.
    kk_bytes = H * W * K * K * 4
    print(f"  aggregation [H,W,K,K] tensor: {kk_bytes / 1e6:.0f} MB; "
          f"fwd+bwd traffic @~20 passes: {kk_bytes * 20 / 1e9:.1f} GB")


if __name__ == "__main__":
    stats(1000, 256, 256, 20)
    stats(10000, 256, 256, 20)
