"""Measured workload statistics for the reference's CUDA chain at ALL SIX
BASELINE.md configs — the inputs to the per-config A100 derivations.

For each config this computes, under the REFERENCE's own heuristics
(bin_size = max(2^ceil(log2 maxHW - 5), 10), max_points_per_bin =
min(max(10K, P/10), P) — RayTracing.py:14-19; or the demo's explicit
settings), the per-bin candidate counts its fine kernel would walk (one
thread per pixel, ray_trace_voge.cu:155-215), using our coarse stage
(exact-parity vs the NDC oracle) to reproduce its binning; plus the
eager-torch aggregation traffic ([B,H,W,K,K] f32, Aggregation.py:30-141)
that dominates the reference's step time.

The derived per-config A100 estimates printed at the end are the
vs_baseline denominators in bench.py — BASELINE.md "Derived per-workload
A100 baselines" records the formula:

  agg_ms   = B * H*W*K^2*4 bytes * passes / (0.8 * 2039 GB/s)
             (passes ~= 29 fwd+bwd / 12 fwd-only — BASELINE.md)
  fine_fwd = visits / 3.0M * 0.35 ms      (headline-calibrated serial walk)
  fine_bwd = B * H*W*K / 1.31M * 0.55 ms  (atomic-heavy slot backward)
  launch   = 0.55 ms / step (eager-op chain; per VIEW when the demo loops
             views sequentially, e.g. ShapeFitting.py:268-290)

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
from voge_tpu.ops.coarse import rasterize_coarse

A100_BW = 0.8 * 2039e9        # 80% of A100-80GB-SXM HBM bandwidth
PASSES_FWDBWD = 29            # eager torch aggregation passes (BASELINE.md)
PASSES_FWD = 12


def stats(name, verts, sig33, R, T, focal, principal, H, W, K,
          mppb=None, fwd_only=False, seq_views=1, extra_ms=0.0):
    """Print reference-chain stats + the derived A100 estimate for one
    config.  ``seq_views``: the demo renders that many views SEQUENTIALLY
    per step (multiplies every stage).  ``mppb``: explicit
    max_points_per_bin (None = reference heuristic, -1 = no-coarse: every
    pixel walks all P)."""
    P = int(verts.shape[0])
    B = R.shape[0]
    bin_size = max(int(2 ** math.ceil(math.log2(max(H, W)) - 5)), 10)
    if mppb is None:
        mppb = min(int(max(10 * K, P / 10)), P)

    if mppb == -1:
        visits = H * W * P
        grid_txt = "no-coarse (all points per pixel, RayTracing.py:22-26)"
        max_cnt = P
    else:
        C = camera_centers(R, T)
        mus = (verts[None] - C[:, None, :]).astype(jnp.float32)
        if mus.shape[0] != B:
            mus = jnp.broadcast_to(mus, (B,) + mus.shape[1:])
        isig = (2.0 * sig33[None]).astype(jnp.float32)
        isig = jnp.broadcast_to(isig, (B, P, 3, 3))
        _, counts = rasterize_coarse(
            R, T, focal, principal, mus, isig, (H, W), 0.01, bin_size,
            min(mppb, P), return_counts=True,
        )
        counts = np.asarray(counts)
        # truncation at mppb is what the reference kernel would walk
        counts = np.minimum(counts, mppb)
        visits = int(counts.sum()) * bin_size * bin_size // B
        max_cnt = int(counts.max())
        grid_txt = (f"bin_size={bin_size} grid={counts.shape[1]}x"
                    f"{counts.shape[2]} mppb={mppb} "
                    f"max_bin_count={max_cnt}")

    kk_bytes = H * W * K * K * 4
    passes = PASSES_FWD if fwd_only else PASSES_FWDBWD
    agg_ms = B * kk_bytes * passes / A100_BW * 1e3
    fine_fwd_ms = B * visits / 3.0e6 * 0.35
    fine_bwd_ms = 0.0 if fwd_only else B * H * W * K / 1.31e6 * 0.55
    launch_ms = 0.55
    total = (agg_ms + fine_fwd_ms + fine_bwd_ms + launch_ms + extra_ms) \
        * seq_views

    print(f"== {name}: P={P} B={B} {H}x{W} K={K} "
          f"{'fwd' if fwd_only else 'fwd+bwd'}"
          f"{' x%d seq views' % seq_views if seq_views > 1 else ''}")
    print(f"   {grid_txt}")
    print(f"   candidate visits/view: {visits / 1e6:.1f}M; "
          f"agg tensor {B * kk_bytes / 1e6:.0f} MB x {passes} passes")
    print(f"   A100 est: agg {agg_ms:.2f} + fine_fwd {fine_fwd_ms:.2f} + "
          f"fine_bwd {fine_bwd_ms:.2f} + launch {launch_ms:.2f}"
          f"{' + extra %.2f' % extra_ms if extra_ms else ''}"
          f" = {total:.2f} ms/step  ({1e3 / total:.0f} fps)")
    return total


def cuboid_scene(n):
    g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), n,
                            percentage=0.6, as_obj=True)
    return jnp.asarray(g.verts), expend_sigma(jnp.asarray(g.sigmas))


def main():
    out = {}

    # headline family: cuboid quickstart at 1K / 10K (bench build_fwdbwd)
    for tag, n in (("cuboid_1k", 1000), ("cuboid_10k", 10000)):
        verts, sig33 = cuboid_scene(n)
        R, T = look_at_view_transform(dist=6, elev=10, azim=70)
        out[tag] = stats(
            tag, verts, sig33, R, T, jnp.asarray([[300.0, 300.0]]),
            jnp.asarray([[128.0, 128.0]]), 256, 256, 20,
        )

    # pointcloud 100K fwd (bench build_fwd_pointcloud)
    from voge_tpu.converter.converters import fixed_pointcloud_converter

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(100000, 3)).astype(np.float32)
    v, isg, _ = fixed_pointcloud_converter(pts, radius=0.01)
    # fixed_pointcloud returns inverse sigmas; the coarse stage wants sigma
    sig33 = expend_sigma(jnp.asarray(1.0 / np.asarray(isg)))
    R, T = look_at_view_transform(dist=4, elev=20, azim=30)
    out["pointcloud_100k"] = stats(
        "pointcloud_100k", jnp.asarray(v), sig33, R, T,
        jnp.asarray([[400.0, 400.0]]), jnp.asarray([[160.0, 160.0]]),
        320, 320, 20, fwd_only=True,
    )

    # occlusion: two cuboids ~7K, 400^2, K=60, mppb=1500 (ReasonOcclusion)
    c0 = Cuboid.cuboid_gauss((-0.8, 0.8), (-0.4, 0.4), (-0.6, 0.6), 4000,
                             percentage=0.7)
    c1 = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-0.3, 0.3), 3000,
                             percentage=0.7)
    verts = jnp.asarray(
        np.concatenate([np.asarray(c0[0]) + [[0.5, 0, 1]], c1[0]], 0)
    )
    sig33 = expend_sigma(jnp.asarray(np.concatenate([c0[1], c1[1]], 0)))
    R, T = look_at_view_transform(dist=5, elev=10, azim=20)
    out["occlusion"] = stats(
        "occlusion", verts, sig33, R, T, jnp.asarray([[300.0, 300.0]]),
        jnp.asarray([[200.0, 200.0]]), 400, 400, 60, mppb=1500,
    )

    # texture: ico_sphere(5) Gaussians, 256x672, K=80, fwd render +
    # sample_features + re-render (ExtractTexture).  extra_ms: the second
    # (textured) forward render repeats agg fwd + fine fwd; the CUDA
    # sampler scatter (sample_voge.cu:35-66) is atomics over (pixel, K)
    # slots ~ fine_bwd-shaped.
    from voge_tpu.converter.converters import naive_vertices_converter
    from voge_tpu.converter.shapes import ico_sphere

    v, f = ico_sphere(5)
    verts_np, isg, _ = naive_vertices_converter(v, f, percentage=0.5,
                                                max_sig_rate=2)
    sig33 = expend_sigma(jnp.asarray(1.0 / np.asarray(isg)))
    R, T = look_at_view_transform(dist=3, elev=0.1, azim=0.6, degrees=False)
    H, W, K = 256, 672, 80
    kk = H * W * K * K * 4
    rerender_ms = (kk * PASSES_FWD / A100_BW * 1e3)  # second fwd agg
    sampler_ms = H * W * K / 1.31e6 * 0.55           # atomic scatter
    out["texture"] = stats(
        "texture", jnp.asarray(verts_np), sig33, R, T,
        jnp.asarray([[1800.0, 1800.0]]), jnp.asarray([[336.0, 128.0]]),
        H, W, K, fwd_only=True, extra_ms=rerender_ms + sampler_ms,
    )

    # shapefit: ico_sphere(4), 128^2, K=25, no-coarse, 5 views rendered
    # SEQUENTIALLY per iteration (ShapeFitting.py:268-290)
    v, f = ico_sphere(4)
    verts_np, isg, _ = naive_vertices_converter(v, f, percentage=0.5)
    sig33 = expend_sigma(jnp.asarray(1.0 / np.asarray(isg)))
    R, T = look_at_view_transform(dist=2.7, elev=0, azim=0)
    out["shapefit"] = stats(
        "shapefit", jnp.asarray(verts_np), sig33, R, T,
        jnp.asarray([[126.0, 126.0]]), jnp.asarray([[64.0, 64.0]]),
        128, 128, 25, mppb=-1, seq_views=5,
    )

    print("\nA100_MS = " + repr({k: round(ms, 2) for k, ms in out.items()}))


if __name__ == "__main__":
    main()
