"""Bin-size sweep for the big-K aux workloads (occlusion K=60, texture
K=80).  Extraction/match work scales ~ pixels x chunks-per-supertile x K;
these configs run 4-16 candidate chunks deep per supertile at the
reference-heuristic bin sizes (16 / 32), so smaller supertiles should cut
the K-pass work proportionally (unlike the 10K/K=20 headline, which is
already ~1 chunk/supertile and measured flat — tools/bin_sweep.py).

Occlusion's user max_point_per_bin (1500, a per-reference-bin capacity
floor) is scaled by bin area when the swept bin differs from the
reference heuristic, keeping the same density cap.

Run: python tools/bin_sweep2.py [occlusion|texture ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.converter.shapes import ico_sphere
from voge_tpu.renderer import (
    render_pipeline, get_silhouette, interpolate_attr,
    precompute_camera_ctx, to_white_background,
)
from voge_tpu.sampler import sample_features
from voge_tpu.timing import measure_stats


def occlusion_case(bin_size):
    c0 = np.array([[0, 0.2, 1], [0, 0.2, 1], [0, 1, 0.2],
                   [0, 1, 0.2], [0, 1, 1], [0, 1, 1]])
    v0, s0, col0 = Cuboid.cuboid_gauss((-0.8, 0.8), (-0.4, 0.4), (-0.6, 0.6),
                                       4000, colors=c0, percentage=0.7)
    c1 = np.array([[1, 0.2, 0], [1, 0.2, 0], [1, 1, 0],
                   [1, 1, 0], [0.2, 1, 0], [0.2, 1, 0]])
    v1, s1, col1 = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-0.3, 0.3),
                                       3000, colors=c1, percentage=0.7)
    verts = jnp.asarray(np.concatenate([v0 + [[0.5, 0, 1]], v1], 0))
    sigmas = jnp.asarray(np.concatenate([s0, s1], 0))
    colors = jnp.asarray(np.concatenate([col0, col1], 0))
    R, T = look_at_view_transform(dist=5, elev=10, azim=20)
    focal = np.asarray([[300.0, 300.0]], np.float32)
    principal = np.asarray([[200.0, 200.0]], np.float32)
    target = jax.device_put(np.full((1, 400, 400, 3), 0.5, np.float32))
    mppb = 1500
    if bin_size is not None:
        mppb = max(64, int(1500 * (bin_size / 16) ** 2))
    ctx = precompute_camera_ctx(
        R, T, focal, principal, (400, 400), int(verts.shape[0]),
        max_assign=60, max_point_per_bin=mppb, bin_size=bin_size,
    )

    def loss_fn(verts, sigmas, colors, ctx, target):
        frag = render_pipeline(
            verts, sigmas, R, T, focal, principal, image_size=(400, 400),
            max_assign=60, max_point_per_bin=mppb, bin_size=bin_size,
            cam_ctx=ctx,
        )
        img = interpolate_attr(frag, colors)
        sil = get_silhouette(frag)
        return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)

    fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    args_fn = lambda i: (verts * (1.0 + 1e-4 * i), sigmas, colors, ctx,
                         target)
    return fn, args_fn


def texture_case(bin_size):
    v, f = ico_sphere(5)
    verts_np, isig, _ = naive_vertices_converter(v, f, percentage=0.5,
                                                 max_sig_rate=2)
    verts = jnp.asarray(verts_np)
    sigmas = jnp.asarray(isig)
    n_vert = int(verts.shape[0])
    R, T = look_at_view_transform(dist=3, elev=0.1, azim=0.6, degrees=False)
    focal = np.asarray([[1800.0, 1800.0]], np.float32)
    principal = np.asarray([[336.0, 128.0]], np.float32)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.uniform(size=(1, 256, 672, 3)).astype(np.float32))
    ctx = precompute_camera_ctx(
        R, T, focal, principal, (256, 672), n_vert, max_assign=80,
        bin_size=bin_size,
    )

    def extract_and_rerender(verts, sigmas, image, ctx):
        frag = render_pipeline(
            verts, sigmas, R, T, focal, principal, image_size=(256, 672),
            max_assign=80, bin_size=bin_size, cam_ctx=ctx,
        )
        feat, wsum = sample_features(frag, image, n_vert=n_vert)
        texture = feat / (1e-8 + wsum[:, None])
        return to_white_background(frag, texture)

    fn = jax.jit(extract_and_rerender)
    args_fn = lambda i: (verts * (1.0 + 1e-4 * i), sigmas, image, ctx)
    return fn, args_fn


CASES = {"occlusion": occlusion_case, "texture": texture_case}

only = sys.argv[1:] or list(CASES)
for name in only:
    for bs in [None, 12, 8]:
        try:
            fn, args_fn = CASES[name](bs)
            st = measure_stats(fn, args_fn=args_fn, n1=3, n2=12, attempts=3)
            print(f"{name} bin={bs}: {st['median']*1e3:8.2f} ms "
                  f"(spread {st['spread']*100:.0f}%)", flush=True)
        except Exception as e:
            print(f"{name} bin={bs}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
