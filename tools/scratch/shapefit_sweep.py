"""Sweep bin_size on the ShapeFitting iteration workload (no-coarse)."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.converter.shapes import ico_sphere
from voge_tpu.renderer import (
    get_silhouette, interpolate_attr, render_pipeline, get_overflow_points,
)
from voge_tpu.timing import measure

BINS = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1 else [16, 24, 32])]

v, f = ico_sphere(4)
verts_np, isig, _ = naive_vertices_converter(v, f, percentage=0.5)
verts = jnp.asarray(verts_np)
sigmas = jnp.asarray(isig)
colors = jnp.ones((verts.shape[0], 3)) * 0.5
B = 5
R, T = look_at_view_transform(
    dist=[2.7] * B, elev=list(np.linspace(-10, 30, B)),
    azim=list(np.linspace(-60, 60, B)),
)
focal = jnp.broadcast_to(jnp.asarray([[126.0, 126.0]]), (B, 2))
principal = jnp.broadcast_to(jnp.asarray([[64.0, 64.0]]), (B, 2))
t_sil = jnp.zeros((B, 128, 128))
t_rgb = jnp.ones((B, 128, 128, 3)) * 0.3
print(f"P={verts.shape[0]} backend={jax.default_backend()}")

for bs in BINS:
    def loss_fn(verts, colors, _bs=bs):
        frag = render_pipeline(
            verts, sigmas, R, T, focal, principal, image_size=(128, 128),
            max_assign=25, max_point_per_bin=-1, bin_size=_bs,
        )
        rgb = interpolate_attr(frag, colors)
        sil = get_silhouette(frag)
        return jnp.mean((sil - t_sil) ** 2) + jnp.mean((rgb - t_rgb) ** 2)

    @jax.jit
    def step(verts, colors):
        gv, gc = jax.grad(loss_fn, argnums=(0, 1))(verts, colors)
        return verts - 1.0 * gv, colors - 1.0 * gc

    args = [(verts * (1.0 + 1e-4 * i), colors) for i in range(16)]
    try:
        t = measure(step, args, n1=3, n2=12)
        frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                               image_size=(128, 128), max_assign=25,
                               max_point_per_bin=-1, bin_size=bs)
        print(f"bin_size={bs:3d}  iter {t*1e3:7.2f} ms  overflow={get_overflow_points(frag)}")
    except Exception as e:
        print(f"bin_size={bs:3d}  FAILED: {type(e).__name__}: {str(e)[:160]}")
