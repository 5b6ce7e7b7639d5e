"""Sweep bin_size on the 1K and 10K headline workloads (fwd+bwd full loss)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import render_pipeline, interpolate_attr, get_silhouette
from voge_tpu.timing import measure

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
IMG = (256, 256)
K = 20
BINS = [int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2 else [10, 16, 32])]

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)
sigmas = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts) + 1) / 3)
R, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[IMG[1] / 2, IMG[0] / 2]])
target = jnp.ones((1,) + IMG + (3,)) * 0.5
print(f"P={verts.shape[0]} image={IMG} K={K} backend={jax.default_backend()}")

for bs in BINS:
    def loss_fn(verts, sigmas, colors, _bs=bs):
        frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                               image_size=IMG, max_assign=K, bin_size=_bs)
        img = interpolate_attr(frag, colors)
        sil = get_silhouette(frag)
        return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)

    fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    args = [(verts * (1.0 + 1e-5 * i), sigmas, colors) for i in range(40)]
    try:
        t = measure(fn, args, n1=5, n2=35)
        print(f"bin_size={bs:3d}  fwd+bwd {t*1e3:7.2f} ms   {1/t:7.1f} fps")
    except Exception as e:
        print(f"bin_size={bs:3d}  FAILED: {type(e).__name__}: {str(e)[:200]}")
