"""Stage-level breakdown of the headline 10K-Gaussian 256x256 fwd+bwd on TPU.

Times successively larger prefixes of the pipeline so stage costs fall out
as differences. Run: python tools/profile_stages.py [n_gauss]
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
from voge_tpu.renderer import render_pipeline, interpolate_attr, get_silhouette
from voge_tpu.timing import measure

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
IMG = (256, 256)
K = 20

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)
sigmas = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts) + 1) / 3)
R, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[IMG[1] / 2, IMG[0] / 2]])
target = jnp.ones((1,) + IMG + (3,)) * 0.5
P = verts.shape[0]
print(f"P={P} gaussians, image={IMG}, K={K}, backend={jax.default_backend()}")


def frag_only(verts, sigmas, colors):
    frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=IMG, max_assign=K)
    return frag.vert_weight.sum() + frag.vert_hit_length.sum()


def fwd_full(verts, sigmas, colors):
    frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=IMG, max_assign=K)
    img = interpolate_attr(frag, colors)
    sil = get_silhouette(frag)
    return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)


# the relay attachment carries ~±0.5 ms jitter on short runs; 65 in-order
# executions per estimate keeps stage differences meaningful
args_list = [(verts * (1.0 + 1e-5 * i), sigmas, colors) for i in range(70)]

variants = {
    "fwd fragments only": jax.jit(frag_only),
    "fwd full loss": jax.jit(fwd_full),
    "fwd+bwd fragments only": jax.jit(jax.grad(frag_only, argnums=(0, 1))),
    "fwd+bwd full loss": jax.jit(jax.grad(fwd_full, argnums=(0, 1, 2))),
}
results = {}
for name, fn in variants.items():
    t = measure(fn, args_list, n1=5, n2=65)
    results[name] = t * 1e3
    print(f"{name:28s} {t*1e3:8.2f} ms")

print()
print(f"attr+sil fwd cost        : {results['fwd full loss'] - results['fwd fragments only']:8.2f} ms")
print(f"attr+sil fwd+bwd cost    : {results['fwd+bwd full loss'] - results['fwd+bwd fragments only']:8.2f} ms")
print(f"bwd-only fragments       : {results['fwd+bwd fragments only'] - results['fwd fragments only']:8.2f} ms")
print(f"headline fps             : {1e3 / results['fwd+bwd full loss']:8.2f}")
