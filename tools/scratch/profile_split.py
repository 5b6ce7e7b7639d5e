"""Profile the fwd+bwd cost split at 10K Gaussians on the attached TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import render_pipeline, interpolate_attr, get_silhouette
from voge_tpu.timing import measure

image_size = (256, 256)
g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 10000, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)
sigmas = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts) + 1) / 3)
R, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[128.0, 128.0]])
target = jnp.ones((1, 256, 256, 3)) * 0.5

def frag_fn(verts, sigmas):
    return render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=image_size, max_assign=20)

def loss_full(verts, sigmas, colors):
    frag = frag_fn(verts, sigmas)
    img = interpolate_attr(frag, colors)
    sil = get_silhouette(frag)
    return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)

def loss_sil(verts, sigmas):
    frag = frag_fn(verts, sigmas)
    sil = get_silhouette(frag)
    return jnp.mean(sil ** 2) + jnp.mean(frag.vert_weight ** 2)

variants = {
    "fwd_only": jax.jit(lambda v, s, c: frag_fn(v, s).vert_weight.sum()),
    "fwdbwd_sil_only": jax.jit(lambda v, s, c: jax.grad(loss_sil, (0, 1))(v, s)[0]),
    "fwdbwd_full": jax.jit(jax.grad(loss_full, (0, 1, 2))),
    "fwd_full_loss": jax.jit(loss_full),
}

# also: interpolate alone on fixed fragments
frag0 = jax.jit(frag_fn)(verts, sigmas)
frag0 = jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, frag0)

def interp_loss(colors):
    img = interpolate_attr(frag0, colors)
    return jnp.mean((img - target) ** 2)

variants["interp_fwdbwd_alone"] = jax.jit(lambda v, s, c: jax.grad(interp_loss)(c))

for name, fn in variants.items():
    args_list = [(verts * (1 + 1e-4 * i), sigmas, colors) for i in range(8)]
    t = measure(fn, args_list, n1=3, n2=13)
    print(f"{name:24s} {t*1000:8.2f} ms")
