"""Stage breakdown of the ExtractTexture workload (256x672, K=80).

Times successively larger prefixes: render only, +sample_features,
+re-render composite (the full bench fn).  Run on the TPU attachment:
    python tools/profile_texture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.converter.shapes import ico_sphere
from voge_tpu.renderer import render_pipeline, to_white_background
from voge_tpu.sampler import sample_features
from voge_tpu.timing import measure

v, f = ico_sphere(5)
verts_np, isig, _ = naive_vertices_converter(v, f, percentage=0.5, max_sig_rate=2)
verts = jnp.asarray(verts_np)
sigmas = jnp.asarray(isig)
n_vert = verts.shape[0]
R, T = look_at_view_transform(dist=3, elev=0.1, azim=0.6, degrees=False)
focal = jnp.asarray([[1800.0, 1800.0]])
principal = jnp.asarray([[336.0, 128.0]])
rng = np.random.RandomState(0)
image = jnp.asarray(rng.uniform(size=(1, 256, 672, 3)).astype(np.float32))
K = int(sys.argv[1]) if len(sys.argv) > 1 else 80
print(f"P={n_vert}, 256x672, K={K}, backend={jax.default_backend()}")


def render_only(verts, sigmas):
    frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=(256, 672), max_assign=K)
    return frag.vert_weight.sum()


def render_sample(verts, sigmas, image):
    frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=(256, 672), max_assign=K)
    feat, wsum = sample_features(frag, image, n_vert=n_vert)
    return feat.sum() + wsum.sum()


def full(verts, sigmas, image):
    frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=(256, 672), max_assign=K)
    feat, wsum = sample_features(frag, image, n_vert=n_vert)
    texture = feat / (1e-8 + wsum[:, None])
    return to_white_background(frag, texture)


for name, fn, args in [
    ("render_only", render_only, (verts, sigmas)),
    ("render+sample", render_sample, (verts, sigmas, image)),
    ("full", full, (verts, sigmas, image)),
]:
    jf = jax.jit(fn)
    t = measure(jf, [
        ((verts * (1.0 + 1e-4 * i),) + args[1:]) for i in range(8)
    ])
    print(f"{name:16s} {t * 1e3:8.2f} ms", flush=True)
