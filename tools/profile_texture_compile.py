"""Cold-compile cost breakdown of the ExtractTexture workload (256x672,
K=80) — the driver's bench subprocess timed out at 600 s on this config
twice (round-2 BENCH_DETAILS), so this measures where the compile time goes.

Each stage is lowered + compiled via the AOT API with a FRESH compilation
cache, with wall-clock printed per phase.  Run on the TPU attachment:
    python tools/profile_texture_compile.py [K] [stage...]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# fresh cache: measure true cold compiles
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcold")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.converter.shapes import ico_sphere
from voge_tpu.renderer import render_pipeline, to_white_background
from voge_tpu.sampler import sample_features

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
only = set(sys.argv[2:])
print(f"P={n_vert}, 256x672, K={K}, backend={jax.default_backend()}", flush=True)


def render_only(verts, sigmas):
    frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=(256, 672), max_assign=K)
    return frag.vert_weight.sum()


def render_frag(verts, sigmas):
    # full Fragments materialization (unbinned outputs)
    frag = render_pipeline(verts, sigmas, R, T, focal, principal,
                           image_size=(256, 672), max_assign=K)
    return frag.vert_weight, frag.vert_index, frag.vert_hit_length


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


stages = [
    ("render_only", render_only, (verts, sigmas)),
    ("render_frag", render_frag, (verts, sigmas)),
    ("render+sample", render_sample, (verts, sigmas, image)),
    ("full", full, (verts, sigmas, image)),
]
for name, fn, args in stages:
    if only and name not in only:
        continue
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = jax.block_until_ready(compiled(*args))
    t3 = time.time()
    print(f"{name:16s} trace+lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s  "
          f"first-exec {t3-t2:7.1f}s", flush=True)
