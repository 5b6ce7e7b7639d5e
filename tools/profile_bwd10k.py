"""Decompose the 10K/256^2 fwd+bwd step: which backward component costs
what, and what the coarse emission's substages cost.  Run on TPU.

Distinct inputs per execution (>= n1+n2+1) so the relay result cache
cannot deflate estimates (voge_tpu/timing.py).
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
from voge_tpu.renderer import (
    render_pipeline, interpolate_attr, get_silhouette, precompute_camera_ctx,
)
from voge_tpu.ops import fine as F
from voge_tpu.ops.coarse import (
    emit_supertile_candidates, _camera_planes, _pixel_radii_planes,
)
from voge_tpu.aggregation import expend_sigma
from voge_tpu.timing import measure_stats

H = W = 256
K = 20
N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
N1, N2 = 5, 45
N_ARGS = N1 + N2 + 1

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)
sigmas = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts) + 1) / 3)
R_m, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[W / 2, H / 2]])
target = jnp.ones((1, H, W, 3)) * 0.5
P = int(verts.shape[0])
cam_ctx = precompute_camera_ctx(R_m, T, focal, principal, (H, W), P, max_assign=K)
print(f"P={P} backend={jax.default_backend()}", flush=True)

kw = dict(image_size=(H, W), max_assign=K, cam_ctx=cam_ctx)
bs, mppb = F.production_bin_geometry((H, W), K, P, None, None)
BH = (H - 1) // bs + 1
BW = (W - 1) // bs + 1
cc = F._pick_cand_chunk(P)
cc_align = max(cc, F._pick_cand_chunk_bwd(P))
P_pad = F._ceil_to(max(P, cc_align), cc_align)
bh_bw = ((BH + 1) // 2) * ((BW + 1) // 2)
M_max = F._pick_m_max(P_pad, bh_bw, cc, 0)
sig33 = expend_sigma(sigmas)[None]
print(f"bs={bs} BH={BH} BW={BW} M_max={M_max} P_pad={P_pad}", flush=True)


# ---- coarse substages -----------------------------------------------------

def _prep(v):
    mus = v[None] - cam_ctx.origins[:, None, :]
    return mus, 2.0 * sig33


def coarse_windows(v):
    """Just the per-Gaussian window/bits math (no sort)."""
    mus, isig = _prep(v)
    u, vv, z = _camera_planes(R_m, T, focal, principal, mus)
    rx, ry = _pixel_radii_planes(R_m, focal, isig, 0.01, z)
    return [u.sum(), vv.sum(), rx.sum(), ry.sum()]


def coarse_nodst(v):
    mus, isig = _prep(v)
    out = emit_supertile_candidates(
        R_m, T, focal, principal, mus, isig, (H, W), 0.01, bs, M_max,
        return_dst=False)
    return [out[0].sum(), out[2].sum(), out[3].sum()]


def coarse_dst(v):
    mus, isig = _prep(v)
    out = emit_supertile_candidates(
        R_m, T, focal, principal, mus, isig, (H, W), 0.01, bs, M_max,
        return_dst=True)
    return [out[0].sum(), out[2].sum(), out[3].sum()]


# ---- backward components ----------------------------------------------------

def frag_of(v, s):
    return render_pipeline(v, s, R_m, T, focal, principal, **kw)


def loss_w(v, s):        # fine bwd only (weights sum; no attr kernels)
    return frag_of(v, s).vert_weight.sum()


def loss_sil(v, s):      # silhouette path only
    return jnp.mean(get_silhouette(frag_of(v, s)) ** 2)


def loss_img(v, s, c):   # attr compositing + fine bwd
    img = interpolate_attr(frag_of(v, s), c)
    return jnp.mean((img - target) ** 2)


def loss_full(v, s, c):
    frag = frag_of(v, s)
    img = interpolate_attr(frag, c)
    sil = get_silhouette(frag)
    return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)


al1 = lambda i: (verts * (1 + 1e-5 * i),)
al2 = lambda i: (verts * (1 + 1e-5 * i), sigmas)
al3 = lambda i: (verts * (1 + 1e-5 * i), sigmas, colors)

rows = [
    ("coarse: windows only", jax.jit(coarse_windows), al1),
    ("coarse: emit no dst", jax.jit(coarse_nodst), al1),
    ("coarse: emit + dst", jax.jit(coarse_dst), al1),
    ("grad(sum w) fine bwd", jax.jit(jax.grad(loss_w, argnums=(0, 1))), al2),
    ("grad(sil loss)", jax.jit(jax.grad(loss_sil, argnums=(0, 1))), al2),
    ("grad(img loss)", jax.jit(jax.grad(loss_img, argnums=(0, 1, 2))), al3),
    ("grad(full loss)", jax.jit(jax.grad(loss_full, argnums=(0, 1, 2))), al3),
]

for name, fn, al in rows:
    st = measure_stats(fn, args_fn=al, n1=N1, n2=N2)
    print(f"{name:24s} {st['median']*1e3:7.2f} ms  "
          f"(spread {st['spread']*100:.0f}% of "
          f"{[round(e*1e3,2) for e in st['estimates']]})", flush=True)
