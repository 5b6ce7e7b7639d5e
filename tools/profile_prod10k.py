"""Stage-level timing of the PRODUCTION 10K/256^2 step (the emission-
compacted path render_pipeline actually takes at this config), with the
camera-static ctx the bench uses.  Run on the TPU attachment."""
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
from voge_tpu.ops.coarse import emit_supertile_candidates
from voge_tpu.aggregation import expend_sigma
from voge_tpu.timing import measure

H = W = 256
K = 20
N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

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
sig33 = expend_sigma(sigmas)[None]


def coarse_only(v):
    mus = v[None] - cam_ctx.origins[:, None, :]
    isig = 2.0 * sig33
    cc = F._pick_cand_chunk(P)
    cc_align = max(cc, F._pick_cand_chunk_bwd(P))
    P_pad = F._ceil_to(max(P, cc_align), cc_align)
    BH = (H - 1) // bs + 1
    BW = (W - 1) // bs + 1
    bh_bw = ((BH + 1) // 2) * ((BW + 1) // 2)
    M_max = F._pick_m_max(P_pad, bh_bw, cc, 0)
    out = emit_supertile_candidates(
        R_m, T, focal, principal, mus, isig, (H, W), 0.01, bs, M_max,
        return_dst=True)
    return [out[0].sum(), out[2].sum(), out[3].sum()]


def fwd_only(v, s):
    frag = render_pipeline(v, s, R_m, T, focal, principal, **kw)
    return frag.vert_weight.sum()


def loss_fn(v, s, c, cam_grad=True):
    frag = render_pipeline(v, s, R_m, T, focal, principal,
                           camera_grad=cam_grad, **kw)
    img = interpolate_attr(frag, c)
    sil = get_silhouette(frag)
    return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)


fwdbwd = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
fwdbwd_nocam = jax.jit(jax.grad(
    lambda v, s, c: loss_fn(v, s, c, cam_grad=False), argnums=(0, 1, 2)))

al1 = [(verts * (1 + 1e-5 * i),) for i in range(14)]
al2 = [(verts * (1 + 1e-5 * i), sigmas) for i in range(14)]
al3 = [(verts * (1 + 1e-5 * i), sigmas, colors) for i in range(14)]

for name, fn, al in [
    ("coarse emit only", jax.jit(coarse_only), al1),
    ("full fwd (frag)", jax.jit(fwd_only), al2),
    ("fwd+bwd (bench loss)", fwdbwd, al3),
    ("fwd+bwd camera_grad=F", fwdbwd_nocam, al3),
]:
    t = measure(fn, al, n1=3, n2=13)
    print(f"{name:24s} {t*1e3:7.2f} ms", flush=True)
