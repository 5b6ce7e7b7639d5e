"""Prefix timing of the PRODUCTION (emission-compacted, fused-compositing)
pipeline at the headline bench configs — stage costs fall out as
differences between successively longer jitted prefixes.

Run: python tools/profile_prefix.py [n_gauss]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.aggregation import expend_sigma
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.ops import fine as F
from voge_tpu.ops.coarse import coarse_bin_config, emit_supertile_candidates
from voge_tpu.ops.pallas_fine2 import (
    fine_select_compact_pallas, prefix_visit_lists,
)
from voge_tpu.rays import camera_rays
from voge_tpu.renderer import render_pipeline, interpolate_attr, get_silhouette
from voge_tpu.timing import measure

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
H = W = 256
K = 20
THR = 0.01

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6,
                        as_obj=True)
verts = jnp.asarray(g.verts)
sigmas_raw = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts) + 1) / 3)
R_m, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[W / 2, H / 2]])
target = jnp.ones((1, H, W, 3)) * 0.5
P = verts.shape[0]

# mirror ray_tracing's production dispatch (fine.py): bin geometry
bin_size, _ = coarse_bin_config((H, W), K, P, None, None)
if P <= 4096:
    bin_size = max(bin_size, 16)
thr_act = float(-np.log(THR + 1e-10))
BH = (H - 1) // bin_size + 1
BW = (W - 1) // bin_size + 1
bh_bw = ((BH + 1) // 2) * ((BW + 1) // 2)
cc = F._pick_cand_chunk(P)
cc_align = max(cc, F._pick_cand_chunk_bwd(P))
P_pad = F._ceil_to(max(P, cc_align), cc_align)
M_max = F._pick_m_max(P_pad, bh_bw, cc, 0)
print(f"P={P} bin={bin_size} grid={BH}x{BW} st={bh_bw} cc={cc} "
      f"P_pad={P_pad} M_max={M_max} backend={jax.default_backend()}")


def _prep(v, s):
    sig33 = expend_sigma(s)
    rays, origins = camera_rays(R_m, T, focal, principal, (H, W))
    mus = v[None] - origins[:, None, :]
    isig = 2.0 * sig33[None]
    return mus, isig, rays


def p0_coarse(v, s):
    mus, isig, rays = _prep(v, s)
    pos_c, bits_c, ids_c, counts_c, _ = emit_supertile_candidates(
        R_m, T, focal, principal, mus, isig, (H, W), THR, bin_size, M_max)
    return pos_c.sum() + counts_c.sum()


def p1_table(v, s):
    mus, isig, rays = _prep(v, s)
    pos_c, bits_c, ids_c, counts_c, _ = emit_supertile_candidates(
        R_m, T, focal, principal, mus, isig, (H, W), THR, bin_size, M_max)
    gauss_feat = F._gauss_feature_planes_batched(mus, isig)
    if P_pad > P:
        gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
    table = jnp.swapaxes(gauss_feat, 1, 2).reshape(P_pad, F.FEAT)
    nb = pos_c.shape[0]
    table_c = table[pos_c.reshape(-1)].reshape(nb, M_max, F.FEAT)
    return table_c.sum()


def p2_rays(v, s):
    mus, isig, rays = _prep(v, s)
    rays_feat, _R, _Rp = F._rays_features(rays, BH, BW, bin_size, bin_size)
    rf_k, _, _ = F._group_supertiles(rays_feat, 1, BH, BW)
    return jnp.swapaxes(rf_k, 1, 2).sum()


def p3_select(v, s):
    """coarse + table + rays + raw select kernel (fused compositing),
    NO output swap."""
    mus, isig, rays = _prep(v, s)
    pos_c, bits_c, ids_c, counts_c, _ = emit_supertile_candidates(
        R_m, T, focal, principal, mus, isig, (H, W), THR, bin_size, M_max)
    gauss_feat = F._gauss_feature_planes_batched(mus, isig)
    if P_pad > P:
        gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
    table = jnp.swapaxes(gauss_feat, 1, 2).reshape(P_pad, F.FEAT)
    nb = pos_c.shape[0]
    table_c = table[pos_c.reshape(-1)].reshape(nb, M_max, F.FEAT)
    rays_feat, _R, _Rp = F._rays_features(rays, BH, BW, bin_size, bin_size)
    rf_k, _, _ = F._group_supertiles(rays_feat, 1, BH, BW)
    rays_t = jnp.swapaxes(rf_k, 1, 2)
    csel, cnts = prefix_visit_lists(counts_c, M_max, cc)
    (sel, raw) = fine_select_compact_pallas(
        rays_t, table_c, bits_c, ids_c, csel, cnts, thr_act, K,
        sub_bins=4, ray_chunk=rf_k.shape[1], cand_chunk=cc,
        per_bin_cand=True, agg_ow=1.0, return_raw=True,
    )
    return sum(x[0, 0, :8].sum() for x in raw)


def p4_frag(v, s):
    frag = render_pipeline(v, s, R_m, T, focal, principal,
                           image_size=(H, W), max_assign=K)
    return frag.vert_weight.sum() + frag.vert_hit_length.sum()


def p5_loss(v, s, c):
    frag = render_pipeline(v, s, R_m, T, focal, principal,
                           image_size=(H, W), max_assign=K)
    img = interpolate_attr(frag, c)
    sil = get_silhouette(frag)
    return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)


def p6_grad(v, s, c):
    return jax.grad(p5_loss, argnums=(0, 1, 2))(v, s, c)


def p4g_gradfrag(v, s):
    """fine bwd chain only (weight+len cotangents; no attr kernels)."""
    return jax.grad(p4_frag, argnums=(0, 1))(v, s)


def p5w_imgloss(v, s, c):
    frag = render_pipeline(v, s, R_m, T, focal, principal,
                           image_size=(H, W), max_assign=K)
    img = interpolate_attr(frag, c)
    return jnp.mean((img - target) ** 2)


def p5wg_gradimg(v, s, c):
    """fine bwd + attr bwd, no silhouette branch."""
    return jax.grad(p5w_imgloss, argnums=(0, 1, 2))(v, s, c)


al2 = [(verts * (1 + 1e-5 * i), sigmas_raw) for i in range(34)]
al3 = [(verts * (1 + 1e-5 * i), sigmas_raw, colors) for i in range(34)]

rows = []
for name, fn, al in [
    ("coarse emit", p0_coarse, al2),
    ("+ feature table gather", p1_table, al2),
    ("ray features alone", p2_rays, al2),
    ("coarse+table+rays+select", p3_select, al2),
    ("fragments fwd (pipeline)", p4_frag, al2),
    ("fwd full loss", p5_loss, al3),
    ("fwd+bwd frag-sum (no attr)", p4g_gradfrag, al2),
    ("fwd+bwd img loss (no sil)", p5wg_gradimg, al3),
    ("fwd+bwd full loss", p6_grad, al3),
]:
    t = measure(jax.jit(fn), al, n1=4, n2=28)
    rows.append((name, t * 1e3))
    print(f"{name:28s} {t * 1e3:7.2f} ms", flush=True)
