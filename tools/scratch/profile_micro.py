"""Micro-breakdown of the forward fragment path at 10K Gaussians."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import render_pipeline
from voge_tpu.timing import measure
from voge_tpu.aggregation import expend_sigma, aggregation
from voge_tpu.rays import camera_rays
from voge_tpu.ops import fine as F
from voge_tpu.ops.coarse import coarse_bin_config, overlap_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
IMG = (256, 256)
K = 20

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)
sigmas3 = expend_sigma(jnp.asarray(g.sigmas))
R, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[IMG[1] / 2, IMG[0] / 2]])
P = verts.shape[0]
H, W = IMG
import math
thr = 0.01
thr_act = -math.log(thr + 1e-10)
bin_size_cfg, mppb = coarse_bin_config(IMG, K, P, None, None)
print(f"P={P}, bin_size={bin_size_cfg}, backend={jax.default_backend()}")

rays_, origins_ = camera_rays(R, T, focal, principal, IMG)


def stage_sort_mask(verts, sigmas3):
    vt = verts[None] - origins_[:, None, :]
    isg = 2.0 * jnp.broadcast_to(sigmas3[None], (1,) + sigmas3.shape)
    base_ids = jnp.arange(P, dtype=jnp.int32)[None]
    pts, isg2, ids, perm = F._sort_bin_coherent(
        R, T, focal, principal, vt, isg, IMG, bin_size_cfg, base_ids)
    mask = overlap_mask(R, T, focal, principal, pts, isg2, IMG, thr, bin_size_cfg)
    return pts.sum() + mask.sum().astype(jnp.float32) + ids.sum().astype(jnp.float32)


def stage_prep(verts, sigmas3):
    vt = verts[None] - origins_[:, None, :]
    isg = 2.0 * jnp.broadcast_to(sigmas3[None], (1,) + sigmas3.shape)
    base_ids = jnp.arange(P, dtype=jnp.int32)[None]
    pts, isg2, ids, perm = F._sort_bin_coherent(
        R, T, focal, principal, vt, isg, IMG, bin_size_cfg, base_ids)
    mask = overlap_mask(R, T, focal, principal, pts, isg2, IMG, thr, bin_size_cfg)
    prep = F._mask_path_prep(pts, isg2, rays_, mask, ids,
                             (bin_size_cfg, bin_size_cfg))
    return sum(jnp.sum(v).astype(jnp.float32) for k, v in prep.items()
               if isinstance(v, jax.Array))


def stage_select(verts, sigmas3):
    vt = verts[None] - origins_[:, None, :]
    isg = 2.0 * jnp.broadcast_to(sigmas3[None], (1,) + sigmas3.shape)
    base_ids = jnp.arange(P, dtype=jnp.int32)[None]
    pts, isg2, ids, perm = F._sort_bin_coherent(
        R, T, focal, principal, vt, isg, IMG, bin_size_cfg, base_ids)
    mask = overlap_mask(R, T, focal, principal, pts, isg2, IMG, thr, bin_size_cfg)
    prep = F._mask_path_prep(pts, isg2, rays_, mask, ids,
                             (bin_size_cfg, bin_size_cfg))
    sel = F._mask_path_select_kern(prep, thr_act, K)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in sel)


def stage_agg(verts, sigmas3):
    vt = verts[None] - origins_[:, None, :]
    isg = 2.0 * jnp.broadcast_to(sigmas3[None], (1,) + sigmas3.shape)
    base_ids = jnp.arange(P, dtype=jnp.int32)[None]
    pts, isg2, ids, perm = F._sort_bin_coherent(
        R, T, focal, principal, vt, isg, IMG, bin_size_cfg, base_ids)
    mask = overlap_mask(R, T, focal, principal, pts, isg2, IMG, thr, bin_size_cfg)
    prep = F._mask_path_prep(pts, isg2, rays_, mask, ids,
                             (bin_size_cfg, bin_size_cfg))
    sel_idx, sel_len, sel_act, sel_dsd = F._mask_path_select_kern(prep, thr_act, K)
    w = aggregation(sel_idx=sel_idx, sel_act=sel_act, sel_len=sel_len,
                    sel_dsd=sel_dsd)[0]
    return w.sum()


def full_frag(verts, sigmas3):
    frag = render_pipeline(verts, sigmas3, R, T, focal, principal,
                           image_size=IMG, max_assign=K)
    return frag.vert_weight.sum() + frag.vert_hit_length.sum()


args_list = [(verts * (1.0 + 1e-4 * i), sigmas3) for i in range(8)]
prev = 0.0
for name, fn in [
    ("sort+mask", stage_sort_mask),
    ("  +prep shuffles", stage_prep),
    ("  +select kernel", stage_select),
    ("  +aggregation", stage_agg),
    ("full fragments (pipeline)", full_frag),
]:
    t = measure(jax.jit(fn), args_list) * 1e3
    print(f"{name:28s} {t:8.2f} ms   (delta {t - prev:+6.2f})")
    prev = t
