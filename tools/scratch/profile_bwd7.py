"""Standalone microbench of each production Pallas kernel at the 10K
headline config: select, fold, fine-bwd, attr fwd, attr bwd."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
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
from voge_tpu.ops.pallas_bwd import fine_bwd_compact_pallas
from voge_tpu.ops.pallas_attr import (
    _attr_merge_compact_fwd, _attr_bwd_call, _gather_attr_compact,
    _attr_cc, scatter_back_rows,
)
from voge_tpu.rays import camera_rays
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
P = verts.shape[0]

bin_size, _ = coarse_bin_config((H, W), K, P, None, None)
if P <= 4096:
    bin_size = max(bin_size, 16)
thr_act = float(-np.log(THR + 1e-10))
BH = (H - 1) // bin_size + 1
BW = (W - 1) // bin_size + 1
cc = F._pick_cand_chunk(P)
cc_align = max(cc, F._pick_cand_chunk_bwd(P))
P_pad = F._ceil_to(max(P, cc_align), cc_align)
bh_bw = ((BH + 1) // 2) * ((BW + 1) // 2)
M_max = F._pick_m_max(P_pad, bh_bw, cc, 0)

sig33 = expend_sigma(sigmas_raw)
rays, origins = camera_rays(R_m, T, focal, principal, (H, W))
mus = verts[None] - origins[:, None, :]
isig = 2.0 * sig33[None]

pos_c, bits_c, ids_c, counts_c, ovf, dst = emit_supertile_candidates(
    R_m, T, focal, principal, mus, isig, (H, W), THR, bin_size, M_max,
    return_dst=True,
)
gauss_feat = F._gauss_feature_planes_batched(mus, isig)
if P_pad > P:
    gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
table = jnp.swapaxes(gauss_feat, 1, 2).reshape(P_pad, F.FEAT)
nb = pos_c.shape[0]
table_c = table[pos_c.reshape(-1)].reshape(nb, M_max, F.FEAT)
rays_feat, _R, R_pad = F._rays_features(rays, BH, BW, bin_size, bin_size)
rf_k, _, _ = F._group_supertiles(rays_feat, 1, BH, BW)
rays_t = jnp.swapaxes(rf_k, 1, 2)
csel, cnts = prefix_visit_lists(counts_c, M_max, cc)
print(f"P={P} bin={bin_size} st={nb} cc={cc} P_pad={P_pad} M_max={M_max} "
      f"R_pad={rf_k.shape[1]} backend={jax.default_backend()}")

AGG_OW = 1.0


def do_select(rt):
    sel, raw = fine_select_compact_pallas(
        rt, table_c, bits_c, ids_c, csel, cnts, thr_act, K,
        sub_bins=4, ray_chunk=rf_k.shape[1], cand_chunk=cc,
        per_bin_cand=True, agg_ow=AGG_OW, return_raw=True,
    )
    return sel, raw


sel, raw = jax.jit(do_select)(rays_t)
sel = jax.tree.map(lambda x: jax.device_get(x), sel)
sel = jax.tree.map(jnp.asarray, sel)
sel_idx_k, sel_len_k, sel_act_k, sel_dsd_k, w_k = sel

rng = np.random.RandomState(0)
g_w = jnp.asarray(rng.randn(*w_k.shape).astype(np.float32)) * 1e-3
g_img = jnp.asarray(rng.randn(nb, rf_k.shape[1], 8).astype(np.float32)) * 1e-3
attr_planes = jnp.zeros((1, 8, P_pad))
attr_planes = attr_planes.at[0, :3, :P].set(
    jnp.swapaxes(colors[pos_c[0, :0].shape[0]:, :] if False else colors, 0, 1)[:, :P]
)

sel_lad = tuple(jax.device_get(x) for x in raw)
sel_lad = tuple(jnp.asarray(x) for x in sel_lad)


def do_fold(gw):
    g4 = (None, jnp.zeros_like(gw), jnp.zeros_like(gw), jnp.zeros_like(gw))
    # mirror _rt_fine_kern_c_bwd: fold the weight cotangent
    g5 = (jnp.zeros_like(sel_idx_k), g4[1], g4[2], g4[3], gw)
    return F._fold_weight_cotangent(g5, sel_lad, AGG_OW)


def do_fine_bwd(gl, ga, gd):
    rc_bwd = F._pick_rc_bwd(rf_k.shape[1], K, _attr_cc(M_max))
    ccb = _attr_cc(M_max)
    return fine_bwd_compact_pallas(
        rf_k, table_c, ids_c, pos_c, counts_c,
        sel_idx_k, gl, ga, gd, K=K, B=1, P_pad=P_pad,
        ray_chunk=rc_bwd, cand_chunk=ccb, dst=dst,
    )


def do_attr_fwd(w):
    return _attr_merge_compact_fwd(
        attr_planes, w, sel_idx_k, ids_c, pos_c, counts_c, dst, 1, False
    )[0]


def do_attr_bwd(gi):
    ccb = _attr_cc(M_max)
    cs, ct = prefix_visit_lists(counts_c, M_max, ccb)
    attr_c = _gather_attr_compact(attr_planes, pos_c, 1, P_pad)
    ids_row = jnp.swapaxes(ids_c, 1, 2)
    d_attr_c, d_w = _attr_bwd_call(
        attr_c, ids_row, sel_idx_k, w_k, gi, cs, ct,
        cand_chunk=ccb, per_bin_cand=True, bh_bw=1, interpret=False,
    )
    rows = jnp.swapaxes(d_attr_c, 1, 2).reshape(nb * M_max, 8)
    d_attr = scatter_back_rows(rows, pos_c, counts_c, 1, P_pad, dst)
    return d_attr, d_w


def do_attr_bwd_kern_only(gi):
    ccb = _attr_cc(M_max)
    cs, ct = prefix_visit_lists(counts_c, M_max, ccb)
    attr_c = _gather_attr_compact(attr_planes, pos_c, 1, P_pad)
    ids_row = jnp.swapaxes(ids_c, 1, 2)
    return _attr_bwd_call(
        attr_c, ids_row, sel_idx_k, w_k, gi, cs, ct,
        cand_chunk=ccb, per_bin_cand=True, bh_bw=1, interpret=False,
    )


gl = jnp.asarray(rng.randn(*sel_len_k.shape).astype(np.float32)) * 1e-3

for name, fn, mk in [
    ("select(+fused agg)", do_select,
     lambda i: (rays_t * (1 + 1e-5 * i),)),
    ("fold cotangent", do_fold, lambda i: (g_w * (1 + 1e-5 * i),)),
    ("fine bwd unified", do_fine_bwd,
     lambda i: (gl * (1 + 1e-5 * i), gl * (1 + 2e-5 * i),
                gl * (1 + 3e-5 * i))),
    ("attr fwd", do_attr_fwd, lambda i: (w_k * (1 + 1e-5 * i),)),
    ("attr bwd kern only", do_attr_bwd_kern_only,
     lambda i: (g_img * (1 + 1e-5 * i),)),
    ("attr bwd (+scatter)", do_attr_bwd,
     lambda i: (g_img * (1 + 1e-5 * i),)),
]:
    args_list = [mk(i) for i in range(34)]
    t = measure(jax.jit(fn), args_list, n1=4, n2=28)
    print(f"{name:24s} {t * 1e3:7.2f} ms", flush=True)
