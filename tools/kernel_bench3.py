"""Kernel-level microbench of the PRODUCTION emission-compacted 10K/256^2
pipeline: each component timed alone on prepped inputs, so the fwd/bwd
stage totals from tools/profile_bwd10k.py can be attributed.

Run: python tools/kernel_bench3.py [n_gauss]
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
from voge_tpu.ops.coarse import emit_supertile_candidates
from voge_tpu.ops.pallas_fine import FEAT
from voge_tpu.ops.pallas_fine2 import (
    fine_select_compact_pallas, fold_weights_pallas, prefix_visit_lists,
)
from voge_tpu.ops.pallas_bwd import fine_bwd_compact_pallas
from voge_tpu.ops.pallas_attr import (
    _attr_fwd_call, _attr_bwd_call, _attr_cc, _gather_attr_compact,
    gather_back_rows,
)
from voge_tpu.renderer import precompute_camera_ctx
from voge_tpu.timing import measure_stats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
H = W = 256
K = 20
N1, N2 = 5, 45

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)[None]
sigmas = expend_sigma(jnp.asarray(g.sigmas))[None]
colors = jnp.asarray((np.asarray(g.verts) + 1) / 3)[None]  # (1, P, 3)
R_m, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[W / 2, H / 2]])
B, P = verts.shape[0], verts.shape[1]
cam_ctx = precompute_camera_ctx(R_m, T, focal, principal, (H, W), P, max_assign=K)
mus0 = verts - cam_ctx.origins[:, None, :]
isig = 2.0 * sigmas

bs, _ = F.production_bin_geometry((H, W), K, P, None, None)
BH = (H - 1) // bs + 1
BW = (W - 1) // bs + 1
BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
nst = BH2 * BW2
cc = F._pick_cand_chunk(P)
cc_align = max(cc, F._pick_cand_chunk_bwd(P))
P_pad = F._ceil_to(max(P, cc_align), cc_align)
M_max = F._pick_m_max(P_pad, nst, cc, 0)
thr_act = float(-np.log(0.01 + 1e-10))
print(f"P={P} P_pad={P_pad} M_max={M_max} nst={nst} cc={cc} bs={bs}",
      flush=True)


def _prep(mus):
    out = emit_supertile_candidates(
        R_m, T, focal, principal, mus, isig, (H, W), 0.01, bs, M_max,
        return_dst=True)
    pos_c, bits_c, ids_c, counts_c, overflow_c, dst = out
    gauss_feat = F._gauss_feature_planes_batched(mus, isig)
    gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
    table = jnp.swapaxes(gauss_feat, 1, 2).reshape(B * P_pad, FEAT)
    img_row = jnp.arange(B * nst, dtype=jnp.int32)[:, None] // nst
    table_c = table[(img_row * P_pad + pos_c).reshape(-1)].reshape(
        B * nst, M_max, FEAT)
    return (pos_c, bits_c, ids_c, counts_c, dst, gauss_feat, table_c)

pos_c, bits_c, ids_c, counts_c, dst, gauss_feat, table_c = jax.jit(_prep)(mus0)
rf_k = cam_ctx.rf_k
rays_t = jnp.swapaxes(rf_k, 1, 2)
R_pad = rf_k.shape[1]
csel, cnts = jax.jit(lambda c: prefix_visit_lists(c, M_max, cc))(counts_c)

occ = np.asarray(counts_c)
print(f"R_pad={R_pad} occupancy mean={occ.mean():.0f} max={occ.max()} "
      f"p90={np.percentile(occ, 90):.0f}", flush=True)

# select kernel (with fused aggregation), raw outputs kept
sel_fn = jax.jit(lambda tc: fine_select_compact_pallas(
    rays_t, tc, bits_c, ids_c, csel, cnts, thr_act, K,
    sub_bins=4, ray_chunk=R_pad, cand_chunk=cc, per_bin_cand=True,
    agg_ow=1.0, return_raw=True))
(sel, raw) = sel_fn(table_c)
sel_idx_k = sel[0]
lad_w = tuple(sel[1:5])

# synthetic cotangents in kernel layout
key = jax.random.PRNGKey(0)
nb = B * nst
gl = jax.random.normal(key, (nb, R_pad, K)) * 1e-3
ga = jax.random.normal(key, (nb, R_pad, K)) * 1e-3
gd = jax.random.normal(key, (nb, R_pad, K)) * 1e-3
gw = jax.random.normal(key, (nb, R_pad, K)) * 1e-3

cc_bwd_opts = [c for c in (1024, 512, 256, 128) if M_max % c == 0]
cc_bwd = max(cc_bwd_opts) if cc_bwd_opts else M_max
rc_bwd = F._pick_rc_bwd(R_pad, K, cc_bwd)
print(f"bwd cc={cc_bwd} rc={rc_bwd}", flush=True)


def bwd_fn(tc, mode, use_dst, ccb, kk=None, fold=True):
    if kk is None:
        kk = K
    sl = lambda x: x[:, :, :kk]
    return fine_bwd_compact_pallas(
        rf_k, tc, ids_c, pos_c, counts_c,
        sl(sel_idx_k), sl(gl), sl(ga), sl(gd),
        K=kk, B=B, P_pad=P_pad, ray_chunk=F._pick_rc_bwd(R_pad, kk, ccb),
        cand_chunk=ccb, dst=(dst if use_dst else None),
        fold_in=(tuple(sl(x) for x in lad_w) + (sl(gw),)) if fold else None,
        agg_ow=1.0, mode=mode)


# attribute planes (sorted candidate order == original here: no perm)
Ca = 8
planes = jnp.swapaxes(jnp.pad(colors, ((0, 0), (0, P_pad - P), (0, 0))), 1, 2)
planes = jnp.pad(planes, ((0, 0), (0, Ca - 3), (0, 0)))
w_eff = jnp.where(sel_idx_k >= 0, sel[4], 0.0)
cc_attr = _attr_cc(M_max)
csel_a, cnts_a = jax.jit(
    lambda c: prefix_visit_lists(c, M_max, cc_attr))(counts_c)
attr_c = jax.jit(lambda p: _gather_attr_compact(p, pos_c, B, P_pad))(planes)
ids_row = jnp.swapaxes(ids_c, 1, 2)
g_img = jax.random.normal(key, (nb, R_pad, Ca)) * 1e-3

rows_bwd = jax.random.normal(key, (nb * M_max, FEAT)) * 1e-3


def sel_case(ccs):
    csel_s, cnts_s = jax.jit(
        lambda c: prefix_visit_lists(c, M_max, ccs))(counts_c)
    return jax.jit(lambda tc: fine_select_compact_pallas(
        rays_t, tc, bits_c, ids_c, csel_s, cnts_s, thr_act, K,
        sub_bins=4, ray_chunk=R_pad, cand_chunk=ccs, per_bin_cand=True,
        agg_ow=1.0)[4].sum())


cases = [
    ("select+agg kernel", sel_case(cc),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("select cc=128", sel_case(128),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("select cc=512", sel_case(512),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd kern both cc256", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, 256))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd K=4", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, cc_bwd,
                                               kk=4))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd K=8", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, cc_bwd,
                                               kk=8))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd no-fold", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, cc_bwd,
                                               fold=False))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd nofold+foldT kern", jax.jit(
        lambda tc: (lambda dl, da, dd: sum(x.sum() for x in (
            fine_bwd_compact_pallas(
                rf_k, tc, ids_c, pos_c, counts_c, sel_idx_k,
                gl + jnp.swapaxes(dl, 1, 2)[:, :, :K],
                ga + jnp.swapaxes(da, 1, 2)[:, :, :K],
                gd + jnp.swapaxes(dd, 1, 2)[:, :, :K],
                K=K, B=B, P_pad=P_pad, ray_chunk=rc_bwd,
                cand_chunk=cc_bwd, dst=dst, fold_in=None, mode="both")
        )))(*fold_weights_pallas(
            raw[0], raw[1], raw[2], raw[3],
            jnp.pad(jnp.swapaxes(gw, 1, 2),
                    ((0, 0), (0, raw[0].shape[1] - K), (0, 0))),
            1.0, K))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd nofold cc256", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, 256,
                                               fold=False))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd nofold cc128", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, 128,
                                               fold=False))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd nofold K=8", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, cc_bwd,
                                               kk=8, fold=False))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd rc=208", jax.jit(
        lambda tc: sum(x.sum() for x in fine_bwd_compact_pallas(
            rf_k, tc, ids_c, pos_c, counts_c, sel_idx_k, gl, ga, gd,
            K=K, B=B, P_pad=P_pad, ray_chunk=208, cand_chunk=cc_bwd,
            dst=dst, fold_in=lad_w + (gw,), agg_ow=1.0, mode="both"))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("table build+gather", jax.jit(
        lambda m: _prep(m)[6].sum()),
     lambda i: (mus0 * (1 + 1e-6 * i),)),
    ("bwd kern both+dst", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, cc_bwd))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd kern gauss+dst", jax.jit(
        lambda tc: bwd_fn(tc, "gauss", True, cc_bwd)[0].sum()),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd kern both+dst cc128", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", True, 128))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("bwd kern both+segsum", jax.jit(
        lambda tc: sum(x.sum() for x in bwd_fn(tc, "both", False, cc_bwd))),
     lambda i: (table_c * (1 + 1e-6 * i),)),
    ("gather_back alone", jax.jit(
        lambda r: gather_back_rows(r, dst, B, P_pad, nb * M_max).sum()),
     lambda i: (rows_bwd * (1 + 1e-6 * i),)),
    ("attr fwd kernel", jax.jit(
        lambda ac: _attr_fwd_call(
            ac, ids_row, sel_idx_k, w_eff, csel_a, cnts_a,
            cand_chunk=cc_attr, per_bin_cand=True, bh_bw=1,
            interpret=False).sum()),
     lambda i: (attr_c * (1 + 1e-6 * i),)),
    ("attr bwd kernel", jax.jit(
        lambda ac: sum(x.sum() for x in _attr_bwd_call(
            ac, ids_row, sel_idx_k, w_eff, g_img, csel_a, cnts_a,
            cand_chunk=cc_attr, per_bin_cand=True, bh_bw=1,
            interpret=False))),
     lambda i: (attr_c * (1 + 1e-6 * i),)),
    ("attr gather (planes->c)", jax.jit(
        lambda p: _gather_attr_compact(p, pos_c, B, P_pad).sum()),
     lambda i: (planes * (1 + 1e-6 * i),)),
]

for name, fn, al in cases:
    st = measure_stats(fn, args_fn=al, n1=N1, n2=N2)
    print(f"{name:26s} {st['median']*1e3:7.2f} ms  (spread "
          f"{st['spread']*100:.0f}%)", flush=True)
