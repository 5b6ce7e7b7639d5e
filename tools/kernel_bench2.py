"""Microbench of the production compacted select kernel across K, on the
prepped 10K / 256^2 workload (real TPU).  Answers: merge-cost scaling in K
(the K-unrolled extraction) and where the select's ms go.

Run: python tools/kernel_bench2.py [n_gauss [image]]
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
from voge_tpu.ops.coarse import coarse_bin_config, overlap_mask
from voge_tpu.rays import camera_rays
from voge_tpu.timing import measure

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
K_BASE = 20

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)[None]
sigmas = expend_sigma(jnp.asarray(g.sigmas))[None]
R_m, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[W / 2, H / 2]])
rays, origins = camera_rays(R_m, T, focal, principal, (H, W))
mus = verts - origins[:, None, :]
isig = 2.0 * sigmas
B, P = mus.shape[0], mus.shape[1]
bin_size, _ = coarse_bin_config((H, W), K_BASE, P, None, None)
thr = 0.01
thr_act = float(-np.log(thr + 1e-10))
base_ids = jnp.arange(P, dtype=jnp.int32)[None, :]

# one compiled program for the whole prep (eager dispatch over the relay
# attachment costs ~100s; jitted it is one cached executable)
def _prep_arrays(mus, isig):
    pts, isg, ids, perm = F._sort_bin_coherent(
        R_m, T, focal, principal, mus, isig, (H, W), bin_size, base_ids)
    mask = overlap_mask(R_m, T, focal, principal, pts, isg, (H, W), thr, bin_size)
    p = F._mask_path_prep(pts, isg, rays, mask, ids, (bin_size, bin_size))
    return (p["rays_t"], p["table_c"], p["bits_c"], p["ids_c"], p["counts_c"])

_arr = jax.jit(_prep_arrays)(mus, isig)
# static metadata recomputed host-side (mirrors _mask_path_prep)
BH = (H - 1) // bin_size + 1
BW = (W - 1) // bin_size + 1
BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
bh_bw = BH2 * BW2
cc = F._pick_cand_chunk(P)
cc_align = max(cc, F._pick_cand_chunk_bwd(P))
P_pad = F._ceil_to(max(P, cc_align), cc_align)
prep = dict(
    rc=_arr[0].shape[2], cand_chunk=cc,
    m_max=F._pick_m_max(P_pad, bh_bw, cc), compact=True,
    mask_k=np.zeros((1, 4, 1), np.int8),
)
(prep["rays_t"], prep["table_c"], prep["bits_c"], prep["ids_c"],
 prep["counts_c"]) = _arr
print(f"P={P} bin={bin_size} compact={prep.get('compact')} "
      f"M_max={prep.get('m_max')} rc={prep['rc']} cc={prep['cand_chunk']} "
      f"nst={prep['rays_t'].shape[0]}")

from voge_tpu.ops.pallas_fine2 import (
    fine_select_compact_pallas, prefix_visit_lists,
)

csel, counts = prefix_visit_lists(prep["counts_c"], prep["m_max"], prep["cand_chunk"])
G = prep["mask_k"].shape[1]
rays_t = prep["rays_t"]
args0 = (rays_t, prep["table_c"], prep["bits_c"], prep["ids_c"], csel, counts)
args_list = [
    (rays_t * (1 + 1e-5 * i),) + args0[1:] for i in range(10)
]

for K in (20, 40, 60, 80, 4):
    fn = jax.jit(lambda *a, _K=K: fine_select_compact_pallas(
        *a, thr_act, _K, sub_bins=G, ray_chunk=prep["rc"],
        cand_chunk=prep["cand_chunk"], per_bin_cand=True)[1])
    t = measure(fn, args_list, n1=3, n2=13)
    print(f"select K={K:3d}  {t*1e3:7.2f} ms", flush=True)


# ---- XLA dense fallback over the SAME compacted candidate space ----------
def xla_compact_select(rays_t, table_c, bits_c, ids_c, K):
    """Dense hit eval (MXU einsums) + lax.top_k over M_max, per supertile."""
    rf = jnp.swapaxes(rays_t, 1, 2)            # (nst, R, 16)
    tab = table_c                               # (nst, M, 16)
    msk = jnp.einsum("brd,bmd->brm", rf[:, :, 0:3], tab[:, :, 0:3],
                     precision=jax.lax.Precision.HIGHEST)
    ksk = jnp.einsum("brq,bmq->brm", rf[:, :, 3:12], tab[:, :, 4:13],
                     precision=jax.lax.Precision.HIGHEST)
    msm = tab[:, :, 3][:, None, :]
    length = msk / ksk
    act = msm - msk * msk / ksk
    R = rf.shape[1]
    G = 4  # sub-bins per supertile (grouped 2x2)
    lane_bin = (jnp.arange(R) // (R // G))[None, :, None]
    member = (bits_c[:, None, :, 0] >> lane_bin) & 1
    ok = (act < thr_act) & (member > 0)
    lm = jnp.where(ok, length, 1e10)
    neg, args = jax.lax.top_k(-lm, K)
    take = lambda x: jnp.take_along_axis(x, args, axis=-1)
    sel_ok = take(ok)
    return (jnp.where(sel_ok, take(jnp.broadcast_to(ids_c[:, None, :, 0], ok.shape)), -1),
            jnp.where(sel_ok, -neg, 1e10),
            jnp.where(sel_ok, take(act), 1e10),
            jnp.where(sel_ok, take(ksk), 0.0))


for K in (20, 60, 80):
    fn = jax.jit(lambda *a, _K=K: xla_compact_select(*a, _K)[1])
    al = [(rays_t * (1 + 1e-5 * i), prep["table_c"], prep["bits_c"], prep["ids_c"])
          for i in range(10)]
    t = measure(fn, al, n1=3, n2=13)
    print(f"xla_select K={K:3d}  {t*1e3:7.2f} ms", flush=True)

# repeat pallas K=80/4 to check measurement stability
for K in (80, 4, 60):
    fn = jax.jit(lambda *a, _K=K: fine_select_compact_pallas(
        *a, thr_act, _K, sub_bins=G, ray_chunk=prep["rc"],
        cand_chunk=prep["cand_chunk"], per_bin_cand=True)[1])
    t = measure(fn, args_list, n1=3, n2=13)
    print(f"pallas repeat K={K:3d}  {t*1e3:7.2f} ms", flush=True)
