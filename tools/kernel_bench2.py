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

pts, isg, ids, perm = F._sort_bin_coherent(
    R_m, T, focal, principal, mus, isig, (H, W), bin_size, base_ids)
mask = overlap_mask(R_m, T, focal, principal, pts, isg, (H, W), thr, bin_size)
prep = F._mask_path_prep(pts, isg, rays, mask, ids, (bin_size, bin_size))
print(f"P={P} bin={bin_size} compact={prep.get('compact')} "
      f"M_max={prep.get('m_max')} rc={prep['rc']} cc={prep['cand_chunk']} "
      f"nst={prep['rf_k'].shape[0]}")

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

for K in (1, 4, 20, 40, 60, 80):
    fn = jax.jit(lambda *a, _K=K: fine_select_compact_pallas(
        *a, thr_act, _K, sub_bins=G, ray_chunk=prep["rc"],
        cand_chunk=prep["cand_chunk"], per_bin_cand=True)[1])
    t = measure(fn, args_list, n1=3, n2=13)
    print(f"select K={K:3d}  {t*1e3:7.2f} ms", flush=True)
