"""Component-level timing at the headline 10K / 256^2 fwd+bwd workload:
prep (rays+coarse+sort+compaction), select kernel, aggregation fwd/bwd,
attr compositing fwd/bwd, fine backward.  Run on the TPU attachment.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.aggregation import aggregation, expend_sigma
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.ops import fine as F
from voge_tpu.ops.coarse import coarse_bin_config, overlap_mask
from voge_tpu.rays import camera_rays
from voge_tpu.timing import measure

H = W = 256
K = 20
N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)[None]
sigmas = expend_sigma(jnp.asarray(g.sigmas))[None]
R_m, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[128.0, 128.0]])
rays, origins = camera_rays(R_m, T, focal, principal, (H, W))
mus0 = verts - origins[:, None, :]
isig0 = 2.0 * sigmas
B, P = mus0.shape[0], mus0.shape[1]
bin_size, _ = coarse_bin_config((H, W), K, P, None, None)
thr = 0.01
thr_act = float(-np.log(thr + 1e-10))
print(f"P={P} bin={bin_size} backend={jax.default_backend()}")

base_ids = jnp.arange(P, dtype=jnp.int32)[None, :]


def prep_only(mus, isig):
    pts, isg, ids, perm = F._sort_bin_coherent(
        R_m, T, focal, principal, mus, isig, (H, W), bin_size, base_ids)
    mask = overlap_mask(R_m, T, focal, principal, pts, isg, (H, W), thr, bin_size)
    prep = F._mask_path_prep(pts, isg, rays, mask, ids, (bin_size, bin_size))
    outs = [prep[k] for k in ("rays_t", "rf_k") if k in prep]
    if prep.get("compact"):
        outs += [prep["table_c"], prep["counts_c"]]
    return [jnp.sum(o) if o.dtype != jnp.int32 else jnp.sum(o) for o in outs[-2:]]


def prep_select(mus, isig):
    sel = F._ray_trace_fine_mask(
        *_mask_args(mus, isig), thr_act, (bin_size, bin_size), K)
    return [x.sum() for x in sel[1:]]


def _mask_args(mus, isig):
    pts, isg, ids, perm = F._sort_bin_coherent(
        R_m, T, focal, principal, mus, isig, (H, W), bin_size, base_ids)
    mask = overlap_mask(R_m, T, focal, principal, pts, isg, (H, W), thr, bin_size)
    return pts, isg, rays, mask, ids


def full_sel(mus, isig):
    sel_k, aux = F._rt_fine_kern(
        *_mask_args(mus, isig), thr_act, (bin_size, bin_size), K, 0)
    return sel_k


sel_fixed = jax.jit(full_sel)(mus0, isig0)
sel_fixed = [jnp.asarray(np.asarray(x)) for x in sel_fixed]


def agg_fwd(si, sa, sl, sd):
    return aggregation(sel_idx=si, sel_act=sa, sel_len=sl, sel_dsd=sd)[0].sum()


def agg_fwdbwd(si, sa, sl, sd):
    f = lambda a, l, d: aggregation(sel_idx=si, sel_act=a, sel_len=l, sel_dsd=d)[0].sum()
    return jax.grad(f, argnums=(0, 1, 2))(sa, sl, sd)


def sel_fwdbwd(mus, isig):
    def f(m, s):
        sel = F._ray_trace_fine_mask(
            *_mask_args(m, s), thr_act, (bin_size, bin_size), K)
        return sum(x.sum() for x in sel[1:])
    return jax.grad(f, argnums=(0, 1))(mus, isig)


def variants():
    out = {}
    al = [(mus0 * (1 + 1e-4 * i), isig0) for i in range(10)]
    for name, fn in [
        ("prep only", prep_only),
        ("prep+select fwd", prep_select),
        ("prep+select fwd+bwd", sel_fwdbwd),
    ]:
        t = measure(jax.jit(fn), al, n1=3, n2=13)
        out[name] = t * 1e3
        print(f"{name:24s} {t*1e3:7.2f} ms", flush=True)
    si, sl, sa, sd = sel_fixed
    al2 = [(si, sa * (1 + 1e-5 * i), sl, sd) for i in range(10)]
    for name, fn in [("agg fwd (kern layout)", agg_fwd),
                     ("agg fwd+bwd", agg_fwdbwd)]:
        t = measure(jax.jit(fn), al2, n1=3, n2=13)
        out[name] = t * 1e3
        print(f"{name:24s} {t*1e3:7.2f} ms", flush=True)
    print(f"select-only fwd          {out['prep+select fwd'] - out['prep only']:7.2f} ms")
    print(f"fine bwd-only            {out['prep+select fwd+bwd'] - out['prep+select fwd']:7.2f} ms")


if __name__ == "__main__":
    variants()
