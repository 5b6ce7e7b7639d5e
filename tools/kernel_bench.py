"""Microbench: fine kernel cost split (hit-eval vs K-pass merge vs step
overhead) at the headline 10K-Gaussian / 256x256 geometry, on real TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.ops import fine as F
from voge_tpu.ops.coarse import coarse_bin_config, overlap_mask
from voge_tpu.ops.pallas_fine2 import fine_select_mask_pallas, FEAT
from voge_tpu.rays import camera_rays
from voge_tpu.aggregation import expend_sigma
from voge_tpu.timing import measure

H = W = 256
K = 20

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 10000, percentage=0.6, as_obj=True)
verts = jnp.asarray(g.verts)[None]
sigmas = expend_sigma(jnp.asarray(g.sigmas))[None]
R_m, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.0, 300.0]])
principal = jnp.asarray([[128.0, 128.0]])
rays, origins = camera_rays(R_m, T, focal, principal, (H, W))
mus = verts - origins[:, None, :]
isig = 2.0 * sigmas

B, P = mus.shape[0], mus.shape[1]
bin_size, _ = coarse_bin_config((H, W), K, P, None, None)
thr = 0.01
thr_act = -np.log(thr + 1e-10)
mask = overlap_mask(R_m, T, focal, principal, mus, isig, (H, W), thr, bin_size)
_, BH, BW, _ = mask.shape
print(f"bin={bin_size} BH,BW={BH},{BW} P={P} mask_density={float(jnp.mean(mask.astype(jnp.float32))):.4f}")

cand_chunk = 1024
P_pad = (max(P, cand_chunk) + cand_chunk - 1) // cand_chunk * cand_chunk
gauss_feat = F._gauss_feature_planes_batched(mus, isig)
gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
mask_flat = mask.reshape(B * BH * BW, P).astype(jnp.int8)
mask_flat = jnp.pad(mask_flat, ((0, 0), (0, P_pad - P)))
rays_feat, Rr, R_pad = F._rays_features(rays, BH, BW, bin_size, bin_size)

rf_g, BH2, BW2 = F._group_supertiles(rays_feat, B, BH, BW)
mask_g, _, _ = F._group_supertiles(mask_flat[:, None, :], B, BH, BW)
print(f"supertiles={BH2}x{BW2} rays/step={rf_g.shape[1]} chunks={P_pad//cand_chunk}")
# fraction of non-empty (supertile, chunk) steps
mg = np.asarray(mask_g).reshape(mask_g.shape[0], mask_g.shape[1], P_pad // cand_chunk, cand_chunk)
nonempty = (mg.max(axis=(1, 3)) > 0)
print(f"nonempty steps: {nonempty.sum()}/{nonempty.size} ({nonempty.mean():.2%})")

kw = dict(thr_act=float(thr_act), bh_bw=BH2 * BW2, n_gauss=P,
          ray_chunk=rf_g.shape[1], cand_chunk=cand_chunk)


def run_variant(name, fn, n1=3, n2=13):
    jitted = jax.jit(fn)
    args_list = [(rf_g * (1 + 1e-6 * i),) for i in range(8)]
    t = measure(jitted, args_list, n1=n1, n2=n2)
    print(f"{name:28s} {t*1000:8.2f} ms")
    return t


run_variant("full_kernel_K20", lambda rf: fine_select_mask_pallas(rf, gauss_feat, mask_g, K=K, **kw)[1])
run_variant("full_kernel_K4", lambda rf: fine_select_mask_pallas(rf, gauss_feat, mask_g, K=4, **kw)[1])
run_variant("full_kernel_K1", lambda rf: fine_select_mask_pallas(rf, gauss_feat, mask_g, K=1, **kw)[1])

# all-empty mask: measures pure grid-step overhead (predication + block fetch)
zero_mask = jnp.zeros_like(mask_g)
run_variant("all_steps_skipped", lambda rf: fine_select_mask_pallas(rf, gauss_feat, zero_mask, K=K, **kw)[1])


# --- hit-eval only kernel (no merge): per-step writes min length ------------
def _hit_only_kernel(mask_ref, gf_ref, rf_ref, o_ref, acc, *, thr_act, G):
    c = pl.program_id(2)
    n_c = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.full_like(acc, 1e10)

    m = mask_ref[0]

    @pl.when(jnp.max(m.astype(jnp.float32)) > 0.5)
    def _():
        rf = rf_ref[0]
        gf = gf_ref[0]
        R = rf.shape[0]
        C = gf.shape[1]
        R_bin = R // G
        mexp = jnp.broadcast_to(
            m.astype(jnp.float32)[:, None, :], (G, R_bin, C)
        ).reshape(R, C)
        msk = rf[:, 0:1] * gf[0:1, :] + rf[:, 1:2] * gf[1:2, :] + rf[:, 2:3] * gf[2:3, :]
        ksk = rf[:, 3:4] * gf[4:5, :]
        for q in range(1, 9):
            ksk = ksk + rf[:, 3 + q: 4 + q] * gf[4 + q: 5 + q, :]
        length = msk / ksk
        act = gf[3:4, :] - msk * msk / ksk
        ok = (act < thr_act) & (mexp > 0.5)
        lm = jnp.where(ok, length, 1e10)
        acc[:] = jnp.minimum(acc[:], jnp.min(lm, axis=1, keepdims=True))

    @pl.when(c == n_c - 1)
    def _():
        o_ref[0] = acc[:]


def hit_only(rf):
    nb, R_pad_, _ = rf.shape
    G = mask_g.shape[1]
    n_c = P_pad // cand_chunk
    return pl.pallas_call(
        functools.partial(_hit_only_kernel, thr_act=float(thr_act), G=G),
        grid=(nb, 1, n_c),
        in_specs=[
            pl.BlockSpec((1, G, cand_chunk), lambda b, r, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FEAT, cand_chunk), lambda b, r, c, _bw=BH2 * BW2: (b // _bw, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_pad_, FEAT), lambda b, r, c: (b, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R_pad_, 1), lambda b, r, c: (b, r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, R_pad_, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R_pad_, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(mask_g, gauss_feat, rf)


run_variant("hit_eval_only", hit_only)


# --- MXU hit-eval variant: msk/ksk via one (R,16)@(16,2C) matmul ------------
def _hit_mxu_kernel(mask_ref, gfp_ref, rf_ref, o_ref, acc, *, thr_act, G):
    c = pl.program_id(2)
    n_c = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.full_like(acc, 1e10)

    m = mask_ref[0]

    @pl.when(jnp.max(m.astype(jnp.float32)) > 0.5)
    def _():
        rf = rf_ref[0]
        gfp = gfp_ref[0]             # (FEAT, 2C): [:, :C] -> msk cols, [:, C:] -> ksk cols
        R = rf.shape[0]
        C = gfp.shape[1] // 2
        R_bin = R // G
        mexp = jnp.broadcast_to(
            m.astype(jnp.float32)[:, None, :], (G, R_bin, C)
        ).reshape(R, C)
        both = jax.lax.dot_general(
            rf, gfp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                              # (R, 2C)
        msk = both[:, :C]
        ksk = both[:, C:]
        length = msk / ksk
        act = gfp[3, :C][None, :] * 0.0 + (0.0 - msk * msk / ksk)  # placeholder act calc
        ok = (act < thr_act) & (mexp > 0.5)
        lm = jnp.where(ok, length, 1e10)
        acc[:] = jnp.minimum(acc[:], jnp.min(lm, axis=1, keepdims=True))

    @pl.when(c == n_c - 1)
    def _():
        o_ref[0] = acc[:]


# packed gauss planes: columns [0:C] rows0..2 = A (for msk), columns [C:2C]
# rows 3..11 = L (for ksk); ray features already in cols 0..2 / 3..11.
gfp = np.zeros((B, FEAT, 2 * P_pad), np.float32)
gf_np = np.asarray(gauss_feat)
gfp[:, 0:3, :P_pad] = gf_np[:, 0:3]
gfp[:, 3:12, P_pad:] = gf_np[:, 4:13]
gfp = jnp.asarray(gfp)


def hit_mxu(rf):
    nb, R_pad_, _ = rf.shape
    G = mask_g.shape[1]
    n_c = P_pad // cand_chunk
    return pl.pallas_call(
        functools.partial(_hit_mxu_kernel, thr_act=float(thr_act), G=G),
        grid=(nb, 1, n_c),
        in_specs=[
            pl.BlockSpec((1, G, cand_chunk), lambda b, r, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FEAT, 2 * cand_chunk),
                         lambda b, r, c, _bw=BH2 * BW2: (b // _bw, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_pad_, FEAT), lambda b, r, c: (b, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R_pad_, 1), lambda b, r, c: (b, r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, R_pad_, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R_pad_, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(mask_g, jnp.asarray(gfp2), rf)


# reshape packed planes so block c maps to [c*C:(c+1)*C] of each half
gfp2 = np.zeros((B, FEAT, 2 * P_pad), np.float32)
n_chunks = P_pad // cand_chunk
for ci in range(n_chunks):
    sl = slice(2 * ci * cand_chunk, (2 * ci + 1) * cand_chunk)
    sr = slice((2 * ci + 1) * cand_chunk, (2 * ci + 2) * cand_chunk)
    gfp2[:, 0:3, sl] = gf_np[:, 0:3, ci * cand_chunk:(ci + 1) * cand_chunk]
    gfp2[:, 3:12, sr] = gf_np[:, 4:13, ci * cand_chunk:(ci + 1) * cand_chunk]

run_variant("hit_eval_mxu", hit_mxu)
