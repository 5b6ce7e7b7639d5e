"""Fine stage: binned per-pixel ray tracing with analytic custom VJP.

TPU-native replacement for the reference's hot CUDA kernel
(``ray_trace_voge.cu``).  Two implementations behind one interface:

  - a fused Pallas kernel (:mod:`voge_tpu.ops.pallas_fine`) used on TPU:
    per-bin (R, M) hit evaluation + K-pass nearest selection entirely in
    VMEM;
  - a pure-XLA fallback (CPU, tests, and shapes exceeding the kernel's VMEM
    budget) computing the same math with ``lax.top_k``.

Both consume *component planes*: Gaussian parameters are decomposed into 13
per-kernel feature vectors (A = Lambda^T mu, msm, the 9 entries of Lambda)
and rays into 12 per-pixel features (direction + outer-product entries), so
that every hot array keeps the large axis (candidates / rays) on the TPU
lane dimension.  Arrays shaped (..., 3, 3) never appear in the hot path —
batched tiny matmuls compile catastrophically on TPU.

Backward is analytic (custom VJP), flash-attention style: only
(mus, isigmas, rays, sel_idx) are saved; the quadratic forms are recomputed
per selected (pixel, slot) and the closed-form chain rule of
``ray_trace_voge.cu:324-330`` applies:

    g_ksk = (g_a * msk - g_l) * msk / ksk^2 + g_d
    g_msk = (g_l - 2 g_a * msk) / ksk
    g_msm = g_a

Per-Gaussian gradients accumulate with a deterministic ``segment_sum``
(bitwise-reproducible; an upgrade over the reference's float atomics).

The no-coarse path (``max_points_per_bin == -1``) uses a single bin covering
the whole image with every Gaussian as candidate (cf. the reference's
all-points index tensor, ``RayTracing.py:22-26``; without the square-grid
indexing bug at ``RayTracing.py:25`` / ``ray_trace_voge.cu:185``).
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from voge_tpu.ops.coarse import coarse_bin_config, rasterize_coarse
from voge_tpu.ops.pallas_fine import (
    FEAT,
    UNIFIED_BWD_MAX_PPAD,
    fine_select_pallas,
    pick_ray_chunk,
)

_P = jax.lax.Precision.HIGHEST
_SENTINEL_LEN = 1e10
_SENTINEL_ACT = 1e10

# Largest padded candidate count the Pallas kernel will take on (VMEM
# budget); beyond this the XLA fallback runs.
_PALLAS_MAX_M = 16384

# Largest K the Pallas kernels (select extraction passes, the
# backward/attr coefficient match loops) take on.  The original K=80
# ceiling was a VMEM artifact of the UNROLLED loops (Mosaic kept the per-K
# one-hot temporaries live; K=102 blew the 100 MB scoped budget) — the
# round-3 ``lax.fori_loop`` rework (ops/pallas_fine.py ``_MAX_UNROLL_K``)
# made the loop state K-independent, so the ceiling now only bounds the
# (Kp, ray_chunk) running-state scratch; 128 covers EfficientCuboid's
# ``max_assign = all kernels`` (K=102, ray_trace_voge.cu:197-213 handles
# any K) with margin.  Beyond this the dense XLA formulation runs
# (SURVEY §7 "large-K cases should fall back to dense top_k") — at
# select-everything K >> P the top-K machinery buys nothing anyway.
# ``VOGE_TPU_MAX_KERN_K`` overrides the boundary (read at trace time, so a
# test or user can change it without re-importing).
_DEFAULT_MAX_KERN_K = 128


def _max_kern_k() -> int:
    return int(os.environ.get("VOGE_TPU_MAX_KERN_K", _DEFAULT_MAX_KERN_K))


def _kern_k_ok(K: int) -> bool:
    return int(K) <= _max_kern_k()

# Backward-compatible alias; the constant lives in pallas_fine (shared with
# pallas_attr so the two dispatch thresholds cannot drift apart).
_UNIFIED_BWD_MAX_PPAD = UNIFIED_BWD_MAX_PPAD


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# feature planes
# ---------------------------------------------------------------------------

def _gauss_feature_cols(mus: jax.Array, isigmas: jax.Array):
    """16 per-Gaussian feature vectors (each (P,)):
    [A0, A1, A2, msm, L00, ..., L22, mu0, mu1, mu2]
    with A = Lambda^T mu (so msk = mu^T Lambda r, gradient-parity with the
    CUDA contraction order) and msm = mu^T Lambda mu.  The mu rows feed the
    compensated residual-form activation (see ops/pallas_fine.py)."""
    mu = [mus[:, d] for d in range(3)]
    L = [[isigmas[:, i, j] for j in range(3)] for i in range(3)]
    A = [
        L[0][i] * mu[0] + L[1][i] * mu[1] + L[2][i] * mu[2] for i in range(3)
    ]
    msm = mu[0] * A[0] + mu[1] * A[1] + mu[2] * A[2]
    return A + [msm] + [L[i][j] for i in range(3) for j in range(3)] + mu


def _bin_plane(x: jax.Array, BH: int, BW: int, bsh: int, bsw: int) -> jax.Array:
    """(B, Hp, Wp) -> (B*BH*BW, bsh*bsw)."""
    B = x.shape[0]
    x = x.reshape(B, BH, bsh, BW, bsw)
    return x.transpose(0, 1, 3, 2, 4).reshape(B * BH * BW, bsh * bsw)


def _unbin(x: jax.Array, B, BH, BW, H, W, bsh, bsw) -> jax.Array:
    """(nb, R, K) -> (B, H, W, K)."""
    K = x.shape[-1]
    x = x.reshape(B, BH, BW, bsh, bsw, K).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, BH * bsh, BW * bsw, K)[:, :H, :W]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _residual_act(length, rf, cf):
    """act = d^T Lambda d with d = mu - len * r over planes layouts — the
    compensated residual form of msm - msk^2/ksk (identical math, no
    eps*msm cancellation; see ops/pallas_fine.py and tools/debug_bunny.py).

    :param length: (nb, R, M); :param rf: (nb, R, FEAT) ray features;
    :param cf: (nb, FEAT, M) candidate features (mu rows 13..15, Lambda
        rows 4..12)."""
    d = [
        cf[:, 13 + i, :][:, None, :] - length * rf[:, :, i][:, :, None]
        for i in range(3)
    ]
    Lr = lambda i, j: cf[:, 4 + 3 * i + j, :][:, None, :]
    e = [sum(d[i] * Lr(i, j) for i in range(3)) for j in range(3)]
    return sum(e[j] * d[j] for j in range(3))


def _xla_select(rays_feat, cand_feat, cand_idx, thr_act: float, K: int):
    """Pure-XLA selection over planes (CPU / fallback path); same math and
    tie-breaking as the Pallas kernel (top_k and argmin-extraction both
    prefer the lowest candidate position on ties)."""
    rf = rays_feat            # (nb, R_pad, 16)
    cf = cand_feat            # (nb, 16, M_pad)
    idx = cand_idx[:, 0, :]   # (nb, M_pad)
    msk = jnp.einsum("brd,bdm->brm", rf[:, :, 0:3], cf[:, 0:3, :],
                     precision=jax.lax.Precision.HIGHEST)
    ksk = jnp.einsum("brq,bqm->brm", rf[:, :, 3:12], cf[:, 4:13, :],
                     precision=jax.lax.Precision.HIGHEST)
    length = msk / ksk
    act = _residual_act(length, rf, cf)
    ok = (act < thr_act) & (idx[:, None, :] >= 0)
    lm = jnp.where(ok, length, _SENTINEL_LEN)
    kk = min(K, lm.shape[-1])
    neg_vals, args = jax.lax.top_k(-lm, kk)
    sel_ok = jnp.take_along_axis(ok, args, axis=-1)
    cand_b = jnp.broadcast_to(idx[:, None, :], ok.shape)
    sel_idx = jnp.where(sel_ok, jnp.take_along_axis(cand_b, args, axis=-1), -1)
    sel_len = jnp.where(sel_ok, -neg_vals, _SENTINEL_LEN)
    sel_act = jnp.where(sel_ok, jnp.take_along_axis(act, args, -1), _SENTINEL_ACT)
    sel_dsd = jnp.where(sel_ok, jnp.take_along_axis(ksk, args, -1), 0.0)
    if kk < K:
        pad = ((0, 0), (0, 0), (0, K - kk))
        sel_idx = jnp.pad(sel_idx, pad, constant_values=-1)
        sel_len = jnp.pad(sel_len, pad, constant_values=_SENTINEL_LEN)
        sel_act = jnp.pad(sel_act, pad, constant_values=_SENTINEL_ACT)
        sel_dsd = jnp.pad(sel_dsd, pad, constant_values=0.0)
    return sel_idx.astype(jnp.int32), sel_len, sel_act, sel_dsd


def _fine_forward(
    mus: jax.Array,        # (P, 3) flattened over batch
    isigmas: jax.Array,    # (P, 3, 3)
    rays: jax.Array,       # (B, H, W, 3)
    bin_points: jax.Array, # (B, BH, BW, M) int32, -1 padded
    thr_act: float,
    bin_size: Tuple[int, int],
    K: int,
):
    B, H, W, _ = rays.shape
    _, BH, BW, M = bin_points.shape
    bsh, bsw = bin_size
    nb = B * BH * BW
    R = bsh * bsw
    R_pad = _ceil_to(R, 8)
    M_pad = _ceil_to(M, 128)

    # ---- candidate feature planes -------------------------------------
    bp = bin_points.reshape(nb, M)
    if M_pad > M:
        bp = jnp.pad(bp, ((0, 0), (0, M_pad - M)), constant_values=-1)
    valid = bp >= 0
    idxc = jnp.where(valid, bp, 0)
    cols = _gauss_feature_cols(mus, isigmas)
    gathered = [c[idxc] for c in cols]                       # 16 x (nb, M_pad)
    cand_feat = jnp.stack(gathered, axis=1)
    cand_idx = bp[:, None, :]

    # ---- ray feature planes --------------------------------------------
    Hp, Wp = BH * bsh, BW * bsw
    r_planes = []
    for d in range(3):
        x = rays[..., d]
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)))
        r_planes.append(_bin_plane(x, BH, BW, bsh, bsw))      # (nb, R)
    feats = list(r_planes)
    for i in range(3):
        for j in range(3):
            feats.append(r_planes[i] * r_planes[j])
    zcol = jnp.zeros_like(feats[0])
    rays_feat = jnp.stack(feats + [zcol] * (FEAT - 12), axis=-1)  # (nb, R, 16)
    if R_pad > R:
        rays_feat = jnp.pad(rays_feat, ((0, 0), (0, R_pad - R), (0, 0)))

    # ---- selection -------------------------------------------------------
    use_pallas = (
        jax.default_backend() == "tpu" and M_pad <= _PALLAS_MAX_M
        and _kern_k_ok(K)
    )
    if use_pallas:
        rc = pick_ray_chunk(R_pad, M_pad)
        sel = fine_select_pallas(
            rays_feat, cand_feat, cand_idx, thr_act, K, ray_chunk=rc
        )
    else:
        sel = _xla_select(rays_feat, cand_feat, cand_idx, thr_act, K)

    out = []
    for x in sel:
        x = x[:, :R, :]
        out.append(_unbin(x, B, BH, BW, H, W, bsh, bsw))
    return tuple(out)


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ray_trace_fine(mus, isigmas, rays, bin_points, thr_act, bin_size, K):
    return _fine_forward(mus, isigmas, rays, bin_points, thr_act, bin_size, K)


def _ray_trace_fine_fwd(mus, isigmas, rays, bin_points, thr_act, bin_size, K):
    out = _fine_forward(mus, isigmas, rays, bin_points, thr_act, bin_size, K)
    return out, (mus, isigmas, rays, out[0], bin_points)


def _ray_trace_fine_bwd(thr_act, bin_size, K, res, g):
    mus, isigmas, rays, sel_idx, bin_points = res
    _, g_len, g_act, g_dsd = g
    B, H, W, Kk = sel_idx.shape
    P = mus.shape[0]

    idx = sel_idx.reshape(-1)
    valid = idx >= 0
    idxc = jnp.where(valid, idx, 0)

    # ONE packed row-gather + transpose-to-planes.  Column-sliced ("strided")
    # gathers are ~40x slower on TPU than a single row gather of the packed
    # (P, 16) table; post-gather we transpose once so every subsequent plane
    # access is a contiguous leading-axis row.
    pack_cols = [mus[:, d] for d in range(3)] + [
        isigmas[:, i, j] for i in range(3) for j in range(3)
    ]
    packed_tbl = jnp.stack(
        pack_cols + [jnp.zeros_like(pack_cols[0])] * 4, axis=-1
    )                                                          # (P, 16)
    g16 = packed_tbl[idxc]                                     # (E, 16)
    gt = g16.T                                                 # (16, E)
    mu = [gt[d] for d in range(3)]                             # 3 x (E,)
    L = [[gt[3 + i * 3 + j] for j in range(3)] for i in range(3)]
    r_pix = [rays[..., d].reshape(-1) for d in range(3)]       # (B*H*W,)
    r = [
        jnp.broadcast_to(x[:, None], (x.shape[0], Kk)).reshape(-1)
        for x in r_pix
    ]                                                          # 3 x (E,)

    lam_r = [sum(L[i][j] * r[j] for j in range(3)) for i in range(3)]
    lamT_r = [sum(L[j][i] * r[j] for j in range(3)) for i in range(3)]
    lam_mu = [sum(L[i][j] * mu[j] for j in range(3)) for i in range(3)]
    lamT_mu = [sum(L[j][i] * mu[j] for j in range(3)) for i in range(3)]

    ksk = sum(r[i] * lam_r[i] for i in range(3))
    msk = sum(mu[i] * lam_r[i] for i in range(3))
    ksk = jnp.where(valid, ksk, 1.0)

    vf = valid.astype(mus.dtype)
    gl = g_len.reshape(-1) * vf
    ga = g_act.reshape(-1) * vf
    gd = g_dsd.reshape(-1) * vf

    # closed-form chain rule (ray_trace_voge.cu:324-326)
    g_ksk = (ga * msk - gl) * msk / (ksk * ksk) + gd
    g_msk = (gl - 2.0 * ga * msk) / ksk
    g_msm = ga

    g_mu = [
        g_msk * lam_r[i] + g_msm * (lam_mu[i] + lamT_mu[i]) for i in range(3)
    ]
    g_ray = [
        g_ksk * (lam_r[i] + lamT_r[i]) + g_msk * lamT_mu[i] for i in range(3)
    ]
    g_L = [
        g_ksk * r[i] * r[j] + g_msk * mu[i] * r[j] + g_msm * mu[i] * mu[j]
        for i in range(3)
        for j in range(3)
    ]

    grad_rays = jnp.stack(
        [x.reshape(B, H, W, Kk).sum(axis=3) for x in g_ray], axis=-1
    )
    packed = jnp.stack(g_mu + g_L, axis=-1)                    # (E, 12)
    summed = jax.ops.segment_sum(packed, idxc, num_segments=P)  # (P, 12)
    grad_mus = summed[:, 0:3]
    grad_isg = summed[:, 3:12].reshape(P, 3, 3)

    g_bin = np.zeros(bin_points.shape, dtype=jax.dtypes.float0)
    return grad_mus, grad_isg, grad_rays, g_bin


_ray_trace_fine.defvjp(_ray_trace_fine_fwd, _ray_trace_fine_bwd)


# ---------------------------------------------------------------------------
# mask path (production): no candidate gather, no list compaction
# ---------------------------------------------------------------------------

def _gauss_feature_planes_batched(mus: jax.Array, isigmas: jax.Array):
    """(B, P, 3)/(B, P, 3, 3) -> (B, FEAT, P) feature planes.

    Rows: [A0, A1, A2, msm, L00..L22, mu0, mu1, mu2] with A = Lambda^T mu.
    The forward kernel uses rows 0..12; the backward kernel additionally
    uses the mu rows 13..15.
    """
    mu = [mus[..., d] for d in range(3)]                      # (B, P)
    L = [[isigmas[..., i, j] for j in range(3)] for i in range(3)]
    A = [L[0][i] * mu[0] + L[1][i] * mu[1] + L[2][i] * mu[2] for i in range(3)]
    msm = mu[0] * A[0] + mu[1] * A[1] + mu[2] * A[2]
    cols = A + [msm] + [L[i][j] for i in range(3) for j in range(3)] + mu
    return jnp.stack(cols, axis=1)                             # (B, 16, P)


def _rays_features(rays: jax.Array, BH, BW, bsh, bsw):
    """(B, H, W, 3) -> (nb, R_pad, FEAT); returns (rays_feat, R, R_pad)."""
    B, H, W, _ = rays.shape
    Hp, Wp = BH * bsh, BW * bsw
    R = bsh * bsw
    R_pad = _ceil_to(R, 8)
    r_planes = []
    for d in range(3):
        x = jnp.pad(rays[..., d], ((0, 0), (0, Hp - H), (0, Wp - W)))
        r_planes.append(_bin_plane(x, BH, BW, bsh, bsw))
    feats = list(r_planes)
    for i in range(3):
        for j in range(3):
            feats.append(r_planes[i] * r_planes[j])
    zcol = jnp.zeros_like(feats[0])
    rays_feat = jnp.stack(feats + [zcol] * (FEAT - 12), axis=-1)
    if R_pad > R:
        rays_feat = jnp.pad(rays_feat, ((0, 0), (0, R_pad - R), (0, 0)))
    return rays_feat, R, R_pad


def _xla_select_mask(rays_feat, gauss_feat, mask, ids, thr_act: float, K: int,
                     bh_bw: int, n_gauss: int):
    """XLA fallback for the mask path (CPU / oversize shapes)."""
    nb, R_pad, _ = rays_feat.shape
    B, _, P_pad = gauss_feat.shape
    gf = jnp.repeat(gauss_feat, bh_bw, axis=0)                 # (nb, 16, P_pad)
    msk = jnp.einsum("brd,bdm->brm", rays_feat[:, :, 0:3], gf[:, 0:3, :],
                     precision=_P)
    ksk = jnp.einsum("brq,bqm->brm", rays_feat[:, :, 3:12], gf[:, 4:13, :],
                     precision=_P)
    length = msk / ksk
    act = _residual_act(length, rays_feat, gf)
    ok = (act < thr_act) & (mask[:, None, :] > 0)
    lm = jnp.where(ok, length, _SENTINEL_LEN)
    kk = min(K, P_pad)
    neg_vals, args = jax.lax.top_k(-lm, kk)
    sel_ok = jnp.take_along_axis(ok, args, axis=-1)
    gidx = jnp.repeat(ids[:, 0, :], bh_bw, axis=0)[:, None, :]  # (nb, 1, P_pad)
    gidx = jnp.broadcast_to(gidx, ok.shape)
    sel_idx = jnp.where(sel_ok, jnp.take_along_axis(gidx, args, axis=-1), -1)
    sel_len = jnp.where(sel_ok, -neg_vals, _SENTINEL_LEN)
    sel_act = jnp.where(sel_ok, jnp.take_along_axis(act, args, -1), _SENTINEL_ACT)
    sel_dsd = jnp.where(sel_ok, jnp.take_along_axis(ksk, args, -1), 0.0)
    if kk < K:
        pad = ((0, 0), (0, 0), (0, K - kk))
        sel_idx = jnp.pad(sel_idx, pad, constant_values=-1)
        sel_len = jnp.pad(sel_len, pad, constant_values=_SENTINEL_LEN)
        sel_act = jnp.pad(sel_act, pad, constant_values=_SENTINEL_ACT)
        sel_dsd = jnp.pad(sel_dsd, pad, constant_values=0.0)
    return sel_idx.astype(jnp.int32), sel_len, sel_act, sel_dsd


def _prep_ids(ids: jax.Array, P: int, P_pad: int) -> jax.Array:
    """(B, P) int32 original global ids -> (B, 1, P_pad), -1 padded."""
    ids = ids.astype(jnp.int32)
    if P_pad > P:
        ids = jnp.pad(ids, ((0, 0), (0, P_pad - P)), constant_values=-1)
    return ids[:, None, :]


def _fine_forward_mask(
    mus: jax.Array,        # (B, P, 3) camera-centered
    isigmas: jax.Array,    # (B, P, 3, 3)
    rays: jax.Array,       # (B, H, W, 3)
    mask: jax.Array,       # (B, BH, BW, P) bool/int8 membership
    ids: jax.Array,        # (B, P) int32 original global flattened ids
    thr_act: float,
    bin_size: Tuple[int, int],
    K: int,
):
    prep = _mask_path_prep(mus, isigmas, rays, mask, ids, bin_size, K=K)
    return _mask_path_select(prep, thr_act, K)[0]


def _mask_path_prep(mus, isigmas, rays, mask, ids, bin_size, m_min=0,
                    K=None):
    """Build the kernel-ready tensors (gauss feature planes, grouped
    membership mask, ids plane, grouped ray features) plus the static
    geometry.  Shared by forward and backward so the backward can reuse the
    forward's tensors from the VJP residuals instead of re-shuffling."""
    B, H, W, _ = rays.shape
    _, BH, BW, P = mask.shape
    bsh, bsw = bin_size
    nb = B * BH * BW

    cand_chunk = _pick_cand_chunk(P)
    cc_align = max(cand_chunk, _pick_cand_chunk_bwd(P))
    P_pad = _ceil_to(max(P, cc_align), cc_align)
    gauss_feat = _gauss_feature_planes_batched(mus, isigmas)
    if P_pad > P:
        gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
    mask_flat = mask.reshape(nb, P).astype(jnp.int8)
    if P_pad > P:
        mask_flat = jnp.pad(mask_flat, ((0, 0), (0, P_pad - P)))
    ids_p = _prep_ids(ids, P, P_pad)

    rays_feat, R, R_pad = _rays_features(rays, BH, BW, bsh, bsw)

    use_pallas = jax.default_backend() == "tpu" and (
        K is None or _kern_k_ok(K)
    )
    grouped = use_pallas and BH * BW > 1
    if grouped:
        # supertile: 2x2 bins per kernel step (4x fewer grid steps; each
        # ray keeps its own bin's membership row)
        rf_k, BH2, BW2 = _group_supertiles(rays_feat, B, BH, BW)
        mask_k, _, _ = _group_supertiles(mask_flat[:, None, :], B, BH, BW)
        bh_bw, rc = BH2 * BW2, rf_k.shape[1]
    else:
        rf_k, mask_k = rays_feat, mask_flat[:, None, :]
        # bound the (ray_chunk x cand_chunk) working set: largest divisor of
        # R_pad that is a multiple of 8 and <= 256
        bh_bw, rc = BH * BW, _pick_rc(R_pad)
    prep = dict(
        rf_k=rf_k, mask_k=mask_k, ids_p=ids_p, gauss_feat=gauss_feat,
        use_pallas=use_pallas, grouped=grouped, bh_bw=bh_bw, rc=rc,
        cand_chunk=cand_chunk, B=B, H=H, W=W, P=P, BH=BH, BW=BW,
        bsh=bsh, bsw=bsw, R=R, R_pad=R_pad,
    )
    # m_min (user per-BIN max_point_per_bin) -> per-supertile units: a 2x2
    # supertile's union can approach 4 bins' disjoint lists (_pick_m_max)
    m_min_st = 4 * m_min if grouped else m_min
    M_max = _pick_m_max(P_pad, bh_bw, cand_chunk, m_min_st)
    # For small scenes the capacity approaches P_pad and the compaction
    # (argsort + gathers + scatter-back) costs more than it saves; stream
    # the global candidate space instead.
    prep["compact"] = use_pallas and 2 * M_max < P_pad
    if prep["compact"]:
        # Per-supertile candidate compaction for the select kernel: the
        # membership of a supertile is Morton-clustered plus scattered
        # neighbor spill; compaction removes the ~4-8x lane inflation from
        # spill fragmentation.  Capacity is static; members beyond it are
        # deterministically dropped (the reference truncates at
        # max_points_per_bin the same way) with the count reported.
        from voge_tpu.ops.pallas_fine2 import compact_candidates

        (prep["table_c"], prep["bits_c"], prep["ids_c"], prep["pos_c"],
         prep["counts_c"], prep["overflow_c"]) = compact_candidates(
            mask_k, gauss_feat, ids_p, M_max, bh_bw,
        )
        prep["m_max"] = M_max
    if use_pallas:
        prep["rays_t"] = jnp.swapaxes(rf_k, 1, 2)
    return prep


def _pick_m_max(
    P_pad: int, bins_per_image: int, cand_chunk: int, m_min: int = 0
) -> int:
    """Static per-supertile candidate capacity: ~8x the mean Gaussians per
    supertile (measured max occupancy is ~4x the mean at the benchmark
    workloads), at least 256, at most all of them.  A user-supplied
    ``max_point_per_bin`` acts as a lower bound (``m_min``) — the escape
    hatch for skewed scenes whose densest supertile exceeds the heuristic
    (the dropped-member count is surfaced either way).  ``m_min`` is in
    PER-SUPERTILE units: callers on the grouped (2x2-bin supertile) paths
    must scale the user's per-BIN ``max_point_per_bin`` by 4 first — a
    supertile's candidate union can approach the disjoint sum of its four
    bins' lists, and the reference contract is that a ``max_point_per_bin``
    covering the densest BIN never truncates (round-3 fix: the occlusion
    parity config overflowed 3229 members through a supertile capacity fed
    with per-bin units).  The floor matters
    for SMALL scenes: every hot kernel (select, fine backward, attribute
    compositing) scans O(K * M_max) candidate rows per supertile, so a
    floor near the real occupancy (256 covers the 1K-Gaussian benchmark's
    measured max of ~125 with 2x margin) roughly halves the whole
    pipeline vs the old 512 floor.

    The USER floor is clamped to the largest capacity that keeps the
    compacted path viable (``2*M_max < P_pad``): a generous per-bin cap
    (e.g. ReasonOcclusion's 1500 on a 6.8K scene, whose densest supertile
    holds 937 members) must not flip the pipeline onto the 2.7x-slower
    global streaming path just to reserve room that is never used.  After
    the clamp a supertile can only truncate if it holds more than ~half of
    ALL Gaussians (surfaced via ``overflow_points``); the HEURISTIC
    component is deliberately not clamped — when it alone reaches P_pad/2
    the scene is small and the global path genuinely wins."""
    target = max(256, 8 * P_pad // max(bins_per_image, 1))
    if os.environ.get("VOGE_M_MAX_MIN"):  # experiment hook (trace time)
        target = max(target, int(os.environ["VOGE_M_MAX_MIN"]))
    if m_min > 0:
        viable = ((P_pad - 1) // 2) // cand_chunk * cand_chunk
        if target < viable:
            m_min = min(int(m_min), viable)
        target = max(target, int(m_min))
    return min(P_pad, _ceil_to(target, cand_chunk))


def _mask_path_select(prep, thr_act, K):
    """Run the selection kernel on prepped tensors; returns (sel, prep)."""
    p = prep
    B, BH, BW, H, W = p["B"], p["BH"], p["BW"], p["H"], p["W"]
    sel_k = _mask_path_select_kern(prep, thr_act, K)
    if p["use_pallas"] and p["grouped"]:
        sel = tuple(_ungroup_supertiles(x, B, BH, BW) for x in sel_k)
    else:
        sel = sel_k
    out = []
    for x in sel:
        out.append(_unbin(x[:, : p["R"], :], B, BH, BW, H, W, p["bsh"], p["bsw"]))
    return tuple(out), prep


def _pick_cand_chunk(P: int) -> int:
    """Candidate chunk width.  With bin-coherent candidate ordering a
    supertile's members cluster into few chunks; the transposed
    (candidate-on-sublane) select kernel has no narrow-width reduction
    penalty, so a narrow chunk that hugs the member clusters wins.
    Measured on v5e: 256 beats 128/512/1024 at both the 10K/256^2 and
    100K/320^2 workloads (14.1 -> 7.0 ms and 101 -> 64 ms vs 1024).  For
    small scenes (P <= 4096) the compacted capacity M_max is itself ~256,
    and a narrower 128-row chunk cuts the K-pass extraction height
    (Kp + chunk) nearly 2x while the prefix visit lists still touch a
    single chunk per supertile."""
    import os
    if os.environ.get("VOGE_CC"):
        return int(os.environ["VOGE_CC"])
    return 128 if P <= 4096 else 256


def _pick_cand_chunk_bwd(P: int) -> int:
    """Chunk width for the lane-major backward / attribute kernels, whose
    per-step costs (match K-loop, column reductions, MXU contractions) favor
    wide chunks.  P_pad is always padded to the lcm of both widths."""
    import os
    if os.environ.get("VOGE_CCB"):
        return int(os.environ["VOGE_CCB"])
    return 1024


def _mask_path_select_kern(prep, thr_act, K, agg_ow=None, return_raw=False,
                           return_hitmask=False):
    """Selection in KERNEL layout (grouped supertiles on TPU): returns the
    4-tuple (sel_idx, sel_len, sel_act, sel_dsd), each (nst, R_kern, K) —
    plus the fused erf-compositing weights as a 5th element when ``agg_ow``
    is set (in-kernel on TPU, XLA math on the fallback).  With
    ``return_raw`` (TPU only) returns (sel, raw) where raw is the kernel's
    native transposed (nst, Kp, R_kern) (len, act, dsd, w) buffers for the
    fold backward.  With ``return_hitmask`` additionally returns the
    per-(bin, chunk) hit bitmap (None on the XLA fallback) for
    hit-restricted backward visit lists."""
    from voge_tpu.ops.pallas_fine2 import (
        fine_select_compact_pallas,
        prefix_visit_lists,
    )

    p = prep
    if p.get("compact"):
        csel, counts = prefix_visit_lists(
            p["counts_c"], p["m_max"], p["cand_chunk"]
        )
        G = p["mask_k"].shape[1]
        return fine_select_compact_pallas(
            p["rays_t"], p["table_c"], p["bits_c"], p["ids_c"], csel, counts,
            thr_act, K, sub_bins=G, ray_chunk=p["rc"],
            cand_chunk=p["cand_chunk"], per_bin_cand=True, agg_ow=agg_ow,
            return_raw=return_raw, return_hitmask=return_hitmask,
        )
    if p["use_pallas"]:
        from voge_tpu.ops.pallas_fine2 import fine_select_mask_pallas

        return fine_select_mask_pallas(
            p["rf_k"], p["gauss_feat"], p["mask_k"], p["ids_p"], thr_act, K,
            bh_bw=p["bh_bw"], n_gauss=p["P"], ray_chunk=p["rc"],
            cand_chunk=p["cand_chunk"], agg_ow=agg_ow, return_raw=return_raw,
            return_hitmask=return_hitmask,
        )
    sel = _xla_select_mask(
        p["rf_k"], p["gauss_feat"], p["mask_k"][:, 0, :], p["ids_p"],
        thr_act, K, p["bh_bw"], p["P"],
    )
    if agg_ow is not None:
        from voge_tpu.aggregation import weights_from_sel

        sel = sel + (weights_from_sel(sel[1], sel[2], sel[3], agg_ow),)
    out = (sel,)
    if return_raw:
        out = out + (None,)
    if return_hitmask:
        out = out + (None,)
    return out if len(out) > 1 else sel


def unbin_kern(x, B, BH, BW, H, W, bsh, bsw, grouped):
    """Kernel layout (nst, R_kern, K) -> image layout (B, H, W, K)."""
    if grouped:
        x = _ungroup_supertiles(x, B, BH, BW)
    return _unbin(x[:, : bsh * bsw, :], B, BH, BW, H, W, bsh, bsw)


def _is_grouped(BH, BW, K):
    return (
        jax.default_backend() == "tpu" and BH * BW > 1 and _kern_k_ok(K)
    )


def _fold_weight_cotangent(g, sel_lad, agg_ow):
    """Fold the fused-aggregation weight cotangent into the selection
    cotangents: dL/dw flows into (len, act, dsd) through the erf
    compositing math (``aggregation.weights_from_sel``).

    Two implementations:
      - ``sel_lad`` of 4 arrays (TPU): the select kernel's native
        transposed (nb, Kp, R_pad) (len, act, dsd, w) buffers; the fold
        runs as the analytic transposed Pallas kernel
        (:func:`voge_tpu.ops.pallas_fine2.fold_weights_pallas`) with one
        boundary transpose for g_w in and three for the deltas out — the
        ``jax.vjp``-of-``weights_from_sel`` XLA formulation materializes
        [..., K, K] erf/exp tensors (~2.9 ms of the 1K workload).
      - ``sel_lad`` of 3 arrays (XLA fallback path, ray-major): the exact
        XLA vjp, rematerialized from the saved primals (the same recompute
        ``jax.checkpoint`` did when aggregation ran as a separate pass).
    """
    g_idx, g_len, g_act, g_dsd, g_w = g
    if len(sel_lad) == 4:
        from voge_tpu.ops.pallas_fine2 import fold_weights_pallas

        l_t, a_t, d_t, w_t = sel_lad
        K = g_len.shape[-1]
        Kp = l_t.shape[1]
        gw_t = jnp.swapaxes(g_w, 1, 2)
        if Kp > K:
            gw_t = jnp.pad(gw_t, ((0, 0), (0, Kp - K), (0, 0)))
        dl_t, da_t, dd_t = fold_weights_pallas(
            l_t, a_t, d_t, w_t, gw_t, float(agg_ow), K
        )
        t = lambda x: jnp.swapaxes(x, 1, 2)[:, :, :K]
        return (g_idx, g_len + t(dl_t), g_act + t(da_t), g_dsd + t(dd_t))

    from voge_tpu.aggregation import weights_from_sel

    sel_len, sel_act, sel_dsd = sel_lad
    _, vjp = jax.vjp(
        lambda l, a, d: weights_from_sel(l, a, d, agg_ow),
        sel_len, sel_act, sel_dsd,
    )
    dl, da, dd = vjp(g_w)
    return (g_idx, g_len + dl, g_act + da, g_dsd + dd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _rt_fine_kern(mus, isigmas, rays, mask, ids, thr_act, bin_size, K,
                  m_min=0, agg_ow=None):
    """Fine selection with the custom-VJP boundary at KERNEL layout: callers
    (renderer) run aggregation in this layout and unbin once for Fragments,
    so backward cotangents arrive without any re-binning shuffles.  With
    ``agg_ow`` the erf compositing is fused into the select kernel and the
    weights come back as a 5th selection element (backward folds the weight
    cotangent into the analytic selection cotangents via the XLA math).

    :return: (sel, aux) — aux is the compacted candidate context
        (ids_c, pos_c, counts_c, overflow_c) on the Pallas path (consumed by
        the fused attribute kernels; overflow_c is the per-supertile dropped
        member count), else None.
    """
    prep = _mask_path_prep(mus, isigmas, rays, mask, ids, bin_size, m_min,
                           K=K)
    sel = _mask_path_select_kern(prep, thr_act, K, agg_ow)
    aux = (
        (prep["ids_c"], prep["pos_c"], prep["counts_c"], prep["overflow_c"])
        if prep.get("compact") else None
    )
    return sel, aux


def _rt_fine_kern_fwd(mus, isigmas, rays, mask, ids, thr_act, bin_size, K,
                      m_min=0, agg_ow=None):
    prep = _mask_path_prep(mus, isigmas, rays, mask, ids, bin_size, m_min,
                           K=K)
    want_raw = agg_ow is not None and prep["use_pallas"]
    want_hm = bool(prep["use_pallas"])
    out = _mask_path_select_kern(prep, thr_act, K, agg_ow,
                                 return_raw=want_raw,
                                 return_hitmask=want_hm)
    raw = hm = None
    if want_hm:
        out, hm = out[:-1], out[-1]
        if want_raw:
            out, raw = out
        elif len(out) == 1:
            out = out[0]
    elif want_raw:
        out, raw = out
    aux = (
        (prep["ids_c"], prep["pos_c"], prep["counts_c"], prep["overflow_c"])
        if prep.get("compact") else None
    )
    # Save the kernel-ready tensors: rebuilding the grouped ray features /
    # compacted candidate table costs ms of pure layout work at 256^2.
    # mode is distinguished by arity (strings are not valid residual
    # leaves); both Pallas modes append the fwd hit bitmap so the backward
    # can restrict its chunk visits to hit-producing chunks
    if prep.get("compact"):
        saved = (prep["rf_k"], prep["table_c"], prep["ids_c"],
                 prep["pos_c"], prep["counts_c"], hm)
    elif prep["use_pallas"]:
        saved = (prep["rf_k"], prep["mask_k"], prep["ids_p"],
                 prep["gauss_feat"], hm)
    else:
        saved = None
    # fused-aggregation path: keep the selection primals for the fold bwd —
    # on TPU the kernel-native transposed (len, act, dsd, w) buffers (free
    # aliases of the outputs), on the XLA path the ray-major (l, a, d)
    if agg_ow is None:
        sel_lad = None
    else:
        # raw is (idx, l, a, d, w) kernel-native; the fold consumes (l, a,
        # d, w)
        sel_lad = raw[1:5] if raw is not None else tuple(out[1:4])
    return (out, aux), (mus, isigmas, rays, out[0], mask, ids, saved, sel_lad)


def _ray_trace_fine_mask(mus, isigmas, rays, mask, ids, thr_act, bin_size, K,
                         agg_ow=None, m_min=0):
    """Image-layout interface over :func:`_rt_fine_kern` (legacy/tests)."""
    sel_k, _aux = _rt_fine_kern(
        mus, isigmas, rays, mask, ids, thr_act, bin_size, K, m_min, agg_ow
    )
    B, H, W, _ = rays.shape
    _, BH, BW, _ = mask.shape
    bsh, bsw = bin_size
    grouped = _is_grouped(BH, BW, K)
    return tuple(
        unbin_kern(x, B, BH, BW, H, W, bsh, bsw, grouped) for x in sel_k
    )


def _bin_hwk(x: jax.Array, BH, BW, bsh, bsw, H, W, R_pad, pad_value):
    """(B, H, W, K) -> (nb, R_pad, K) with the renderer's bin layout."""
    B, _, _, K = x.shape
    x = jnp.pad(
        x, ((0, 0), (0, BH * bsh - H), (0, BW * bsw - W), (0, 0)),
        constant_values=pad_value,
    )
    x = x.reshape(B, BH, bsh, BW, bsw, K).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B * BH * BW, bsh * bsw, K)
    R = bsh * bsw
    if R_pad > R:
        x = jnp.pad(x, ((0, 0), (0, R_pad - R), (0, 0)), constant_values=pad_value)
    return x


def _group_supertiles(x: jax.Array, B: int, BH: int, BW: int):
    """(B*BH*BW, R, ...) -> (B*BH2*BW2, 4*R, ...) grouping 2x2 bins per
    supertile (padding odd bin grids; padded bins get zeros).

    :return: (grouped, BH2, BW2)
    """
    nb, R = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
    x = x.reshape((B, BH, BW) + (R,) + rest)
    x = jnp.pad(
        x,
        ((0, 0), (0, 2 * BH2 - BH), (0, 2 * BW2 - BW))
        + ((0, 0),) * (1 + len(rest)),
    )
    x = x.reshape((B, BH2, 2, BW2, 2, R) + rest)
    x = jnp.moveaxis(x, 3, 2)  # (B, BH2, BW2, 2, 2, R, ...)
    return x.reshape((B * BH2 * BW2, 4 * R) + rest), BH2, BW2


def _ungroup_supertiles(x: jax.Array, B: int, BH: int, BW: int):
    """Inverse of :func:`_group_supertiles`: (B*BH2*BW2, 4*R, ...) ->
    (B*BH*BW, R, ...)."""
    BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
    nst, R4 = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    R = R4 // 4
    x = x.reshape((B, BH2, BW2, 2, 2, R) + rest)
    x = jnp.moveaxis(x, 2, 3)  # (B, BH2, 2, BW2, 2, R, ...)
    x = x.reshape((B, 2 * BH2, 2 * BW2, R) + rest)
    return x[:, :BH, :BW].reshape((B * BH * BW, R) + rest)


def _pick_rc(R_pad: int) -> int:
    """Largest divisor of R_pad that is a multiple of 8 and <= 256."""
    if R_pad <= 256:
        return R_pad
    for cand in range(256, 7, -8):
        if R_pad % cand == 0:
            return cand
    return 8


def _pick_rc_bwd(R_pad: int, K: int, cand_chunk: int) -> int:
    """Ray-chunk width for the unified backward kernels.  The K-unrolled
    match loop holds ~K (ray_chunk, cand_chunk) one-hot temporaries live in
    VMEM; keep that under ~45 MB (128 MB VMEM minus I/O windows and the
    coefficient/form arrays).  Full tile when it fits — measured fastest at
    the 10K/256^2 workload is rc=512 (42 MB at K=20, cc=1024); K=60 at
    400^2 OOMs beyond rc=256."""
    budget_elems = 45_000_000 // 4
    cap = max(64, budget_elems // max(K * cand_chunk, 1))
    if R_pad <= cap:
        return R_pad
    best = 8
    for cand in range(8, R_pad + 1, 8):
        if R_pad % cand == 0 and cand <= cap:
            best = cand
    return best


def _rt_fine_kern_bwd(thr_act, bin_size, K, m_min, agg_ow, res, g):
    mus, isigmas, rays, sel_idx_k, mask, ids, saved, sel_lad = res
    g = g[0]  # aux outputs are integer-valued (float0 cotangents)
    if agg_ow is not None:
        g = _fold_weight_cotangent(g, sel_lad, agg_ow)
    B, P = mus.shape[0], mus.shape[1]
    g_mask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    g_ids = np.zeros(ids.shape, dtype=jax.dtypes.float0)
    _, BH, BW, _ = mask.shape
    bsh, bsw = bin_size
    H, W = rays.shape[1], rays.shape[2]
    grouped = _is_grouped(BH, BW, K)

    if jax.default_backend() == "tpu" and saved is not None:
        from voge_tpu.ops.pallas_bwd import (
            fine_bwd_compact_pallas,
            fine_bwd_unified_pallas,
        )

        # cotangents arrive in kernel layout — no re-binning needed
        _, g_len_k, g_act_k, g_dsd_k = g
        R_pad = _ceil_to(bsh * bsw, 8)
        args = (sel_idx_k, g_len_k, g_act_k, g_dsd_k)
        rays_feat = saved[0]
        if grouped:
            rc = rays_feat.shape[1]
        else:
            rc = _pick_rc(R_pad)
        if len(saved) == 6:
            rays_feat, table_c, ids_c, pos_c, counts_c, hm = saved
            M_max = table_c.shape[1]
            cc_opts = [c for c in (1024, 512, 256, 128) if M_max % c == 0]
            cc = max(cc_opts) if cc_opts else M_max
            cc_align = max(_pick_cand_chunk(P), _pick_cand_chunk_bwd(P))
            P_pad = _ceil_to(max(P, cc_align), cc_align)
            gg, rb = fine_bwd_compact_pallas(
                rays_feat, table_c, ids_c, pos_c, counts_c, *args,
                K=K, B=B, P_pad=P_pad,
                ray_chunk=_pick_rc_bwd(rc, K, cc), cand_chunk=cc,
                hitmask=None if hm is None else (hm, _pick_cand_chunk(P)),
            )
        else:
            rays_feat, mask_k, ids_p, gauss_feat, hm = saved
            if grouped:
                BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
                bh_bw = BH2 * BW2
            else:
                bh_bw = BH * BW
            cc_bwd = _pick_cand_chunk_bwd(P)
            kw = dict(
                thr_act=thr_act, K=K, bh_bw=bh_bw, n_gauss=P,
                ray_chunk=_pick_rc_bwd(rc, K, cc_bwd), cand_chunk=cc_bwd,
                hitmask=None if hm is None else (hm, _pick_cand_chunk(P)),
            )
            if gauss_feat.shape[2] <= _UNIFIED_BWD_MAX_PPAD:
                gg, rb = fine_bwd_unified_pallas(
                    rays_feat, gauss_feat, mask_k, ids_p, *args, **kw
                )
            else:
                # the unified kernel's full-width (FEAT, P_pad) VMEM output
                # block would blow the VMEM budget; run the two-kernel pair
                from voge_tpu.ops.pallas_bwd import (
                    fine_bwd_gauss_pallas,
                    fine_bwd_rays_pallas,
                )

                gg = fine_bwd_gauss_pallas(
                    rays_feat, gauss_feat, mask_k, ids_p, *args, **kw
                )
                rb = fine_bwd_rays_pallas(
                    rays_feat, gauss_feat, mask_k, ids_p, *args, **kw
                )
        grad_mus = jnp.stack([gg[:, i, :P] for i in range(3)], axis=-1)
        grad_isg = jnp.stack(
            [gg[:, 3 + q, :P] for q in range(9)], axis=-1
        ).reshape(B, P, 3, 3)
        grad_rays = unbin_kern(
            rb[..., 0:3], B, BH, BW, H, W, bsh, bsw, grouped
        )
        return grad_mus, grad_isg, grad_rays, g_mask, g_ids

    # CPU fallback: unbin the kernel-layout selections/cotangents, then run
    # the entry-space backward.  sel_idx stores ORIGINAL global ids while the
    # feature table is in candidate (possibly sorted) order; translate via
    # the inverse of the ids permutation (identity when no reordering).
    sel_idx = unbin_kern(sel_idx_k, B, BH, BW, H, W, bsh, bsw, grouped)
    g_img = (None,) + tuple(
        unbin_kern(x, B, BH, BW, H, W, bsh, bsw, grouped) for x in g[1:]
    )
    # argsort inverts the permutation without a scatter: a scatter whose
    # indices and updates share one producer (two iotas here) crashes the
    # TPU fusion pass (scatter_emitter.cc ShouldFuseInputIntoScatter check)
    inv = jnp.argsort(ids.reshape(-1)).astype(jnp.int32)
    sel_pos = jnp.where(sel_idx >= 0, inv[jnp.where(sel_idx >= 0, sel_idx, 0)], -1)
    grad_mus, grad_isg, grad_rays, _ = _ray_trace_fine_bwd(
        thr_act, bin_size, K,
        (mus.reshape(-1, 3), isigmas.reshape(-1, 3, 3), rays, sel_pos, mask),
        g_img,
    )
    return (
        grad_mus.reshape(B, P, 3),
        grad_isg.reshape(B, P, 3, 3),
        grad_rays,
        g_mask,
        g_ids,
    )


_rt_fine_kern.defvjp(_rt_fine_kern_fwd, _rt_fine_kern_bwd)


def _rt_fine_compact_impl(mus, isigmas, rays, pos_c, bits_c, ids_c,
                          counts_c, thr_act, bin_size, K, agg_ow=None,
                          return_raw=False, rf_c=None, attr_planes=None):
    """Primal for the pre-compacted fine selection: gather the candidate
    feature table by ``pos_c`` and run the streaming select kernel.  Returns
    (sel4 kernel-layout, residual tensors).  ``rf_c``, when given, is the
    precomputed (nb, R_pad, FEAT) kernel-layout ray-feature planes (they
    are camera-static; building them costs ~1 ms per step at 256² and XLA
    cannot hoist it out of a fitting loop's jitted step).

    ``attr_planes`` (B, Ca, P_pad): attribute planes in candidate order —
    the attribute columns ride the packed table gather and the attribute
    image comes out of the select kernel as a 6th element (nb, Ca, R_pad),
    replacing the separate ``interpolate_attr`` kernel chain (its gather of
    the same rows, its own id-match pass, and one of the two backward
    scatter-backs)."""
    from voge_tpu.ops.pallas_fine2 import (
        fine_select_compact_pallas,
        prefix_visit_lists,
    )

    B, P = mus.shape[0], mus.shape[1]
    nb, M_max = pos_c.shape
    nst = nb // B
    n_attr = 0 if attr_planes is None else int(attr_planes.shape[1])
    cc = _pick_cand_chunk(P)
    cc_align = max(cc, _pick_cand_chunk_bwd(P))
    P_pad = _ceil_to(max(P, cc_align), cc_align)

    gauss_feat = _gauss_feature_planes_batched(mus, isigmas)
    if P_pad > P:
        gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
    if n_attr:
        assert attr_planes.shape[2] == P_pad, (attr_planes.shape, P_pad)
        gauss_feat = jnp.concatenate([gauss_feat, attr_planes], axis=1)
    featw = FEAT + n_attr
    table = jnp.swapaxes(gauss_feat, 1, 2).reshape(B * P_pad, featw)
    img_row = jnp.arange(nb, dtype=jnp.int32)[:, None] // nst
    table_c = table[(img_row * P_pad + pos_c).reshape(-1)].reshape(
        nb, M_max, featw
    )

    if rf_c is None:
        _, H, W, _ = rays.shape
        bsh, bsw = bin_size
        BH = (H - 1) // bsh + 1
        BW = (W - 1) // bsw + 1
        rays_feat, _R, _R_pad = _rays_features(rays, BH, BW, bsh, bsw)
        rf_k, _, _ = _group_supertiles(rays_feat, B, BH, BW)
    else:
        rf_k = rf_c
    rays_t = jnp.swapaxes(rf_k, 1, 2)
    csel, cnts = prefix_visit_lists(counts_c, M_max, cc)
    sel = fine_select_compact_pallas(
        rays_t, table_c, bits_c, ids_c, csel, cnts, thr_act, K,
        sub_bins=4, ray_chunk=rf_k.shape[1], cand_chunk=cc,
        per_bin_cand=True, agg_ow=agg_ow, return_raw=return_raw,
        n_attr=n_attr, return_hitmask=return_raw,
    )
    if return_raw:
        sel, raw, hm = sel
        return sel, (rf_k, table_c), raw, (hm, cc)
    return sel, (rf_k, table_c)


@partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _rt_fine_kern_c(mus, isigmas, rays, pos_c, bits_c, ids_c, counts_c,
                    dst_l, dst_g, gpos, g_valid, rf_c, attr_p,
                    thr_act, bin_size, K, agg_ow=None, cam_grad=True):
    """Fine selection over emission-compacted candidates (KERNEL layout).

    The coarse stage (``emit_supertile_candidates``) runs *outside* this
    custom-VJP boundary — it is discrete selection, non-differentiable by
    construction (like the reference's ``_RasterizeCoarse``,
    ``RayTracing.py:147-151``); gradients flow through the gathered feature
    table only.  ``dst_l``/``dst_g``/``gpos``/``g_valid`` are the inverse
    emission mapping (``emit_supertile_candidates(return_dst=True)``): the
    backward gathers each Gaussian's gradient rows from its <= 9 compacted
    slots instead of a segment_sum scatter over all nb*M_max rows.

    ``cam_grad=False`` declares the camera rays non-differentiated (a
    fitting loop over fixed cameras): the backward runs the single-output
    "gauss" kernel and returns zero ray gradients — the per-ray row
    reductions and their output traffic are skipped entirely (one fused
    pallas_call cannot be dead-code-eliminated by XLA).

    ``attr_p`` ((B, Ca, P_pad) or None): attribute planes for the FUSED
    attribute compositing — the columns ride the table gather, the image
    (nb, Ca, R_pad, transposed) is returned as a 6th selection element,
    and the backward computes d_attr inside the unified kernel (reference
    chain ``Aggregation.py:111-141`` fused with ``ray_trace_voge.cu``)."""
    return _rt_fine_compact_impl(
        mus, isigmas, rays, pos_c, bits_c, ids_c, counts_c, thr_act,
        bin_size, K, agg_ow, rf_c=rf_c, attr_planes=attr_p,
    )[0]


def _rt_fine_kern_c_fwd(mus, isigmas, rays, pos_c, bits_c, ids_c, counts_c,
                        dst_l, dst_g, gpos, g_valid, rf_c, attr_p,
                        thr_act, bin_size, K, agg_ow=None, cam_grad=True):
    out = _rt_fine_compact_impl(
        mus, isigmas, rays, pos_c, bits_c, ids_c, counts_c, thr_act,
        bin_size, K, agg_ow, return_raw=True, rf_c=rf_c, attr_planes=attr_p,
    )
    sel, saved, raw, hitmask = out
    rf_k, table_c = saved
    # Residuals: the select kernel's native TRANSPOSED (nb, Kp, R) buffers
    # (idx, len, act, dsd[, w]) — free aliases of the outputs — feed the
    # fully transposed backward kernel (pallas_bwd.fine_bwd_compact_t_
    # pallas): fold, entry-space chain rule, and slot match all run with
    # slots on SUBLANES.  (The previous ray-major in-kernel fold alone
    # cost ~2.7 ms of the 10K backward's 5.1 — K=20 on the lane dim is 84%
    # lane waste plus cross-lane reduction tails; tools/kernel_bench3.py.)
    rays_t = jnp.swapaxes(rf_k, 1, 2)
    res = (mus, isigmas, rays.shape, pos_c, bits_c, ids_c, counts_c,
           dst_l, dst_g, gpos, g_valid, rf_c, attr_p, rays_t, table_c, raw,
           hitmask)
    return sel, res


def _rt_fine_kern_c_bwd(thr_act, bin_size, K, agg_ow, cam_grad, res, g):
    from voge_tpu.ops.pallas_bwd import fine_bwd_compact_t_pallas

    (mus, isigmas, rays_shape, pos_c, bits_c, ids_c, counts_c,
     dst_l, dst_g, gpos_g, g_valid, rf_c, attr_p, rays_t, table_c,
     raw, hitmask) = res
    Kp = raw[0].shape[1]
    n_attr = 0 if attr_p is None else int(attr_p.shape[1])

    def t_pad(x):
        x = jnp.swapaxes(x, 1, 2)
        if Kp > K:
            x = jnp.pad(x, ((0, 0), (0, Kp - K), (0, 0)))
        return x

    g_img_t = None
    if n_attr:
        _, g_len_k, g_act_k, g_dsd_k, g_w_k, g_img_t = g
        g_t = (t_pad(g_len_k), t_pad(g_act_k), t_pad(g_dsd_k), t_pad(g_w_k))
    elif agg_ow is not None:
        _, g_len_k, g_act_k, g_dsd_k, g_w_k = g
        g_t = (t_pad(g_len_k), t_pad(g_act_k), t_pad(g_dsd_k), t_pad(g_w_k))
    else:
        _, g_len_k, g_act_k, g_dsd_k = g
        g_t = (t_pad(g_len_k), t_pad(g_act_k), t_pad(g_dsd_k))
    B, P = mus.shape[0], mus.shape[1]
    _, H, W, _ = rays_shape
    bsh, bsw = bin_size
    BH = (H - 1) // bsh + 1
    BW = (W - 1) // bsw + 1
    M_max = table_c.shape[1]
    cc_opts = [c for c in (1024, 512, 256, 128) if M_max % c == 0]
    cc = max(cc_opts) if cc_opts else M_max
    cc_align = max(_pick_cand_chunk(P), _pick_cand_chunk_bwd(P))
    P_pad = _ceil_to(max(P, cc_align), cc_align)
    gg, rb_t = fine_bwd_compact_t_pallas(
        rays_t, table_c, ids_c, counts_c, raw, g_t,
        K=K, cand_chunk=cc,
        dst=(dst_l, dst_g, gpos_g, g_valid), B=B, P_pad=P_pad,
        agg_ow=0.0 if agg_ow is None else float(agg_ow),
        mode="both" if cam_grad else "gauss",
        n_attr=n_attr, g_img_t=g_img_t, hitmask=hitmask,
    )
    grad_mus = jnp.stack([gg[:, i, :P] for i in range(3)], axis=-1)
    grad_isg = jnp.stack(
        [gg[:, 3 + q, :P] for q in range(9)], axis=-1
    ).reshape(B, P, 3, 3)
    if cam_grad:
        rb = jnp.swapaxes(rb_t, 1, 2)
        grad_rays = unbin_kern(rb[..., 0:3], B, BH, BW, H, W, bsh, bsw, True)
    else:
        grad_rays = jnp.zeros(rays_shape, jnp.float32)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    # rf_c is documented camera-static (a cache of f(rays)); its cotangent
    # is zero — camera gradients flow through the ``rays`` argument
    g_rf_c = None if rf_c is None else jnp.zeros_like(rf_c)
    g_attr = None if attr_p is None else gg[:, FEAT:FEAT + n_attr, :]
    return (grad_mus, grad_isg, grad_rays,
            f0(pos_c), f0(bits_c), f0(ids_c), f0(counts_c),
            f0(dst_l), f0(dst_g), f0(gpos_g), f0(g_valid), g_rf_c, g_attr)


_rt_fine_kern_c.defvjp(_rt_fine_kern_c_fwd, _rt_fine_kern_c_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def ray_tracing_fine(
    mus: jax.Array, isigmas: jax.Array, rays: jax.Array,
    bin_points: jax.Array, thr: float, bin_size: Union[int, Tuple[int, int]],
    n_assign: int, inf: float = 1e10,
):
    """Binned fine ray tracing (reference ``RayTracing.py:76-95``).

    :param mus: (P, 3) camera-centered means, flattened over batch
    :param isigmas: (P, 3, 3)
    :param rays: (B, H, W, 3) unit world directions
    :param bin_points: (B, BH, BW, M) candidate indices into the flattened
        Gaussian axis, -1-padded
    :param thr: activation threshold (``thr_act = -log(thr + 1/inf)``)
    :return: (sel_idx, sel_len, sel_act, sel_dsd), each (B, H, W, K)
    """
    assert isigmas.ndim == 3 and mus.ndim == 2
    assert rays.ndim == 4 and bin_points.ndim == 4
    assert mus.shape[0] == isigmas.shape[0] and mus.shape[1] == 3
    thr_act = -math.log(thr + 1.0 / inf)
    if isinstance(bin_size, int):
        bin_size = (bin_size, bin_size)
    return _ray_trace_fine(
        mus, isigmas, rays, bin_points, float(thr_act), tuple(bin_size),
        int(n_assign),
    )


def production_bin_geometry(
    image_size, n_assign: int, n_points: int,
    bin_size: Optional[int], max_points_per_bin: Optional[int],
):
    """The bin geometry :func:`ray_tracing` will use — factored out so the
    camera-context precompute (:func:`voge_tpu.renderer.
    precompute_camera_ctx`) cannot drift from the dispatcher's choice.

    TPU default geometry for small / no-coarse scenes: 16-pixel bins make
    each 2x2-bin supertile exactly 4*256 = 1024 lanes (the reference's
    bin_size=10 floor leaves 416 of 512 lanes used, a 23% per-ray tax in
    EVERY kernel) and quarter the grid-step count.  Culling selectivity
    matters more than padding for big scenes (measured 10K/256^2: bin 16
    is 13% slower; 1K: 35% faster), so large-P scenes keep the reference
    heuristic.  Results are bin-geometry independent (no truncation; see
    the no-coarse regression test), so this is purely a schedule choice.

    Big-K configs (n_assign >= 40) get SMALL 8-pixel bins instead: the
    K-pass extraction/match loops cost ~ pixels x chunks-per-supertile x K,
    and the reference-heuristic bins (16 at 400^2, 32 at 672-wide) leave
    those configs 4-16 candidate chunks deep per supertile.  Measured
    (tools/bin_sweep2.py, round 5): ExtractTexture 142 -> 21.8 ms,
    ReasonOcclusion 56.9 -> 46.4 ms; the K=20 headline is ~1 chunk deep
    already and measured flat across bins (tools/bin_sweep.py), so it
    keeps the reference heuristic.  A user ``max_points_per_bin`` is a
    capacity floor in units of the REFERENCE bin's area; when the chosen
    bin differs it is scaled by the area ratio (same density cap), else a
    1500-cap at 16-px bins would force a 16x oversized compacted table at
    8-px bins.

    Caveat (ADVICE round-4): the coarse emission stage statically picks a
    2x2 supertile window for P > 4096 (vs 3x3 below), assuming dense
    scenes carry per-Gaussian footprints under ~one supertile.  A dense
    scene whose radii exceed that (huge sigmas at low thr) routes the
    wide Gaussians through the exact-but-capped global path; the cap is
    surfaced per render via ``Fragments.overflow_points`` — if it reports
    drops, pass a larger ``bin_size`` (growing the supertile) rather than
    relying on the default geometry."""
    bin_size_cfg, mppb = coarse_bin_config(
        image_size, n_assign, n_points, bin_size, max_points_per_bin
    )
    if (
        bin_size is None
        and jax.default_backend() == "tpu"
        and _kern_k_ok(n_assign)
    ):
        ref_bin = bin_size_cfg
        if n_assign >= 40 and mppb != -1:
            bin_size_cfg = 8
        elif n_points <= 4096 or mppb == -1:
            bin_size_cfg = max(bin_size_cfg, 16)
        if (
            bin_size_cfg != ref_bin
            and max_points_per_bin is not None and max_points_per_bin > 0
        ):
            mppb = max(64, int(mppb * (bin_size_cfg / ref_bin) ** 2))
    return bin_size_cfg, mppb


def ray_tracing(
    cameras_or_params, points: jax.Array, isigmas: jax.Array,
    rays: jax.Array, image_size, thr: float, n_assign: int,
    bin_size: Optional[int] = None, max_points_per_bin: Optional[int] = None,
    return_ctx: bool = False,
    agg_ow=None,
    rf_cache=None,
    camera_grad: bool = True,
    return_overflow: bool = False,
    attrs=None,
    **kwargs,
):
    """Coarse + fine dispatcher (reference ``RayTracing.py:12-30``).

    ``return_overflow=True`` (ignored under ``return_ctx``, whose ctx
    carries the same counter) returns ``(sel, overflow)`` with ``sel`` in
    image layout on every dispatch path — the scalar total of candidate
    memberships dropped by a capacity-limited coarse stage (the sharded
    renderer propagates it through ``shard_map``).

    :param cameras_or_params: a :class:`voge_tpu.cameras.PerspectiveCameras`
        or a tuple ``(R, T, focal, principal)`` of arrays
    :param points: (B, P, 3) camera-centered means
    :param isigmas: (B, P, 3, 3)
    :param rays: (B, H, W, 3)
    :param agg_ow: occupation weight — when set, the erf compositing is
        fused into the selection (in-kernel on TPU) and the per-slot
        weights are returned as a 5th selection element
    :param rf_cache: precomputed ray-feature planes from
        :func:`voge_tpu.renderer.precompute_camera_ctx` — ray features are
        camera-static, and XLA cannot hoist their ~1 ms construction out of
        a fitting loop's jitted step; the cache must have been built for
        the SAME camera/image/bin geometry (checked)
    """
    if isinstance(cameras_or_params, tuple):
        R, T, focal, principal = cameras_or_params
    else:
        cams = cameras_or_params
        R, T, focal, principal = cams.batched_params(points.shape[0])

    B, P = points.shape[0], points.shape[1]
    bin_size_cfg, mppb = production_bin_geometry(
        image_size, n_assign, P, bin_size, max_points_per_bin
    )
    H, W = int(image_size[0]), int(image_size[1])
    inf = 1e10
    thr_act = -math.log(thr + 1.0 / inf)

    # Production path: per-(bin, Gaussian) membership MASK instead of
    # compacted candidate lists — no scatter, no per-bin gathers; the
    # streaming Pallas kernel (or the XLA fallback) applies the mask
    # directly.  Note: unlike the reference, candidate sets are never
    # truncated at max_points_per_bin (the reference's overflow behavior is
    # a nondeterministic silent drop, rasterize_coarse.cu:154-170; without
    # overflow the selections are identical).
    base_ids = (
        jnp.arange(P, dtype=jnp.int32)[None, :]
        + (jnp.arange(B, dtype=jnp.int32) * P)[:, None]
    )
    if mppb == -1:
        # No-coarse: every Gaussian is a candidate for every pixel (the
        # reference's all-points index tensor, RayTracing.py:22-26) — no
        # TRUNCATION ever (m_min = P below keeps every capacity at P).  On
        # TPU the candidate stream still rides the STANDARD bin grid: a
        # single whole-image bin makes R_pad = H*W, and the fused attribute
        # kernels (pallas_attr) hold (R_pad, K)/(R_pad, Ca) blocks in VMEM
        # — 128x128 no-coarse would need ~300 MB.  Binned geometry keeps
        # every kernel at its proven block shapes.  The streamed mask is
        # the exact bbox-overlap CULLING mask (round 5; previously
        # all-ones): a candidate outside a bin's thr-level ellipse bound
        # cannot pass the in-kernel activation test for any of the bin's
        # rays, so masked-off chunks are provably selection-free and the
        # visit lists / extraction gates skip them — a mask, not a
        # capacity list, so nothing can truncate (the -1 contract).
        # Morton-sorting the candidates clusters each supertile's members
        # into few chunks (same as the small-scene coarse path).
        if jax.default_backend() == "tpu" and _kern_k_ok(n_assign):
            from voge_tpu.ops.coarse import overlap_mask

            BH = (H - 1) // bin_size_cfg + 1
            BW = (W - 1) // bin_size_cfg + 1
            points, isigmas, ids, perm = _sort_bin_coherent(
                R, T, focal, principal, points, isigmas, (H, W),
                bin_size_cfg, base_ids,
            )
            mask = overlap_mask(
                R, T, focal, principal, points, isigmas, (H, W), thr,
                bin_size_cfg,
            )
            eff_bin = (bin_size_cfg, bin_size_cfg)
        else:
            # CPU / large-K: dense XLA select over one whole-image bin
            mask = jnp.ones((B, 1, 1, P), dtype=jnp.int8)
            eff_bin = (H, W)
            ids, perm = base_ids, None
    elif jax.default_backend() != "tpu" or not _kern_k_ok(n_assign):
        # CPU/fallback with culling (also the TPU large-K dense dispatch):
        # the compacted-list gather path bounds
        # the dense hit tensors at (bins, R, max_points_per_bin) instead of
        # (bins, R, P).  (Reference truncation semantics apply on overflow;
        # unlike the reference's device printf the dropped-candidate count
        # is surfaced through the ctx.)
        bin_points, counts = rasterize_coarse(
            R, T, focal, principal, points, isigmas, (H, W), thr,
            bin_size_cfg, mppb, return_counts=True, **kwargs,
        )
        sel = ray_tracing_fine(
            points.reshape(-1, 3), isigmas.reshape(-1, 3, 3), rays,
            bin_points, thr, (bin_size_cfg, bin_size_cfg), n_assign,
        )
        if agg_ow is not None:
            from voge_tpu.aggregation import weights_from_sel

            sel = tuple(sel) + (
                weights_from_sel(sel[1], sel[2], sel[3], agg_ow),
            )
        overflow = jnp.maximum(counts - mppb, 0).astype(jnp.int32)
        if not return_ctx:
            if return_overflow:
                return sel, jnp.sum(overflow).astype(jnp.int32)
            return sel
        return sel, dict(overflow=overflow)
    else:
        from voge_tpu.ops.coarse import (
            emit_supertile_candidates,
            overlap_mask,
        )

        # mppb is the (possibly bin-area-rescaled) capacity floor from
        # production_bin_geometry — NOT the raw user value, which is in
        # reference-bin units.  The floor applies only when the USER set
        # max_points_per_bin: extending it to the reference heuristic
        # (i.e., statically guaranteeing the reference's no-truncate
        # envelope everywhere) was measured at +10 ms on the 10K headline
        # — the coarse key extraction, the table gather and the kernels'
        # static chunk axes all scale with M_max (DESIGN_NOTES round-5).
        # Rare skew beyond the heuristic capacity (the 10K cuboid's
        # densest supertile holds 1622 members vs 512) truncates
        # deterministically and is SURFACED via Fragments.overflow_points
        # (1110 memberships = 0.04%% of that scene's candidate visits);
        # max_points_per_bin is the escape hatch when it matters.
        m_min = int(mppb) if (
            max_points_per_bin is not None and max_points_per_bin > 0
        ) else 0
        BH = (H - 1) // bin_size_cfg + 1
        BW = (W - 1) // bin_size_cfg + 1
        grouped = _is_grouped(BH, BW, n_assign)
        cc = _pick_cand_chunk(P)
        cc_align = max(cc, _pick_cand_chunk_bwd(P))
        P_pad = _ceil_to(max(P, cc_align), cc_align)
        bh_bw = ((BH + 1) // 2) * ((BW + 1) // 2) if grouped else BH * BW
        # per-BIN max_point_per_bin -> per-supertile capacity units
        M_max = _pick_m_max(P_pad, bh_bw, cc,
                            4 * m_min if grouped else m_min)
        if grouped and 2 * M_max < P_pad:
            # Emission-compacted coarse stage: one flat ~9P-key sort builds
            # the per-supertile candidate rows directly — no (bins, P) mask,
            # no per-bin argsort (those cost ~4.6 ms of the round-1 10K
            # forward's 5.9; see emit_supertile_candidates).  Candidate
            # order is ascending original index, so no permutation context.
            pos_c, bits_c, ids_c, counts_c, overflow_c, dst = (
                emit_supertile_candidates(
                    R, T, focal, principal, points, isigmas, (H, W), thr,
                    bin_size_cfg, M_max, return_dst=True,
                )
            )
            rf_c = None
            if rf_cache is not None and rf_cache.get("geom") == (
                H, W, bin_size_cfg
            ):
                rf_c = rf_cache.get("rf_k")
            # fused attribute compositing: planes ride the table gather and
            # the image comes out of the select kernel (multi-chunk-safe:
            # chunks accumulate over the candidate grid axis; callers fall
            # back to the lazy interpolate_attr chain when attr_p stays
            # None)
            attr_p = None
            if attrs is not None and agg_ow is not None and return_ctx:
                d_attr = int(attrs.shape[-1])
                Ca = -(-d_attr // 8) * 8
                a = attrs.astype(jnp.float32).reshape(B, P, d_attr)
                attr_p = jnp.swapaxes(a, 1, 2)
                attr_p = jnp.pad(
                    attr_p, ((0, 0), (0, Ca - d_attr), (0, P_pad - P))
                )
            sel_k = _rt_fine_kern_c(
                points, isigmas, rays, pos_c, bits_c, ids_c, counts_c,
                dst[0], dst[1], dst[2], dst[3], rf_c, attr_p,
                float(thr_act), (bin_size_cfg, bin_size_cfg), int(n_assign),
                agg_ow, bool(camera_grad),
            )
            img_t = None
            if attr_p is not None:
                sel_k, img_t = sel_k[:-1], sel_k[-1]
            if not return_ctx:
                sel = tuple(
                    unbin_kern(x, B, BH, BW, H, W, bin_size_cfg,
                               bin_size_cfg, True)
                    for x in sel_k
                )
                if return_overflow:
                    return sel, jnp.sum(overflow_c).astype(jnp.int32)
                return sel
            ctx = dict(
                ids_c=ids_c, pos_c=pos_c, counts_c=counts_c,
                overflow=overflow_c, perm=None, dst=dst,
                geom=(B, H, W, BH, BW, bin_size_cfg, bin_size_cfg, True,
                      bh_bw, pos_c.shape[1], P, P_pad, "c"),
            )
            if img_t is not None:
                ctx["img_t"] = img_t  # (nb, Ca, R_pad) fused attr image
            return sel_k, ctx

        # Bin-coherent candidate ordering: sort Gaussians by the Morton code
        # of their projected supertile so each supertile's candidates cluster
        # into few chunks; the streaming kernel then skips the (vast)
        # majority of (supertile, chunk) steps.  Original ids ride along as a
        # streamed plane, so outputs keep original indexing for free.
        points, isigmas, ids, perm = _sort_bin_coherent(
            R, T, focal, principal, points, isigmas, (H, W),
            bin_size_cfg, base_ids,
        )
        mask = overlap_mask(
            R, T, focal, principal, points, isigmas, (H, W), thr,
            bin_size_cfg,
        )
        eff_bin = (bin_size_cfg, bin_size_cfg)

    if not return_ctx:
        if not return_overflow:
            return _ray_trace_fine_mask(
                points, isigmas, rays, mask, ids, float(thr_act),
                tuple(eff_bin), int(n_assign), agg_ow,
                m_min=P if mppb == -1 else 0,
            )
        sel_k, aux = _rt_fine_kern(
            points, isigmas, rays, mask, ids, float(thr_act),
            tuple(eff_bin), int(n_assign), P if mppb == -1 else 0, agg_ow,
        )
        _, BH_m, BW_m, _ = mask.shape
        bsh, bsw = eff_bin
        grouped_m = _is_grouped(BH_m, BW_m, int(n_assign))
        sel = tuple(
            unbin_kern(x, B, BH_m, BW_m, H, W, bsh, bsw, grouped_m)
            for x in sel_k
        )
        ovf = (jnp.sum(aux[3]).astype(jnp.int32) if aux is not None
               else jnp.zeros((), jnp.int32))
        return sel, ovf

    # ctx path: KERNEL-layout selections + the compacted candidate context
    # the fused attribute compositing kernels need (pallas_attr.py).
    # No-coarse (mppb == -1) means NO truncation ever: force the capacity to
    # cover every Gaussian so _mask_path_prep can never engage per-supertile
    # compaction (which would silently drop members past M_max — the exact
    # failure the -1 setting exists to rule out).
    if mppb == -1:
        m_min = P
    else:
        # mppb is the (possibly bin-area-rescaled) capacity floor from
        # production_bin_geometry — NOT the raw user value, which is in
        # reference-bin units.  The floor applies only when the USER set
        # max_points_per_bin: extending it to the reference heuristic
        # (i.e., statically guaranteeing the reference's no-truncate
        # envelope everywhere) was measured at +10 ms on the 10K headline
        # — the coarse key extraction, the table gather and the kernels'
        # static chunk axes all scale with M_max (DESIGN_NOTES round-5).
        # Rare skew beyond the heuristic capacity (the 10K cuboid's
        # densest supertile holds 1622 members vs 512) truncates
        # deterministically and is SURFACED via Fragments.overflow_points
        # (1110 memberships = 0.04%% of that scene's candidate visits);
        # max_points_per_bin is the escape hatch when it matters.
        m_min = int(mppb) if (
            max_points_per_bin is not None and max_points_per_bin > 0
        ) else 0
    sel_k, aux = _rt_fine_kern(
        points, isigmas, rays, mask, ids, float(thr_act), tuple(eff_bin),
        int(n_assign), m_min, agg_ow,
    )
    _, BH, BW, _ = mask.shape
    bsh, bsw = eff_bin
    grouped = _is_grouped(BH, BW, int(n_assign))
    cc_align = max(_pick_cand_chunk(P), _pick_cand_chunk_bwd(P))
    P_pad = _ceil_to(max(P, cc_align), cc_align)
    if grouped:
        BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
        bh_bw = BH2 * BW2
    else:
        bh_bw = BH * BW
    if aux is not None:
        ids_c, pos_c, counts_c, overflow_c = aux
        ctx = dict(
            ids_c=ids_c, pos_c=pos_c, counts_c=counts_c,
            overflow=overflow_c,
            perm=perm,
            geom=(B, H, W, BH, BW, bsh, bsw, grouped, bh_bw,
                  pos_c.shape[1], P, P_pad, "c"),
        )
        return sel_k, ctx
    # global-space attribute context (small scenes: compaction skipped)
    mask_flat = mask.reshape(B * BH * BW, P).astype(jnp.int8)
    if P_pad > P:
        mask_flat = jnp.pad(mask_flat, ((0, 0), (0, P_pad - P)))
    if grouped:
        mask_k, _, _ = _group_supertiles(mask_flat[:, None, :], B, BH, BW)
    else:
        mask_k = mask_flat[:, None, :]
    ctx = dict(
        mask_k=mask_k, ids_p=_prep_ids(ids, P, P_pad),
        # global-space streaming truncates nothing: exact culling
        overflow=jnp.zeros((1,), jnp.int32),
        perm=perm,
        geom=(B, H, W, BH, BW, bsh, bsw, grouped, bh_bw,
              _pick_cand_chunk_bwd(P), P, P_pad, "g"),
    )
    return sel_k, ctx


def _morton16(x: jax.Array, y: jax.Array) -> jax.Array:
    """Interleave the low 16 bits of two int32 grids (Z-order curve)."""
    def spread(v):
        v = v & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(x) | (spread(y) << 1)


def _sort_bin_coherent(
    R, T, focal, principal, points, isigmas, image_size, bin_size, base_ids,
):
    """Sort Gaussians (per batch) by the Morton code of the 2x2-bin
    supertile containing their projected center; off-screen / behind-camera
    Gaussians sort last.  Returns (points, isigmas, ids, perm) permuted,
    where ``ids`` carries the original global flattened indices and ``perm``
    is the (B, P) permutation (sorted slot -> original row)."""
    from voge_tpu.ops.coarse import _camera_planes

    H, W = int(image_size[0]), int(image_size[1])
    st = 2 * bin_size
    u, v, z = _camera_planes(R, T, focal, principal, points)
    sx = jnp.clip((u / st).astype(jnp.int32), 0, (W - 1) // st)
    sy = jnp.clip((v / st).astype(jnp.int32), 0, (H - 1) // st)
    key = _morton16(sx, sy)
    invalid = (z <= 0) | (u < -st) | (u > W + st) | (v < -st) | (v > H + st)
    key = jnp.where(invalid, jnp.int32(0x7FFFFFFF), key)
    perm = jnp.argsort(key, axis=1, stable=True)               # (B, P)
    pts = jnp.take_along_axis(points, perm[:, :, None], axis=1)
    isg = jnp.take_along_axis(isigmas, perm[:, :, None, None], axis=1)
    ids = jnp.take_along_axis(base_ids, perm, axis=1)
    return pts, isg, ids, perm
