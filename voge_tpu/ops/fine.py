"""Fine stage: binned per-pixel ray tracing with analytic custom VJP.

TPU-native replacement for the reference's hot CUDA kernel
(``ray_trace_voge.cu``).  Design:

  forward  — pixels are grouped by bin; each bin evaluates its (padded,
             fixed-size) candidate list densely as thin einsums on the VPU
             and selects the K nearest threshold-passing hits with a masked
             ``lax.top_k`` (the vectorized equivalent of the CUDA
             insertion sort at ``ray_trace_voge.cu:197-213``).  Outputs are
             ascending in hit length with invalid slots filled
             (idx=-1, len=1e10, act=1e10, dsd=0), exactly like the kernel's
             initializers (``ray_trace_voge.cu:244-247``).

  backward — flash-attention style: only (mus, isigmas, rays, sel_idx) are
             saved; the three quadratic forms are *recomputed* per selected
             (pixel, slot) and the closed-form chain rule of
             ``ray_trace_voge.cu:324-330`` is applied:

                 g_ksk = (g_a * msk - g_l) * msk / ksk^2 + g_d
                 g_msk = (g_l - 2 g_a * msk) / ksk
                 g_msm = g_a

             Per-Gaussian gradients are accumulated with deterministic
             ``segment_sum`` instead of float atomics — bitwise-reproducible,
             a determinism upgrade over the reference.

The no-coarse path (``max_points_per_bin == -1``) uses a single bin covering
the whole image with every Gaussian as candidate (the reference materializes
an all-points index tensor per bin, ``RayTracing.py:22-26``; ours is the
same computation without the redundant copies — and without the reference's
square-grid indexing bug at ``RayTracing.py:25`` / ``ray_trace_voge.cu:185``,
which only affected non-square bin grids it never ran with).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from voge_tpu.ops.coarse import coarse_bin_config, rasterize_coarse

_P = jax.lax.Precision.HIGHEST
_SENTINEL_LEN = 1e10
_SENTINEL_ACT = 1e10


# ---------------------------------------------------------------------------
# forward core
# ---------------------------------------------------------------------------

def _bin_rays(rays: jax.Array, bsh: int, bsw: int) -> jax.Array:
    """(B, H, W, 3) -> (B, BH, BW, bsh*bsw, 3), edge-padded."""
    B, H, W, _ = rays.shape
    BH = (H - 1) // bsh + 1
    BW = (W - 1) // bsw + 1
    rays_p = jnp.pad(
        rays, ((0, 0), (0, BH * bsh - H), (0, BW * bsw - W), (0, 0)), mode="edge"
    )
    r = rays_p.reshape(B, BH, bsh, BW, bsw, 3)
    return r.transpose(0, 1, 3, 2, 4, 5).reshape(B, BH, BW, bsh * bsw, 3)


def _unbin(x: jax.Array, H: int, W: int, bsh: int, bsw: int) -> jax.Array:
    """(B, BH, BW, bsh*bsw, K) -> (B, H, W, K) (crop padding)."""
    B, BH, BW, _, K = x.shape
    x = x.reshape(B, BH, BW, bsh, bsw, K).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, BH * bsh, BW * bsw, K)
    return x[:, :H, :W]


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

    r_b = _bin_rays(rays, bsh, bsw)  # (B,BH,BW,R,3)

    valid = bin_points >= 0
    idxc = jnp.where(valid, bin_points, 0)
    mu_c = mus[idxc]        # (B,BH,BW,M,3)
    is_c = isigmas[idxc]    # (B,BH,BW,M,3,3)

    # quadratic forms (thin einsums; f32 HIGHEST so MXU doesn't downcast).
    # A = Lambda^T mu: contraction order matches the CUDA reference's
    # mu^T Lambda r (relevant only for asymmetric Lambda).
    A = jnp.einsum("...mji,...mj->...mi", is_c, mu_c, precision=_P)
    msm = jnp.einsum("...mi,...mi->...m", mu_c, A, precision=_P)
    msk = jnp.einsum("...rd,...md->...rm", r_b, A, precision=_P)
    rr9 = (r_b[..., :, :, None] * r_b[..., :, None, :]).reshape(
        r_b.shape[:-1] + (9,)
    )
    is9 = is_c.reshape(is_c.shape[:-2] + (9,))
    ksk = jnp.einsum("...rq,...mq->...rm", rr9, is9, precision=_P)

    hit_len = msk / ksk
    hit_act = msm[..., None, :] - msk * msk / ksk

    ok = valid[..., None, :] & (hit_act < thr_act)   # (B,BH,BW,R,M)
    len_masked = jnp.where(ok, hit_len, _SENTINEL_LEN)

    kk = min(K, M)
    neg_vals, args = jax.lax.top_k(-len_masked, kk)
    sel_ok = jnp.take_along_axis(ok, args, axis=-1)
    cand = jnp.broadcast_to(bin_points[:, :, :, None, :], ok.shape)
    sel_idx = jnp.where(sel_ok, jnp.take_along_axis(cand, args, axis=-1), -1)
    sel_len = jnp.where(sel_ok, -neg_vals, _SENTINEL_LEN)
    sel_act = jnp.where(
        sel_ok, jnp.take_along_axis(hit_act, args, axis=-1), _SENTINEL_ACT
    )
    sel_dsd = jnp.where(sel_ok, jnp.take_along_axis(ksk, args, axis=-1), 0.0)

    if kk < K:  # pad slot axis to K
        pad = ((0, 0),) * 4 + ((0, K - kk),)
        sel_idx = jnp.pad(sel_idx, pad, constant_values=-1)
        sel_len = jnp.pad(sel_len, pad, constant_values=_SENTINEL_LEN)
        sel_act = jnp.pad(sel_act, pad, constant_values=_SENTINEL_ACT)
        sel_dsd = jnp.pad(sel_dsd, pad, constant_values=0.0)

    sel_idx = _unbin(sel_idx.astype(jnp.int32), H, W, bsh, bsw)
    sel_len = _unbin(sel_len, H, W, bsh, bsw)
    sel_act = _unbin(sel_act, H, W, bsh, bsw)
    sel_dsd = _unbin(sel_dsd, H, W, bsh, bsw)
    return sel_idx, sel_len, sel_act, sel_dsd


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ray_trace_fine(mus, isigmas, rays, bin_points, thr_act, bin_size, K):
    return _fine_forward(mus, isigmas, rays, bin_points, thr_act, bin_size, K)


def _ray_trace_fine_fwd(mus, isigmas, rays, bin_points, thr_act, bin_size, K):
    out = _fine_forward(mus, isigmas, rays, bin_points, thr_act, bin_size, K)
    sel_idx = out[0]
    return out, (mus, isigmas, rays, sel_idx, bin_points)


def _ray_trace_fine_bwd(thr_act, bin_size, K, res, g):
    mus, isigmas, rays, sel_idx, bin_points = res
    _, g_len, g_act, g_dsd = g
    B, H, W, Kk = sel_idx.shape
    P = mus.shape[0]

    idx = sel_idx.reshape(-1)
    valid = idx >= 0
    idxc = jnp.where(valid, idx, 0)
    mu = mus[idxc]          # (E,3)
    isg = isigmas[idxc]     # (E,3,3)
    ray = jnp.broadcast_to(
        rays.reshape(B * H * W, 1, 3), (B * H * W, Kk, 3)
    ).reshape(-1, 3)

    vf = valid.astype(mus.dtype)
    gl = g_len.reshape(-1) * vf
    ga = g_act.reshape(-1) * vf
    gd = g_dsd.reshape(-1) * vf

    lam_r = jnp.einsum("eij,ej->ei", isg, ray, precision=_P)    # Lambda r
    lamT_r = jnp.einsum("eji,ej->ei", isg, ray, precision=_P)   # Lambda^T r
    lam_mu = jnp.einsum("eij,ej->ei", isg, mu, precision=_P)    # Lambda mu
    lamT_mu = jnp.einsum("eji,ej->ei", isg, mu, precision=_P)   # Lambda^T mu

    ksk = jnp.einsum("ei,ei->e", ray, lam_r, precision=_P)
    msk = jnp.einsum("ei,ei->e", mu, lam_r, precision=_P)
    ksk_safe = jnp.where(valid, ksk, 1.0)

    # closed-form chain rule (ray_trace_voge.cu:324-326)
    g_ksk = (ga * msk - gl) * msk / (ksk_safe * ksk_safe) + gd
    g_msk = (gl - 2.0 * ga * msk) / ksk_safe
    g_msm = ga

    g_mu = g_msk[:, None] * lam_r + g_msm[:, None] * (lam_mu + lamT_mu)
    g_ray = g_ksk[:, None] * (lam_r + lamT_r) + g_msk[:, None] * lamT_mu
    g_isg = (
        g_ksk[:, None, None] * (ray[:, :, None] * ray[:, None, :])
        + g_msk[:, None, None] * (mu[:, :, None] * ray[:, None, :])
        + g_msm[:, None, None] * (mu[:, :, None] * mu[:, None, :])
    )

    grad_rays = g_ray.reshape(B, H, W, Kk, 3).sum(axis=3)
    grad_mus = jax.ops.segment_sum(g_mu, idxc, num_segments=P)
    grad_isg = jax.ops.segment_sum(
        g_isg.reshape(-1, 9), idxc, num_segments=P
    ).reshape(P, 3, 3)

    g_bin = np.zeros(bin_points.shape, dtype=jax.dtypes.float0)
    return grad_mus, grad_isg, grad_rays, g_bin


_ray_trace_fine.defvjp(_ray_trace_fine_fwd, _ray_trace_fine_bwd)


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


def ray_tracing(
    cameras_or_params, points: jax.Array, isigmas: jax.Array,
    rays: jax.Array, image_size, thr: float, n_assign: int,
    bin_size: Optional[int] = None, max_points_per_bin: Optional[int] = None,
    **kwargs,
):
    """Coarse + fine dispatcher (reference ``RayTracing.py:12-30``).

    :param cameras_or_params: a :class:`voge_tpu.cameras.PerspectiveCameras`
        or a tuple ``(R, T, focal, principal)`` of arrays
    :param points: (B, P, 3) camera-centered means
    :param isigmas: (B, P, 3, 3)
    :param rays: (B, H, W, 3)
    """
    if isinstance(cameras_or_params, tuple):
        R, T, focal, principal = cameras_or_params
    else:
        cams = cameras_or_params
        R, T, focal, principal = cams.batched_params(points.shape[0])

    B, P = points.shape[0], points.shape[1]
    bin_size_cfg, mppb = coarse_bin_config(
        image_size, n_assign, P, bin_size, max_points_per_bin
    )
    H, W = int(image_size[0]), int(image_size[1])

    if mppb == -1:
        # no-coarse: one bin covering the whole image, all Gaussians listed
        bin_points = jnp.broadcast_to(
            (
                jnp.arange(P, dtype=jnp.int32)[None, :]
                + (jnp.arange(B, dtype=jnp.int32) * P)[:, None]
            )[:, None, None, :],
            (B, 1, 1, P),
        )
        eff_bin = (H, W)
    else:
        bin_points = rasterize_coarse(
            R, T, focal, principal, points, isigmas, (H, W), thr,
            bin_size_cfg, mppb, **kwargs,
        )
        eff_bin = (bin_size_cfg, bin_size_cfg)

    return ray_tracing_fine(
        points.reshape(-1, 3), isigmas.reshape(-1, 3, 3), rays, bin_points,
        thr, eff_bin, n_assign,
    )
