"""Dense (all rays x all Gaussians) ray tracing.

This is both (a) the oracle that every optimized path is tested against and
(b) the public brute-force API used by NeMo-style render-and-compare
(reference ``RayTracing.py:97-123`` backed by ``voge_ray_tracing_ray.cu``).

For a ray r (unit direction from the camera center) and a Gaussian kernel
with camera-centered mean mu and "inverse sigma" Lambda (the renderer passes
Lambda = 2 * Sigma^{-1}), the density along the ray  exp(-(t r - mu)^T
Lambda (t r - mu) / 2 ... folded into Lambda) peaks at

    hit_length     t* = (mu^T Lambda r) / (r^T Lambda r)
    hit_activation a  = mu^T Lambda mu - (mu^T Lambda r)^2 / (r^T Lambda r)
    hit_dsd           = r^T Lambda r

(reference ``ray_trace_voge.cu:184-193``).  Everything here is plain jnp and
differentiable by ``jax.grad``; the quadratic forms are evaluated as thin
einsums in float32 (HIGHEST precision so the MXU does not downcast).
"""
from __future__ import annotations

import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp

_INF = 1e8  # reference RayTracing.py:9
_SENTINEL_LEN = 1e10
_SENTINEL_ACT = 1e10

_P = jax.lax.Precision.HIGHEST


def expand_isigmas(sigmas, n: int, dtype=jnp.float32) -> jax.Array:
    """float / (P,) / (P,3,3) -> (P,3,3) (reference ``RayTracing.py:98-101``)."""
    if isinstance(sigmas, (float, int)):
        return jnp.broadcast_to(jnp.eye(3, dtype=dtype) * sigmas, (n, 3, 3))
    sigmas = jnp.asarray(sigmas)
    if sigmas.ndim == 1:
        return sigmas[:, None, None] * jnp.eye(3, dtype=sigmas.dtype)[None]
    return sigmas


def hit_values(
    mus: jax.Array, isigmas: jax.Array, rays: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(hit_length, hit_activation, hit_dsd) for every (ray, Gaussian) pair.

    :param mus: (..., P, 3) camera-centered means
    :param isigmas: (..., P, 3, 3)
    :param rays: (..., N, 3) unit directions
    :return: three arrays of shape (..., N, P)
    """
    # A = Lambda^T mu : (..., P, 3).  The transpose matters for gradient
    # parity with the CUDA reference, which contracts mu^T Lambda r
    # (Innerdot3d(mus, isigmas, rays)) so d/dLambda_ij = mu_i r_j.
    A = jnp.einsum("...pji,...pj->...pi", isigmas, mus, precision=_P)
    # msk = mu^T Lambda r : (..., N, P)
    msk = jnp.einsum("...nd,...pd->...np", rays, A, precision=_P)
    # ksk = r^T Lambda r : flatten Lambda to 9 and contract with r_i r_j
    rr = rays[..., :, :, None] * rays[..., :, None, :]  # (..., N, 3, 3)
    rr9 = rr.reshape(rr.shape[:-2] + (9,))
    is9 = isigmas.reshape(isigmas.shape[:-2] + (9,))
    ksk = jnp.einsum("...nq,...pq->...np", rr9, is9, precision=_P)
    hit_length = msk / ksk
    # hit_activation in the COMPENSATED residual form
    #     a = d^T Lambda d,   d = mu - t* r
    # mathematically identical to the expanded mu^T Lambda mu - msk^2/ksk
    # of the reference (ray_trace_voge.cu:188-193) but without the
    # catastrophic big-term cancellation: for a kernel with msm ~ 5e7 (the
    # bunny config's far-outlier Gaussians) the expanded f32 form carries
    # |d act| ~ eps * msm ~ 1, the residual form ~ 1e-5 (tools/debug_bunny
    # measured both; the CUDA contraction order errs identically, so this
    # is strictly more accurate than the reference's own f32).  Costs a
    # (..., N, P, 3) temporary — 3x the hit-tensor footprint.
    d = mus[..., None, :, :] - hit_length[..., :, :, None] * rays[..., :, None, :]
    e = jnp.einsum("...npi,...pij->...npj", d, isigmas, precision=_P)
    hit_activation = jnp.einsum("...npj,...npj->...np", e, d, precision=_P)
    return hit_length, hit_activation, ksk


def ray_trace_voge_ray(
    mus: jax.Array, sigmas, rays: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Brute-force (N rays x P Gaussians) hit tensors.

    API parity with reference ``RayTracing.py:97-108`` (which despite the
    argument name takes *inverse* sigmas).  Differentiable w.r.t. all inputs.

    :param mus: (P, 3); :param sigmas: float | (P,) | (P,3,3); :param rays: (N, 3)
    :return: (hit_len, hit_act, hit_dsd), each (N, P)
    """
    assert mus.ndim == 2 and mus.shape[1] == 3
    assert rays.ndim == 2 and rays.shape[1] == 3
    isigmas = expand_isigmas(sigmas, mus.shape[0], mus.dtype)
    assert isigmas.ndim == 3 and isigmas.shape[1] == 3 and isigmas.shape[2] == 3
    return hit_values(mus, isigmas, rays)


def _nearest_k_impl(hit_len_in, hit_act_in, hit_dsd_in, thr_act: float, K: int):
    M = hit_len_in.shape[-1]
    ok = hit_act_in < thr_act
    len_masked = jnp.where(ok, hit_len_in, _SENTINEL_LEN)
    k_eff = min(K, M)
    neg_vals, args = jax.lax.top_k(-len_masked, k_eff)
    sel_ok = jnp.take_along_axis(ok, args, axis=-1)
    sel_len = jnp.where(sel_ok, -neg_vals, _SENTINEL_LEN)
    sel_act = jnp.where(
        sel_ok, jnp.take_along_axis(hit_act_in, args, axis=-1), _SENTINEL_ACT
    )
    sel_dsd = jnp.where(
        sel_ok, jnp.take_along_axis(hit_dsd_in, args, axis=-1), 0.0
    )
    sel_idx = jnp.where(sel_ok, args, -1).astype(jnp.int32)
    if k_eff < K:  # pad to K slots with invalid entries
        pad = [(0, 0)] * (sel_len.ndim - 1) + [(0, K - k_eff)]
        sel_idx = jnp.pad(sel_idx, pad, constant_values=-1)
        sel_len = jnp.pad(sel_len, pad, constant_values=_SENTINEL_LEN)
        sel_act = jnp.pad(sel_act, pad, constant_values=_SENTINEL_ACT)
        sel_dsd = jnp.pad(sel_dsd, pad, constant_values=0.0)
    return sel_idx, sel_len, sel_act, sel_dsd


def find_nearest_k(hit_len_in, hit_act_in, hit_dsd_in, K: int, thr: float):
    """Per-ray threshold + top-K-nearest selection over dense hit tensors.

    Reference ``RayTracing.py:111-115`` / ``voge_ray_tracing_ray.cu:191-239``:
    keep the K smallest ``hit_len`` among entries with
    ``hit_act < -log(thr + 1e-8)``, ascending; pad with
    (idx=-1, len=1e10, act=1e10, dsd=0).

    Differentiable w.r.t. the three hit tensors through the selection
    (gradients scatter back to the selected entries; this *fixes* the
    reference's copy-paste bug at ``RayTracing.py:239-240`` which overwrote
    the act/dsd grads with the len grads).
    """
    thr_act = -math.log(thr + 1.0 / _INF)
    return _nearest_k_impl(hit_len_in, hit_act_in, hit_dsd_in, thr_act, int(K))


def find_farest_k(hit_len_in, hit_act_in, hit_dsd_in, K: int, thr: float):
    """Farthest-K variant (reference ``RayTracing.py:118-123``)."""
    point_idx, hit_len, hit_act, hit_dsd = find_nearest_k(
        -hit_len_in, hit_act_in, hit_dsd_in, K, thr
    )
    return point_idx, -hit_len, hit_act, hit_dsd
