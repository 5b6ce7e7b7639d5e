"""Closed-form transmittance compositing (erf aggregation).

jnp re-implementation of reference ``VoGE/Aggregation.py`` — pure array math
that JAX differentiates; numerics replicate the reference exactly, including
its quirks (the self term in the occlusion sum, the ``exp(-0.5)``
normalization at ``Aggregation.py:79``, and the ``1e-10`` stabilizer inside
the sqrt at ``Aggregation.py:49``), because these affect pixel values.

Per pixel with K selected kernels (hit length l, peak activation a,
direction-projected inverse covariance dsd = r^T Lambda r):

    ca[m, k]  = (l_m - l_k) * sqrt(dsd_k + 1e-10)
    T_m       = exp(-ow * sum_k exp(-a_k) * (erf(ca[m,k]) + 1) / 2)
    w_m       = T_m * exp(-a_m) / exp(-0.5)

Invalid slots carry a = 1e10 so their weight and occlusion contribution
vanish.  The O(K^2) pairwise matrix is the aggregation hot loop; it is
checkpointed (rematerialized) by the renderer to avoid storing the
[pixels, K, K] tensor for backward.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from voge_tpu.utils import ind_sel, ind_fill, inverse_cumsum

# Re-export for API parity with ``from VoGE.Aggregation import *`` users.
from voge_tpu.rays import get_ray_camera_space  # noqa: F401

_E_HALF = 1.6487212707001282  # exp(0.5)


def get_cross_activation(sel_length: jax.Array, sel_dsd: jax.Array) -> jax.Array:
    """(l_m - l_k) * sqrt(dsd_k + 1e-10); reference ``Aggregation.py:30-51``.

    :param sel_length: [k, M]
    :param sel_dsd: [k, M]
    :return: [k, M(_m), M(_k)]
    """
    k, m = sel_length.shape[-2:]
    return (sel_length[..., :, None] - sel_length[..., None, :]) * jnp.sqrt(
        sel_dsd[..., None, :] + 1e-10
    )


def assign2weight(
    sel_activation: jax.Array, cross_activation: jax.Array,
    occupation_weight: float = 1.0,
) -> jax.Array:
    """Occlusion-aware per-kernel weights; reference ``Aggregation.py:54-79``.

    :param sel_activation: [k, M]
    :param cross_activation: [k, M, M]
    :return: weight [k, M]
    """
    density_dist = jnp.exp(-sel_activation[..., None, :]) * (
        (jax.lax.erf(cross_activation) + 1.0) / 2.0
    )
    density_weight = jnp.exp(-jnp.sum(density_dist, axis=-1) * occupation_weight)
    weight = density_weight * jnp.exp(-sel_activation)
    return weight * _E_HALF


def weights_from_sel(
    sel_len: jax.Array, sel_act: jax.Array, sel_dsd: jax.Array,
    occupation_weight: float = 1.0,
) -> jax.Array:
    """Per-slot compositing weights from (length, activation, dsd) alone —
    the differentiable core of :func:`aggregation` (reference
    ``Aggregation.py:30-79``).  Used as the reference math (and VJP) for the
    kernel-fused aggregation path in :mod:`voge_tpu.ops.pallas_fine2`."""
    ca = get_cross_activation(sel_length=sel_len, sel_dsd=sel_dsd)
    return assign2weight(
        sel_activation=sel_act, cross_activation=ca,
        occupation_weight=occupation_weight,
    )


def aggregation(
    sel_idx: jax.Array, sel_act: jax.Array, sel_len: jax.Array,
    sel_dsd: jax.Array, occupation_weight: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fragments math; reference ``Aggregation.py:82-107``.

    :param sel_idx: [..., M] selected kernel indices (-1 = invalid)
    :param sel_act / sel_len / sel_dsd: [..., M]
    :return: (vert_weight [..., M], vert_index [..., M], valid_num [...],
              vert_hit_length [..., M])
    """
    cross_activation = get_cross_activation(sel_length=sel_len, sel_dsd=sel_dsd)
    get_weight = assign2weight(
        sel_activation=sel_act, cross_activation=cross_activation,
        occupation_weight=occupation_weight,
    )
    valid_num = jnp.sum(sel_idx >= 0, axis=-1)
    return get_weight, sel_idx, valid_num, sel_len


@jax.custom_vjp
def _gather_attr(vert_attr: jax.Array, ind: jax.Array) -> jax.Array:
    """vert_attr[ind] with a TPU-friendly custom backward: the cotangent is
    accumulated with one channel-padded ``segment_sum`` (autodiff's default
    scatter-add on a trailing-3 array is ~2x slower)."""
    return vert_attr[ind]


def _gather_attr_fwd(vert_attr, ind):
    return vert_attr[ind], (vert_attr.shape, ind)


def _gather_attr_bwd(res, g):
    import numpy as _np

    shape, ind = res
    n, d = shape
    E = int(_np.prod(ind.shape))
    g2 = g.reshape(E, d)
    pad = (-d) % 8
    if pad:
        g2 = jnp.pad(g2, ((0, 0), (0, pad)))
    summed = jax.ops.segment_sum(g2, ind.reshape(E), num_segments=n)
    return summed[:, :d], _np.zeros(ind.shape, dtype=jax.dtypes.float0)


_gather_attr.defvjp(_gather_attr_fwd, _gather_attr_bwd)


def merge_final(
    vert_attr: jax.Array, weight: jax.Array, vert_assign: jax.Array,
    valid_num: jax.Array,
) -> jax.Array:
    """Composite per-kernel attributes into an attribute map.

    Reference ``Aggregation.py:111-141``: mask slots beyond ``valid_num``,
    clamp invalid indices to 0, gather and weighted-sum.

    :param vert_attr: [n, d]
    :param weight / vert_assign: [..., M]; :param valid_num: [...]
    :return: [..., d]
    """
    target_dim = valid_num.ndim
    M = weight.shape[-1]
    # Slot m is valid iff m < valid_num (inverse-cumsum construction of the
    # reference produces exactly this mask).
    slots = jnp.arange(M, dtype=valid_num.dtype)
    mask = (slots < valid_num[..., None]).astype(weight.dtype)
    vert_assign = jnp.where(vert_assign < 0, vert_assign + 1, vert_assign)
    weight = mask * weight
    # [n, d] gathered by [..., M] -> [..., M, d]
    sel_attr = _gather_attr(vert_attr, vert_assign.astype(jnp.int32))
    return jnp.sum(sel_attr * weight[..., None], axis=-2)


def expend_sigma(sigma: jax.Array, rotation_matrix=None) -> jax.Array:
    """Promote (N,) / (N,3) sigma to (N,3,3); reference ``Aggregation.py:144-175``."""
    sigma = jnp.asarray(sigma)
    if sigma.ndim == 3:
        if sigma.shape[1] == 3 and sigma.shape[2] == 3:
            return sigma
        raise ValueError("Got unexpected sigma, which has shape: " + str(sigma.shape))
    if rotation_matrix is None:
        rotation_matrix = jnp.eye(3, dtype=sigma.dtype)[None]
    rotation_matrix = jnp.asarray(rotation_matrix)
    if rotation_matrix.ndim == 2:
        rotation_matrix = rotation_matrix[None]
    rotation_matrix = rotation_matrix[:, :3, :3]
    if sigma.ndim == 1:
        return sigma[:, None, None] * rotation_matrix
    if sigma.ndim == 2:
        return sigma[:, :, None] * rotation_matrix
    raise ValueError("Got unexpected sigma, which has shape: " + str(sigma.shape))
