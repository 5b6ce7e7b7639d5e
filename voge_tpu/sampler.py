"""Inverse rendering: pull image attributes back onto Gaussian kernels.

TPU-native replacement for the reference's atomic-scatter CUDA sampler
(``VoGE/Sampler.py`` + ``sample_voge.cu``): the scatter becomes a
deterministic ``segment_sum`` over flattened (pixel, slot) entries, which
JAX differentiates to exactly the reference's backward (grad_image gathers
``w * grad_feature[idx]``; grad_weight is ``<grad_feature[idx], image> +
grad_sum_weight[idx]``; cf. ``sample_voge.cu:173-209``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_vert",))
def _sample_features(
    image: jax.Array, vert_weight: jax.Array, vert_index: jax.Array,
    num_vert: int,
) -> Tuple[jax.Array, jax.Array]:
    B, H, W, C = image.shape
    K = vert_weight.shape[-1]
    idx = vert_index.reshape(-1)
    valid = idx >= 0
    idxc = jnp.where(valid, idx, 0)
    w = vert_weight.reshape(-1) * valid.astype(vert_weight.dtype)
    img = jnp.broadcast_to(
        image.reshape(B * H * W, 1, C), (B * H * W, K, C)
    ).reshape(-1, C)
    vert_feature = jax.ops.segment_sum(
        w[:, None] * img, idxc, num_segments=num_vert
    )
    vert_sum_weight = jax.ops.segment_sum(w, idxc, num_segments=num_vert)
    return vert_feature, vert_sum_weight


def sample_features(frag, image: jax.Array, n_vert: Optional[int] = None):
    """Scatter pixel features onto kernels (reference ``Sampler.py:5-29``).

    Equivalent to (reference docstring):
        weight = zeros(image.shape[:3] + (n_vert,)).at[..., idx].set(w)
        vert_sum_weight = weight.sum((0, 1, 2))
        vert_feature = weight.reshape(-1, n_vert).T @ image.reshape(-1, C)

    :param frag: :class:`voge_tpu.renderer.Fragments`
    :param image: (B, H, W, C)
    :param n_vert: number of kernels; must be a concrete int under ``jit``.
        Default: ``max(vert_index) + 1`` (forces a sync; pass it explicitly
        in hot loops).
    :return: (vert_feature (N, C), vert_sum_weight (N,))
    """
    vert_weight = frag.vert_weight
    vert_index = frag.vert_index
    if n_vert is None:
        if hasattr(frag, "num_vertices"):
            n_vert = frag.num_vertices
        else:
            n_vert = int(vert_index.max()) + 1
    assert (
        vert_weight.shape[0] == image.shape[0]
        and vert_weight.shape[1] == image.shape[1]
        and vert_weight.shape[2] == image.shape[2]
    )
    return _sample_features(image, vert_weight, vert_index, int(n_vert))


@partial(jax.jit, static_argnames=("num_vert",))
def _scatter_max(vert_weight, vert_index, num_vert: int):
    idx = vert_index.reshape(-1)
    valid = idx >= 0
    idxc = jnp.where(valid, idx, 0)
    w = jnp.where(valid, vert_weight.reshape(-1), -jnp.inf)
    out = jax.ops.segment_max(w, idxc, num_segments=num_vert)
    # kernels never hit keep the CUDA initializer value (0)
    return jnp.where(jnp.isneginf(out), 0.0, out)


def scatter_max_weight(frag, n_vert: Optional[int] = None):
    """Per-kernel max weight (reference ``Sampler.py:32-42``;
    non-differentiable, like the CUDA ``_ScatterMax``)."""
    vert_index = frag.vert_index
    if n_vert is None:
        if hasattr(frag, "num_vertices"):
            n_vert = frag.num_vertices
        else:
            n_vert = int(vert_index.max()) + 1
    return jax.lax.stop_gradient(
        _scatter_max(frag.vert_weight, vert_index, int(n_vert))
    )
