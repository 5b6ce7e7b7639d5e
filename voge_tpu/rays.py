"""Ray generation: TPU-native replacement for PyTorch3D's
``NDCMultinomialRaysampler`` as used by the reference renderer
(``Renderer.py:124-128``: unit world-space directions through every pixel
center, plus per-camera world-space origins).

Derivation (see :mod:`voge_tpu.cameras` for conventions): unprojecting the
NDC grid at depths 1 and 2 and differencing — what the PyTorch3D raysampler
does — yields view-space directions

    d_view(i, j) = ((j + 0.5 - px) / fx, (i + 0.5 - py) / fy, 1)

which are rotated to world space with ``d_world = d_view @ R^{-1}`` and
normalized.  Origins are the camera centers.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from voge_tpu.cameras import camera_centers


def pixel_dirs_view(
    image_size: Tuple[int, int], focal: jax.Array, principal: jax.Array,
    dtype=jnp.float32,
) -> jax.Array:
    """View-space (un-normalized) ray directions through pixel centers.

    :param image_size: (H, W)
    :param focal: (B, 2) (fx, fy) in pixels
    :param principal: (B, 2) (px, py) in pixels
    :return: (B, H, W, 3)
    """
    H, W = int(image_size[0]), int(image_size[1])
    jj = jnp.arange(W, dtype=dtype) + 0.5  # pixel-center columns
    ii = jnp.arange(H, dtype=dtype) + 0.5  # pixel-center rows
    # Screen-space cameras mirror both axes: x_screen = px - fx * x_view/z
    # (PyTorch3D composes x_ndc = fx_ndc x/z + px_ndc, NDC +x LEFT, with the
    # NDC->screen flip; cf. the reference's own camera-space helper
    # Aggregation.py:25 which uses the same negated form).
    x = (principal[:, 0][:, None, None] - jj[None, None, :]) / focal[:, 0][:, None, None]
    y = (principal[:, 1][:, None, None] - ii[None, :, None]) / focal[:, 1][:, None, None]
    x = jnp.broadcast_to(x, (x.shape[0], H, W))
    y = jnp.broadcast_to(y, (y.shape[0], H, W))
    z = jnp.ones_like(x)
    return jnp.stack([x, y, z], axis=-1)


def camera_rays(
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    image_size: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Unit world-space ray directions + origins for a batch of cameras.

    :param R: (B, 3, 3) world-to-view rotation (row-vector convention)
    :param T: (B, 3)
    :param focal: (B, 2), :param principal: (B, 2) in pixels
    :return: (rays (B, H, W, 3) unit world dirs, origins (B, 3))
    """
    from voge_tpu.utils import inv3x3

    d_view = pixel_dirs_view(image_size, focal, principal, dtype=R.dtype)
    Rinv = inv3x3(R)
    d_world = jnp.einsum("bhwj,bji->bhwi", d_view, Rinv,
                         precision=jax.lax.Precision.HIGHEST)
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    origins = camera_centers(R, T)
    return d_world, origins


def get_ray_camera_space(img_size, principle, focal, dtype=jnp.float32):
    """Camera-space pinhole ray grid; jnp port of the reference's
    ``Aggregation.py:11-27`` helper (note: that helper uses a legacy
    negated-xy convention and integer pixel coordinates; reproduced verbatim
    for API parity — the renderer itself uses :func:`camera_rays`).
    """
    focal = jnp.asarray(focal, dtype=dtype).reshape(-1)
    if focal.shape[0] == 1:
        focal = jnp.broadcast_to(focal, (2,))
    h, w = img_size
    i = jnp.arange(h, dtype=dtype)[:, None] * jnp.ones((1, w), dtype=dtype)
    j = jnp.ones((h, 1), dtype=dtype) * jnp.arange(w, dtype=dtype)[None, :]
    dirs = jnp.stack(
        [-(j - principle[1]) / focal[1], -(i - principle[0]) / focal[0], jnp.ones_like(i)],
        axis=-1,
    )
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
