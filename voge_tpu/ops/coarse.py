"""Coarse stage: cull Gaussians to image bins (tiles).

TPU-native, fully vectorized and deterministic replacement for the CUDA
binning rasterizer (reference ``rasterize_coarse.cu`` + the camera math in
``RayTracing.py:33-73``).  Differences by design:

  - works directly in continuous pixel coordinates (the reference's negated
    NDC convention is an affine rescale of these; the overlap tests are
    equivalent term by term);
  - per-bin candidate lists are built with a cumsum + capped scatter instead
    of shared-memory atomics, so the output is deterministic and ordered by
    Gaussian index (the CUDA version's intra-bin order is nondeterministic);
  - overflow (more than ``max_points_per_bin`` candidates in a bin) is
    *reported* via a returned per-bin count instead of a device printf with
    silent truncation (``rasterize_coarse.cu:154-170``); truncation keeps the
    lowest-index candidates;
  - no 66-bins-per-axis limit (``rasterization_utils.cuh:51`` is a CUDA
    shared-memory constraint that does not apply here).

The ellipse bounding-box radius reproduces ``RayTracing.py:33-39``
(``convert_to_box``): in pixel units,

    r_j = sqrt(-log(thr) * sum_i f_i f_j inv2[i, j]) / z_view,   j in {x, y}

with ``inv2`` the inverse of the top-left 2x2 block of the camera-rotated
Lambda (Lambda_cam = R^T Lambda R) and f the focal lengths.  Gaussians behind
the camera (z_view < 0) are skipped (``rasterize_coarse.cu:35``).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


def coarse_bin_config(image_size, n_assign: int, n_points: int,
                      bin_size: Optional[int] = None,
                      max_points_per_bin: Optional[int] = None):
    """The reference's auto-config heuristics (``RayTracing.py:14-19``)."""
    if bin_size is None:
        max_image_size = max(image_size)
        bin_size = max(int(2 ** math.ceil(math.log2(max_image_size) - 5)), 10)
    if max_points_per_bin is None:
        max_points_per_bin = min(
            int(max(n_assign * 10, n_points / 10)), n_points
        )
    return int(bin_size), int(max_points_per_bin)


def ellipse_pixel_radii(
    isigmas_cam: jax.Array, focal: jax.Array, thr: float, z_view: jax.Array
) -> jax.Array:
    """Conservative pixel-space half-extents of the thr-level ellipse.

    :param isigmas_cam: (B, P, 3, 3) camera-rotated Lambda
    :param focal: (B, 2); :param z_view: (B, P)
    :return: (B, P, 2) radii (rx, ry); NaN where the box formula degenerates
             (NaN compares false in the overlap test, matching torch pow(.5)
             of a negative argument).
    """
    a = isigmas_cam[..., 0, 0]
    b = isigmas_cam[..., 0, 1]
    c = isigmas_cam[..., 1, 0]
    d = isigmas_cam[..., 1, 1]
    det = a * d - b * c
    inv00, inv01, inv10, inv11 = d / det, -b / det, -c / det, a / det
    fx = focal[:, 0:1]
    fy = focal[:, 1:2]
    neg_log_thr = -math.log(thr)
    # column sums of F @ inv2 @ F (reference sums ones @ get, i.e. over rows)
    col_x = fx * fx * inv00 + fy * fx * inv10
    col_y = fx * fy * inv01 + fy * fy * inv11
    rx = jnp.sqrt(neg_log_thr * col_x) / z_view
    ry = jnp.sqrt(neg_log_thr * col_y) / z_view
    return jnp.stack([rx, ry], axis=-1)


def rasterize_coarse(
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    points: jax.Array, isigmas: jax.Array, image_size: Tuple[int, int],
    thr: float, bin_size: int, max_points_per_bin: int,
    return_counts: bool = False,
):
    """Build per-bin candidate index lists.

    :param R, T, focal, principal: camera params, (B,3,3)/(B,3)/(B,2)/(B,2)
    :param points: (B, P, 3) *camera-centered* world points (verts - C), as
        passed by the renderer (reference ``Renderer.py:130``)
    :param isigmas: (B, P, 3, 3)
    :return: bin_points (B, BH, BW, M) int32 of *flattened* indices
        (b * P + p), -1-padded — same convention as the reference
        (``RayTracing.py:60-72``).  With ``return_counts=True`` also returns
        the exact per-bin candidate counts (B, BH, BW) int32 so callers can
        detect overflow (count > M).
    """
    B, P = points.shape[0], points.shape[1]
    H, W = int(image_size[0]), int(image_size[1])
    BH = (H - 1) // bin_size + 1
    BW = (W - 1) // bin_size + 1
    M = int(max_points_per_bin)

    # camera center; points back to world, then to view space
    from voge_tpu.cameras import camera_centers, world_to_view  # local import

    C = camera_centers(R, T)
    pts_world = points + C[:, None, :]
    pts_view = world_to_view(pts_world, R, T)
    z_view = pts_view[..., 2]
    # continuous pixel coords of centers
    u = pts_view[..., 0] * focal[:, 0:1] / z_view + principal[:, 0:1]
    v = pts_view[..., 1] * focal[:, 1:2] / z_view + principal[:, 1:2]

    # camera-rotated Lambda and pixel radii
    isig_cam = jnp.einsum("bji,bpjk,bkl->bpil", R, isigmas, R, precision=_P)
    radii = ellipse_pixel_radii(isig_cam, focal, thr, z_view)
    rx, ry = radii[..., 0], radii[..., 1]

    skip = z_view < 0

    # overlap tests against every bin (B, P, BH/BW)
    bx_edges = jnp.arange(BW, dtype=points.dtype) * bin_size
    by_edges = jnp.arange(BH, dtype=points.dtype) * bin_size
    x_overlap = (
        ((u - rx)[..., None] <= bx_edges[None, None, :] + bin_size)
        & (bx_edges[None, None, :] < (u + rx)[..., None])
    )
    y_overlap = (
        ((v - ry)[..., None] <= by_edges[None, None, :] + bin_size)
        & (by_edges[None, None, :] < (v + ry)[..., None])
    )
    # (B, BH, BW, P)
    overlap = (
        y_overlap[:, :, :, None]
        & x_overlap[:, :, None, :]
        & ~skip[:, :, None, None]
    ).transpose(0, 2, 3, 1)

    # deterministic capped compaction, ascending Gaussian index
    mask = overlap.reshape(B * BH * BW, P)
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1  # target slot
    counts = pos[:, -1] + 1
    row = jnp.broadcast_to(jnp.arange(B * BH * BW)[:, None], (B * BH * BW, P))
    b_of_row = jnp.arange(B * BH * BW, dtype=jnp.int32) // (BH * BW)
    flat_idx = jnp.arange(P, dtype=jnp.int32)[None, :] + (b_of_row * P)[:, None]
    pos_write = jnp.where(mask, pos, M)  # out-of-range -> dropped
    bin_points = jnp.full((B * BH * BW, M), -1, dtype=jnp.int32)
    bin_points = bin_points.at[row, pos_write].set(flat_idx, mode="drop")
    bin_points = bin_points.reshape(B, BH, BW, M)
    if return_counts:
        return bin_points, counts.reshape(B, BH, BW)
    return bin_points


def convert_to_box(isigmas: jax.Array, thr: float, z: jax.Array, matrix: jax.Array) -> jax.Array:
    """NDC-space box half-extents; literal port of ``RayTracing.py:33-39``
    for API parity / tests.

    :param isigmas: (B, N, 3, 3) camera-rotated Lambda
    :param z: (B, N) multiplier (the renderer passes 1/z_view)
    :param matrix: (B, 4, 4) projection matrix (only [:2,:2] used)
    :return: (B, N, 2)
    """
    m2 = matrix[:, None, :2, :2]
    inv2 = jnp.linalg.inv(isigmas[:, :, :2, :2])
    get = -math.log(thr) * m2 @ inv2 @ m2
    ones = jnp.ones(isigmas.shape[0:2] + (1, 2), dtype=isigmas.dtype)
    return jnp.sqrt((ones @ get))[..., 0, :] * z[..., None]
