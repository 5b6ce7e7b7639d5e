"""Pinhole camera model with PyTorch3D-compatible conventions (pure JAX).

The reference library leans on PyTorch3D for its camera model and ray
sampler (reference ``Renderer.py:7,124-128``, ``RayTracing.py:45-57``).  This
module provides a TPU-native equivalent implementing the same conventions:

  - world-to-view is the *row-vector* transform ``x_view = x_world @ R + T``;
  - the camera looks along +z in view space;
  - screen-space (``in_ndc=False``) cameras project with
    ``x_screen = fx * x_view / z_view + px`` (pixel units, origin at the
    image's top-left corner, pixel centers at integer + 0.5);
  - screen -> NDC is ``x_ndc = (W - 2 x_screen) / s`` with ``s = min(H, W)``
    (non-square NDC: the short side spans [-1, 1]; cf. the reference's
    ``rasterization_utils.cuh:16-42`` which uses the negated convention).

``look_at_view_transform`` / ``look_at_rotation`` reproduce the PyTorch3D
functions of the same name so reference demo scripts port with import changes
only.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from voge_tpu.utils import host_setup_context


Scalar = Union[float, int]


def _as_batched(x, last_dim: int, dtype=jnp.float32) -> jax.Array:
    """Convert scalars / sequences / arrays to shape (N, last_dim)."""
    x = jnp.asarray(x, dtype=dtype)
    if x.ndim == 0:
        x = x.reshape(1, 1)
    elif x.ndim == 1:
        # ambiguous: treat as batch of scalars
        x = x[:, None]
    if x.shape[-1] == 1 and last_dim > 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (last_dim,))
    assert x.shape[-1] == last_dim, f"expected last dim {last_dim}, got {x.shape}"
    return x


def camera_position_from_spherical_angles(
    distance, elevation, azimuth, degrees: bool = True,
    at=((0.0, 0.0, 0.0),), dtype=jnp.float32,
) -> jax.Array:
    """Camera centers from (dist, elev, azim); PyTorch3D convention:
    ``x = d cos(e) sin(a); y = d sin(e); z = d cos(e) cos(a)`` (+ ``at``)."""
    with host_setup_context(distance, elevation, azimuth, at):
        return _camera_position_from_spherical_angles(
            distance, elevation, azimuth, degrees=degrees, at=at, dtype=dtype
        )


def _camera_position_from_spherical_angles(
    distance, elevation, azimuth, degrees: bool = True,
    at=((0.0, 0.0, 0.0),), dtype=jnp.float32,
) -> jax.Array:
    dist = jnp.asarray(distance, dtype=dtype).reshape(-1)
    elev = jnp.asarray(elevation, dtype=dtype).reshape(-1)
    azim = jnp.asarray(azimuth, dtype=dtype).reshape(-1)
    n = max(dist.shape[0], elev.shape[0], azim.shape[0])
    dist, elev, azim = (jnp.broadcast_to(v, (n,)) for v in (dist, elev, azim))
    if degrees:
        elev = elev * (math.pi / 180.0)
        azim = azim * (math.pi / 180.0)
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    return jnp.stack([x, y, z], axis=-1) + jnp.asarray(at, dtype=dtype)


def look_at_rotation(
    camera_position, at=((0.0, 0.0, 0.0),), up=((0.0, 1.0, 0.0),),
    dtype=jnp.float32,
) -> jax.Array:
    """Rotation R (N,3,3) such that ``x_view = x_world @ R`` points the camera
    at ``at`` with up vector ``up`` (PyTorch3D ``look_at_rotation``)."""
    with host_setup_context(camera_position, at, up):
        return _look_at_rotation(camera_position, at, up, dtype=dtype)


def _look_at_rotation(
    camera_position, at=((0.0, 0.0, 0.0),), up=((0.0, 1.0, 0.0),),
    dtype=jnp.float32,
) -> jax.Array:
    camera_position = jnp.atleast_2d(jnp.asarray(camera_position, dtype=dtype))
    at = jnp.broadcast_to(jnp.asarray(at, dtype=dtype), camera_position.shape)
    up = jnp.broadcast_to(jnp.asarray(up, dtype=dtype), camera_position.shape)

    def normalize(v, eps=1e-5):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, eps)

    z_axis = normalize(at - camera_position)
    x_axis = normalize(jnp.cross(up, z_axis))
    y_axis = normalize(jnp.cross(z_axis, x_axis))
    # Degenerate case: up parallel to z -> replace x axis.
    is_close = jnp.all(jnp.isclose(x_axis, 0.0, atol=5e-3), axis=-1, keepdims=True)
    replacement = normalize(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(is_close, replacement, x_axis)
    R = jnp.stack((x_axis, y_axis, z_axis), axis=1)  # rows = axes
    return jnp.swapaxes(R, 1, 2)  # columns = axes


def look_at_view_transform(
    dist=1.0, elev=0.0, azim=0.0, degrees: bool = True,
    eye: Optional[Sequence] = None,
    at=((0.0, 0.0, 0.0),), up=((0.0, 1.0, 0.0),), dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """(R, T) for cameras looking at ``at`` (PyTorch3D-compatible).

    Setup math runs on the CPU backend when inputs are host values (see
    ``voge_tpu.utils.host_setup_context``); the returned arrays are
    uncommitted and combine freely with accelerator arrays downstream."""
    with host_setup_context(dist, elev, azim, eye, at, up):
        if eye is not None:
            C = jnp.atleast_2d(jnp.asarray(eye, dtype=dtype))
        else:
            C = _camera_position_from_spherical_angles(
                dist, elev, azim, degrees=degrees, at=at, dtype=dtype
            )
        at = jnp.broadcast_to(jnp.asarray(at, dtype=dtype), C.shape)
        up = jnp.broadcast_to(jnp.asarray(up, dtype=dtype), C.shape)
        R = _look_at_rotation(C, at, up, dtype=dtype)
        T = -jnp.einsum("nij,nj->ni", jnp.swapaxes(R, 1, 2), C,
                        precision=jax.lax.Precision.HIGHEST)
        return R, T


class PerspectiveCameras:
    """Batch of pinhole cameras, screen-space parameterization.

    Mirrors the subset of ``pytorch3d.renderer.PerspectiveCameras`` used by
    the reference (``in_ndc=False`` only, reference ``Renderer.py:103``).
    Attributes are plain arrays and may be reassigned (the renderer sets
    ``R`` / ``T`` / ``focal`` / ``principal`` from call kwargs, reference
    ``Renderer.py:104-109``).
    """

    def __init__(
        self,
        focal_length: Union[Scalar, Sequence] = 1.0,
        principal_point=((0.0, 0.0),),
        R: Optional[jax.Array] = None,
        T: Optional[jax.Array] = None,
        image_size=((256, 256),),
        in_ndc: bool = False,
        dtype=jnp.float32,
        device=None,  # accepted for API compat; ignored
    ):
        del device
        self._in_ndc = bool(in_ndc)
        self.dtype = dtype
        self.focal_length = _as_batched(focal_length, 2, dtype)
        self.principal_point = _as_batched(principal_point, 2, dtype)
        if isinstance(image_size, int):
            image_size = ((image_size, image_size),)
        image_size = tuple(tuple(int(v) for v in hw) for hw in jnp.asarray(image_size).reshape(-1, 2).tolist())
        self.image_size = image_size
        n = max(self.focal_length.shape[0], self.principal_point.shape[0],
                1 if R is None else jnp.asarray(R).reshape(-1, 3, 3).shape[0])
        self.R = (jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
                  if R is None else jnp.asarray(R, dtype=dtype).reshape(-1, 3, 3))
        self.T = (jnp.zeros((n, 3), dtype=dtype)
                  if T is None else jnp.asarray(T, dtype=dtype).reshape(-1, 3))

    # --- API compatibility helpers -------------------------------------
    def in_ndc(self) -> bool:
        return self._in_ndc

    @property
    def focal(self):
        return self.focal_length

    @focal.setter
    def focal(self, value):
        self.focal_length = _as_batched(value, 2, self.dtype)

    @property
    def principal(self):
        return self.principal_point

    @principal.setter
    def principal(self, value):
        self.principal_point = _as_batched(value, 2, self.dtype)

    def to(self, device):  # device-placement no-op for API parity
        return self

    @property
    def device(self):
        return None

    def __len__(self):
        return self.R.shape[0]

    # --- geometry -------------------------------------------------------
    def batched_params(self, batch: Optional[int] = None):
        """(R, T, focal, principal) broadcast to a common batch size."""
        n = batch if batch is not None else max(
            self.R.shape[0], self.T.shape[0],
            self.focal_length.shape[0], self.principal_point.shape[0],
        )
        R = jnp.broadcast_to(self.R, (n, 3, 3))
        T = jnp.broadcast_to(self.T, (n, 3))
        f = jnp.broadcast_to(self.focal_length, (n, 2))
        p = jnp.broadcast_to(self.principal_point, (n, 2))
        return R, T, f, p

    def get_camera_center(self) -> jax.Array:
        """World-space camera centers, (N, 3)."""
        R, T, _, _ = self.batched_params()
        return camera_centers(R, T)


# ---------------------------------------------------------------------------
# Functional geometry (jit-friendly; arrays in, arrays out)
# ---------------------------------------------------------------------------

def camera_centers(R: jax.Array, T: jax.Array) -> jax.Array:
    """World-space camera center C with ``C @ R + T = 0``.

    Uses an explicit matrix inverse to match the reference
    (``RayTracing.py:45``: ``C = -inverse(R^T) @ T``) even for
    slightly non-orthonormal R.
    """
    from voge_tpu.utils import inv3x3

    Rinv = inv3x3(R)  # (B,3,3)
    return -jnp.einsum("bj,bji->bi", T, Rinv, precision=jax.lax.Precision.HIGHEST)


def world_to_view(points: jax.Array, R: jax.Array, T: jax.Array) -> jax.Array:
    """``x_view = x_world @ R + T`` (row-vector convention). points (B,N,3)."""
    return (jnp.einsum("bnj,bji->bni", points, R,
                       precision=jax.lax.Precision.HIGHEST) + T[:, None, :])


def view_to_screen(points_view: jax.Array, focal: jax.Array, principal: jax.Array) -> jax.Array:
    """Perspective projection to continuous pixel coordinates.

    Returns (B, N, 3): (x_screen, y_screen, z_view).  Pixel (i row, j col)
    centers sit at (j + 0.5, i + 0.5).
    """
    z = points_view[..., 2:3]
    xy = principal[:, None, :] - points_view[..., 0:2] * focal[:, None, :] / z
    return jnp.concatenate([xy, z], axis=-1)


def screen_to_ndc_scale(image_size: Tuple[int, int]) -> float:
    """The NDC scale s = min(H, W): x_ndc = (W - 2 x_screen)/s."""
    return float(min(image_size))
