"""Camera projection-matrix helper (reference ``VoGE/CameraOP.py``).

The reference wraps pytorch3d's ``_get_sfm_calibration_matrix``; that module
is dead code there (referenced nowhere else) but is part of the public
surface, so the equivalent is provided: the SfM-style perspective
calibration matrix in the row-vector convention used throughout
(``x_hom = x @ K``), matching the matrix the reference's coarse stage math
composes against (cf. ``RayTracing.py:48-55``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_projection_transform(focal, principal_point, dtype=jnp.float32) -> jax.Array:
    """4x4 SfM calibration matrices (N, 4, 4), row-vector convention:

        x @ K = (fx x + px z, fy y + py z, 1, z)

    so ``transform_points`` (divide by last coordinate) yields
    (fx x/z + px, fy y/z + py, 1/z).

    :param focal: scalar, (N,), (N,1) or (N,2)
    :param principal_point: (N, 2)
    """
    from voge_tpu.cameras import _as_batched

    f = _as_batched(focal, 2, dtype)
    p = _as_batched(principal_point, 2, dtype)
    n = max(f.shape[0], p.shape[0])
    f = jnp.broadcast_to(f, (n, 2))
    p = jnp.broadcast_to(p, (n, 2))
    K = jnp.zeros((n, 4, 4), dtype=dtype)
    K = K.at[:, 0, 0].set(f[:, 0])
    K = K.at[:, 1, 1].set(f[:, 1])
    K = K.at[:, 2, 0].set(p[:, 0])
    K = K.at[:, 2, 1].set(p[:, 1])
    K = K.at[:, 2, 3].set(1.0)
    K = K.at[:, 3, 2].set(1.0)
    return K
