"""Mesh / pointcloud -> Gaussian converters.

numpy re-implementations of reference ``VoGE/Converter/Converters.py`` with
identical outputs.  The per-vertex mean-adjacent-edge-length computation
(reference ``Converters.py:10-32``, a Python loop over faces) is vectorized;
``naive_point_cloud_converter`` keeps the reference's k-NN formula
(``Converters.py:98-122`` — note it uses ``4 * log(1/p)`` where the mesh
converters use ``2 * log(1/p)``; reproduced as-is) but computes distances in
chunks with numpy instead of materializing the full (P, P) matrix through a
``Batchifier`` (whose invocation in the reference passes an invalid ``tbar``
kwarg — a latent bug we do not reproduce).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from voge_tpu.meshes import GaussianMeshes


def _to_numpy(x):
    if isinstance(x, np.ndarray):
        return x, False
    # torch tensors / jax arrays
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy(), True
    except ImportError:
        pass
    return np.asarray(x), True


def get_vert_edge_length(verts: np.ndarray, faces: np.ndarray, default_l: float = 1e-3) -> np.ndarray:
    """Mean distance from each vertex to its unique adjacent vertices
    (including itself, which contributes 0 to the sum but is excluded from
    the denominator — reference ``Converters.py:10-32`` semantics).

    Vectorized: build the unique undirected vertex-vertex adjacency from
    faces (each face links every pair of its vertices, self included via the
    reference's flat append).
    """
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    n = verts.shape[0]
    if faces.size == 0:
        return np.ones(n) * default_l
    from voge_tpu import native

    if native.available():
        got = native.vert_edge_length(verts, faces, default_l)
        if got is not None:
            return got.astype(np.float64)
    # reference: for each face f, each v in f records all of f's vertices
    # (including v itself); neighbors are then np.unique of those.
    k = faces.shape[1]
    # reference records only the first 3 vertices of each face as neighbors
    src = np.repeat(faces.reshape(-1), 3)                      # v
    dst = np.tile(faces[:, :3], (1, k)).reshape(-1)            # f[0:3]
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    src_u, dst_u = pairs[:, 0], pairs[:, 1]
    dist = np.linalg.norm(verts[src_u] - verts[dst_u], axis=1)
    len_sum = np.zeros(n)
    np.add.at(len_sum, src_u, dist)
    cnt = np.zeros(n, dtype=np.int64)
    np.add.at(cnt, src_u, 1)
    out = np.ones(n) * default_l
    has = cnt > 0
    # denominator = (#unique including self) - 1
    out[has] = len_sum[has] / np.maximum(cnt[has] - 1, 1)
    return out


def _default_l(vertices: np.ndarray) -> float:
    return (
        10.0
        * np.sum((vertices.max(axis=0) - vertices.min(axis=0)) ** 2) ** 0.5
        / vertices.shape[0]
    )


def naive_vertices_converter(vertices, faces, percentage: float = 0.5, max_sig_rate: float = -1):
    """Mesh -> isotropic Gaussians; sigma = len^2 / (2 ln(1/p)); returns
    *inverse* sigma (reference ``Converters.py:74-95``)."""
    vertices, was_tensor = _to_numpy(vertices)
    faces, _ = _to_numpy(faces)
    average_len = get_vert_edge_length(vertices, faces, _default_l(vertices))
    sigma = (average_len ** 2) / (2 * np.log(1 / percentage)) + 1e-10
    isigma = 1 / sigma
    if max_sig_rate > 0:
        thr = np.mean(isigma) * max_sig_rate
        isigma[isigma > thr] = thr
    return (
        vertices.astype(np.float32),
        isigma.astype(np.float32),
        None,
    )


def _look_at_rotation_np(camera_position: np.ndarray, at=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """numpy look_at_rotation (see :func:`voge_tpu.cameras.look_at_rotation`)."""
    cp = np.atleast_2d(np.asarray(camera_position, dtype=np.float64))
    at = np.broadcast_to(np.asarray(at, dtype=np.float64), cp.shape)
    up = np.broadcast_to(np.asarray(up, dtype=np.float64), cp.shape)

    def normalize(v, eps=1e-5):
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.maximum(n, eps)

    z_axis = normalize(at - cp)
    x_axis = normalize(np.cross(up, z_axis))
    y_axis = normalize(np.cross(z_axis, x_axis))
    is_close = np.all(np.isclose(x_axis, 0.0, atol=5e-3), axis=-1, keepdims=True)
    replacement = normalize(np.cross(y_axis, z_axis))
    x_axis = np.where(is_close, replacement, x_axis)
    R = np.stack((x_axis, y_axis, z_axis), axis=1)
    return np.swapaxes(R, 1, 2)


def normal_mesh_converter(
    vertices, faces, normals, percentage: float = 0.5, shape_ratio: float = 0.5,
    max_sig_rate: float = -1, auto_fix: bool = True,
):
    """Mesh -> anisotropic Gaussians flattened along the vertex normal
    (reference ``Converters.py:35-71``)."""
    vertices, _ = _to_numpy(vertices)
    faces, _ = _to_numpy(faces)
    normals, _ = _to_numpy(normals)

    average_len = get_vert_edge_length(vertices, faces, _default_l(vertices))
    isigma_base = 1 / ((average_len ** 2) / (2 * np.log(1 / percentage)) + 1e-10)

    nrm2 = (normals ** 2).sum(-1)
    assert nrm2.max() < 1.1 and nrm2.min() > 0.9, "normals must be unit length"

    base_ = (
        np.array([[1, 0, 0], [0, 1, 0], [0, 0, shape_ratio]])[None, ...]
        * isigma_base.reshape((-1, 1, 1))
    )
    rotations_matrix = _look_at_rotation_np(-normals)
    isigma = rotations_matrix @ base_ @ rotations_matrix.transpose(0, 2, 1)

    if auto_fix:
        dets = np.linalg.det(isigma)
        isigma[dets == 0] = np.eye(3)[None, ...] * isigma_base[dets == 0].reshape((-1, 1, 1))
    if max_sig_rate > 0:
        thr = np.mean(isigma) * max_sig_rate
        isigma[isigma > thr] = thr
    return vertices.astype(np.float32), isigma.astype(np.float32), None


def naive_point_cloud_converter(points, percentage: float = 0.5, n_nearest: int = 4, thr_max: float = 2):
    """Pointcloud -> isotropic Gaussians from clipped k-NN mean distance
    (reference ``Converters.py:98-122``; chunked to bound memory)."""
    points, _ = _to_numpy(points)
    points = points.astype(np.float32)
    n = points.shape[0]
    from voge_tpu import native

    if native.available():
        average_len = native.knn_mean_dist(points, n_nearest, thr_max)
        if average_len is not None:
            sigma = (average_len.astype(np.float64) ** 2) / (
                4 * np.log(1 / percentage)
            ) + 1e-8
            return points, (1 / sigma).astype(np.float32), None
    chunk = max(1, int(1e9 / max(n, 1))) if n > 1e5 else n
    sigmas = np.empty(n, dtype=np.float64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        d2 = ((points[s:e, None, :] - points[None, :, :]) ** 2).sum(-1)
        dist = np.sqrt(d2)
        # k smallest (includes self-distance 0, like torch.topk largest=False)
        part = np.partition(dist, n_nearest - 1, axis=1)[:, :n_nearest]
        part = np.sort(part, axis=1)
        average_len = np.minimum(
            part, part.mean(axis=1, keepdims=True) * thr_max
        ).mean(axis=1)
        sigmas[s:e] = (average_len ** 2) / (4 * np.log(1 / percentage))
    sigma = sigmas + 1e-8
    isigma = (1 / sigma).astype(np.float32)
    return points, isigma, None


def fixed_pointcloud_converter(points, radius, percentage: float = 0.5):
    """Fixed-radius pointcloud -> Gaussians (reference ``Converters.py:125-139``)."""
    points, _ = _to_numpy(points)
    if not isinstance(radius, float):
        radius, _ = _to_numpy(radius)
    isigma = np.ones(points.shape[0]) / (
        (np.asarray(radius) ** 2) / (2 * np.log(1 / percentage)) + 1e-10
    )
    return points.astype(np.float32), isigma.astype(np.float32), None


def convert_path(source_path, destiny_path, convert_function, filter_=None):
    """Batch directory conversion (reference ``Converters.py:142-155``)."""
    this_fl_list = os.listdir(source_path)
    os.makedirs(destiny_path, exist_ok=True)
    for this_name in this_fl_list:
        this_source_path = os.path.join(source_path, this_name)
        this_destiny_path = os.path.join(destiny_path, this_name)
        if os.path.isfile(this_source_path):
            if filter_ is not None and not filter_(this_name):
                continue
            convert_function(this_source_path, this_destiny_path)
        else:
            convert_path(this_source_path, this_destiny_path, convert_function)


class ComposedConverter:
    """loader -> converter -> saver pipeline (reference ``Converters.py:158-173``)."""

    def __init__(self, loader, saver, converter, **kwargs):
        self.loader = loader
        self.saver = saver
        self.converter = converter
        self.kwargs = kwargs

    def __call__(self, source_path, destiny_path):
        get = self.loader(source_path)
        if not isinstance(get, tuple):
            get = (get,)
        get = self.converter(*get, **self.kwargs)
        if not isinstance(get, tuple):
            get = (get,)
        self.saver(destiny_path, *get)


def to_gaussian_mesh(converter, **kwargs):
    """Wrap a converter to return a :class:`GaussianMeshes`
    (the jax analog of reference ``pytorch3d2gaussian``, ``Converters.py:176-194``).

    The wrapped function accepts (vertices, faces) for mesh converters or
    (points,) for pointcloud converters.
    """

    def wrapper(*arrays, **mesh_kwargs):
        verts, sigmas, radians = converter(*arrays, **kwargs)
        return GaussianMeshes(
            np.asarray(verts, dtype=np.float32),
            np.asarray(sigmas, dtype=np.float32),
            None if radians is None else np.asarray(radians, dtype=np.float32),
            **mesh_kwargs,
        )

    return wrapper


# alias for reference-API familiarity (works on raw arrays, not pytorch3d
# structures — pass (verts, faces) or (points,))
pytorch3d2gaussian = to_gaussian_mesh
