"""Procedural cuboid scene generator.

Re-implementation of reference ``VoGE/Converter/Cuboid.py`` with identical
vertex ordering and sigma formula: surface points are sampled on a regular
grid over the 6 faces (bottom z, top z, then the four side walls excluding
the z-edge rows), with one scalar isotropic isigma derived from the grid
edge length.
"""
from __future__ import annotations

import numpy as np

from voge_tpu.meshes import GaussianMeshes


def _grid_samples(x_range, y_range, z_range, number_vertices):
    w, h, d = (
        x_range[1] - x_range[0],
        y_range[1] - y_range[0],
        z_range[1] - z_range[0],
    )
    total_area = (w * h + h * d + w * d) * 2
    # two triangles' worth of surface area per sampled vertex
    mesh_size = total_area / (number_vertices * 2)
    edge_length = (mesh_size * 2) ** 0.5
    x_samples = x_range[0] + np.linspace(0, w, int(w / edge_length + 1))
    y_samples = y_range[0] + np.linspace(0, h, int(h / edge_length + 1))
    z_samples = z_range[0] + np.linspace(0, d, int(d / edge_length + 1))
    return x_samples, y_samples, z_samples, edge_length


def cuboid_gauss(
    x_range, y_range, z_range, number_vertices, percentage: float = 0.5,
    colors=None, as_obj: bool = False,
):
    """Sample a cuboid surface as isotropic Gaussians
    (reference ``Cuboid.py:8-67``).

    :return: (verts (N,3), isigma (N,), [colors (N,3)]) or
        :class:`GaussianMeshes` when ``as_obj=True``.
    """
    xs, ys, zs, edge_length = _grid_samples(x_range, y_range, z_range, number_vertices)
    xn, yn, zn = xs.size, ys.size, zs.size

    out_vertices = []
    counts = [
        yn * xn, yn * xn,
        (zn - 2) * (xn - 1), (zn - 2) * (xn - 1),
        (zn - 2) * (yn - 1), (zn - 2) * (yn - 1),
    ]
    # bottom / top z faces
    for n in range(yn):
        for m in range(xn):
            out_vertices.append((xs[m], ys[n], zs[0]))
    for n in range(yn):
        for m in range(xn):
            out_vertices.append((xs[m], ys[n], zs[-1]))
    # side walls (interior z rows only)
    for n in range(1, zn - 1):
        for m in range(xn - 1):
            out_vertices.append((xs[m], ys[0], zs[n]))
    for n in range(1, zn - 1):
        for m in range(1, xn):
            out_vertices.append((xs[m], ys[-1], zs[n]))
    for n in range(1, zn - 1):
        for m in range(1, yn):
            out_vertices.append((xs[0], ys[m], zs[n]))
    for n in range(1, zn - 1):
        for m in range(yn - 1):
            out_vertices.append((xs[-1], ys[m], zs[n]))

    sigma = (edge_length ** 2) / (2 * np.log(1 / percentage)) + 1e-10
    isigma = 1 / sigma
    verts = np.array(out_vertices)
    isigmas = np.ones(len(out_vertices)) * isigma

    if colors is not None:
        out_colors = np.concatenate(
            [np.repeat(c[None, :], r, axis=0) for r, c in zip(counts, colors)],
            axis=0,
        )
        if as_obj:
            return (
                GaussianMeshes(
                    verts=verts.astype(np.float32),
                    sigmas=isigmas.astype(np.float32),
                ),
                out_colors,
            )
        return verts, isigmas, out_colors

    if as_obj:
        return GaussianMeshes(
            verts=verts.astype(np.float32), sigmas=isigmas.astype(np.float32)
        )
    return verts, isigmas


def cuboid_mesh(x_range, y_range, z_range, number_vertices, colors=None, as_obj: bool = False):
    """Triangle-mesh cuboid for baselines (reference ``Cuboid.py:70-159``).

    :return: (verts (N,3), faces (F,3), [colors]) — ``as_obj`` returns the
        raw arrays too (we have no Meshes structure; wrap as needed).
    """
    xs, ys, zs, _ = _grid_samples(x_range, y_range, z_range, number_vertices)
    xn, yn, zn = xs.size, ys.size, zs.size

    counts = [yn * xn, yn * xn, zn * xn, zn * xn, zn * yn, zn * yn]
    out_vertices = []
    out_faces = []
    base_idx = 0

    def grid_face(a_samples, b_samples, point_fn):
        nonlocal base_idx
        an, bn = a_samples.size, b_samples.size
        for n in range(an):
            for m in range(bn):
                out_vertices.append(point_fn(b_samples[m], a_samples[n]))
        for m in range(an - 1):
            for n in range(bn - 1):
                out_faces.append(
                    (base_idx + m * bn + n, base_idx + m * bn + n + 1, base_idx + (m + 1) * bn + n)
                )
                out_faces.append(
                    (base_idx + (m + 1) * bn + n + 1, base_idx + m * bn + n + 1, base_idx + (m + 1) * bn + n)
                )
        base_idx += an * bn

    grid_face(ys, xs, lambda x, y: (x, y, zs[0]))
    grid_face(ys, xs, lambda x, y: (x, y, zs[-1]))
    grid_face(zs, xs, lambda x, z: (x, ys[0], z))
    grid_face(zs, xs, lambda x, z: (x, ys[-1], z))
    grid_face(zs, ys, lambda y, z: (xs[0], y, z))
    grid_face(zs, ys, lambda y, z: (xs[-1], y, z))

    verts = np.array(out_vertices)
    faces = np.array(out_faces)
    if colors is not None:
        out_colors = np.concatenate(
            [np.repeat(c[None, :], r, axis=0) for r, c in zip(counts, colors)],
            axis=0,
        )
        return verts, faces, out_colors
    return verts, faces
