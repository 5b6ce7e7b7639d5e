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


def _face_points(fast, slow, fixed, axes):
    """All (fast x slow) grid points of one cuboid face as an (n, 3) block:
    ``fast`` varies within a row, ``slow`` across rows, ``fixed`` is the
    face's constant coordinate.  ``axes`` maps (fast, slow, fixed) onto
    (x, y, z) output columns."""
    F, S = np.meshgrid(fast, slow)  # (slow, fast): fast varies last
    cols = {axes[0]: F.ravel(), axes[1]: S.ravel(),
            axes[2]: np.full(F.size, fixed)}
    return np.stack([cols["x"], cols["y"], cols["z"]], axis=1)


def cuboid_gauss(
    x_range, y_range, z_range, number_vertices, percentage: float = 0.5,
    colors=None, as_obj: bool = False,
):
    """Sample a cuboid surface as isotropic Gaussians — same point set and
    emission order as reference ``Cuboid.py:8-67`` (colors map onto faces
    by block position): the two z faces carry full grids; the four side
    walls carry only interior-z rows, each dropping one vertical edge
    column so the wall seams are covered exactly once.

    :return: (verts (N,3), isigma (N,), [colors (N,3)]) or
        :class:`GaussianMeshes` when ``as_obj=True``.
    """
    xs, ys, zs, edge_length = _grid_samples(x_range, y_range, z_range, number_vertices)
    xn, yn, zn = xs.size, ys.size, zs.size
    z_in = zs[1:-1]  # interior rows; z edges belong to the z faces

    faces = [
        _face_points(xs, ys, zs[0], "xyz"),        # bottom
        _face_points(xs, ys, zs[-1], "xyz"),       # top
        _face_points(xs[:-1], z_in, ys[0], "xzy"),  # y=min wall, drops x max
        _face_points(xs[1:], z_in, ys[-1], "xzy"),  # y=max wall, drops x min
        _face_points(ys[1:], z_in, xs[0], "yzx"),   # x=min wall, drops y min
        _face_points(ys[:-1], z_in, xs[-1], "yzx"),  # x=max wall, drops y max
    ]
    counts = [f.shape[0] for f in faces]
    verts = np.concatenate(faces, axis=0)

    sigma = (edge_length ** 2) / (2 * np.log(1 / percentage)) + 1e-10
    isigma = 1 / sigma
    isigmas = np.ones(verts.shape[0]) * isigma

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

    def quad_tris(an, bn, base):
        """Two counter-wound triangles per grid quad, quad-major order:
        (v, v+1, v+bn) then (v+bn+1, v+1, v+bn) for v = base + m*bn + n."""
        v = base + (np.arange(an - 1)[:, None] * bn + np.arange(bn - 1))
        tri1 = np.stack([v, v + 1, v + bn], axis=-1)
        tri2 = np.stack([v + bn + 1, v + 1, v + bn], axis=-1)
        return np.stack([tri1, tri2], axis=2).reshape(-1, 3)

    # full (a x b) grids on all six faces (unlike cuboid_gauss, seams are
    # duplicated — each face is an independent triangulated patch)
    blocks = [
        (_face_points(xs, ys, zs[0], "xyz"), ys.size, xs.size),
        (_face_points(xs, ys, zs[-1], "xyz"), ys.size, xs.size),
        (_face_points(xs, zs, ys[0], "xzy"), zs.size, xs.size),
        (_face_points(xs, zs, ys[-1], "xzy"), zs.size, xs.size),
        (_face_points(ys, zs, xs[0], "yzx"), zs.size, ys.size),
        (_face_points(ys, zs, xs[-1], "yzx"), zs.size, ys.size),
    ]
    counts = [pts.shape[0] for pts, _, _ in blocks]
    bases = np.cumsum([0] + counts[:-1])
    verts = np.concatenate([pts for pts, _, _ in blocks], axis=0)
    faces = np.concatenate(
        [quad_tris(an, bn, base)
         for (_, an, bn), base in zip(blocks, bases)], axis=0,
    )
    if colors is not None:
        out_colors = np.concatenate(
            [np.repeat(c[None, :], r, axis=0) for r, c in zip(counts, colors)],
            axis=0,
        )
        return verts, faces, out_colors
    return verts, faces
