"""OFF / COFF / GOFF file IO.

Byte-compatible re-implementation of reference ``VoGE/Converter/IO.py``.
GOFF ("Gaussian OFF") text format (reference ``IO.py:5-8``)::

    GOFF
    N_vertices sigma_shape(1|3|6|9) if_radian(1|0)
    <N point lines: x y z>
    <N sigma lines>
    [<N radian lines>]

A fast C parser is used when the optional native extension is built
(:mod:`voge_tpu.native`); the numpy fallback is always available.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def _parse_floats(lines) -> np.ndarray:
    return np.fromstring(" ".join(lines), dtype=np.float32, sep=" ")


def _fromtext(text: str, dtype) -> np.ndarray:
    if dtype is np.float32 or dtype == np.float32:
        from voge_tpu import native

        if native.available():
            # generous bound: every other byte could start a number
            return native.parse_floats(text, len(text) // 2 + 2)
    return np.array(text.split(), dtype=dtype)


def load_off(file_name, to_torch: bool = False, ignore_color: bool = False):
    """Load OFF/COFF mesh (behavior of reference ``IO.py:11-58``; fresh
    header-parse / block-slice implementation).

    The file is two numeric blocks after a 2-line header: ``n_points``
    vertex rows of ``3 [+ color]`` floats, then ``n_faces`` face rows of
    ``arity idx... [color...]`` ints.  Each block is parsed in one pass
    and the optional color columns are split off by width.

    :return: (verts, faces[, vert_color][, face_color]) numpy arrays
        (torch tensors with ``to_torch=True``).
    """
    with open(file_name) as file_handle:
        lines = file_handle.readlines()

    head = lines[0]
    # prefix match on the raw magic line; COFF carries color columns
    has_color = (not ignore_color) and head[:4] == "COFF"
    if not ignore_color and not (has_color or head[:3] == "OFF"):
        raise Exception("Unsupported OFF format: %s" % head.strip())

    counts = lines[1].split()
    n_points, n_faces = int(counts[0]), int(counts[1])

    vb = _fromtext("".join(lines[2 : 2 + n_points]), np.float32)
    vb = vb.reshape((n_points, -1))
    fb = _fromtext("".join(lines[2 + n_points :]), np.int32)
    fb = fb.reshape((n_faces, -1)) if n_faces > 0 else fb.reshape((0, 4))
    arity = int(fb[0, 0]) if n_faces > 0 else 3

    parts = {"verts": vb[:, 0:3], "faces": fb[:, 1 : arity + 1]}
    if has_color and vb.shape[1] > 3:
        parts["vert_color"] = vb[:, 3:]
    if has_color and n_faces > 0 and fb.shape[1] > arity + 1:
        parts["face_color"] = fb[:, arity + 1 :]

    out = [
        parts[k]
        for k in ("verts", "faces", "vert_color", "face_color")
        if k in parts
    ]
    if to_torch:
        import torch

        return tuple(torch.from_numpy(t) for t in out)
    return tuple(out)


def load_goff(file_name, to_torch: bool = False):
    """Load a GOFF Gaussian scene (reference ``IO.py:61-88``).

    :return: (points (N,3), sigma, radian or None)
    """
    with open(file_name) as file_handle:
        file_list = file_handle.readlines()
    header = file_list[1].split(" ")
    n_points = int(header[0])
    l_sigma = int(header[1])
    if_radian = bool(int(header[2]))

    points = _fromtext("".join(file_list[2 : 2 + n_points]), np.float32).reshape((-1, 3))
    sigma = _fromtext(
        "".join(file_list[2 + n_points : 2 + n_points * 2]), np.float32
    ).reshape((-1, l_sigma))

    if l_sigma == 6:
        sigma = tuple(np.split(sigma, [3], axis=1))
    elif l_sigma == 9:
        sigma = sigma.reshape((-1, 3, 3))
    elif l_sigma == 1:
        sigma = sigma.reshape(-1)

    if if_radian:
        radian = _fromtext("".join(file_list[2 + n_points * 2 :]), np.float32)
    else:
        radian = None

    if to_torch:
        import torch

        return (
            torch.from_numpy(points),
            torch.from_numpy(sigma) if isinstance(sigma, np.ndarray) else sigma,
            torch.from_numpy(radian) if radian is not None else None,
        )
    return points, sigma, radian


def _np(x):
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def save_off(file_name, vertices, faces, vert_color=None, face_color=None):
    """Save OFF/COFF mesh (reference ``IO.py:91-126``)."""
    vertices = _np(vertices)
    faces = _np(faces)
    out = ["OFF\n" if (vert_color is None and face_color is None) else "COFF\n"]
    out.append("%d %d 0\n" % (vertices.shape[0], faces.shape[0]))
    if vert_color is None:
        for v in vertices:
            out.append("%.16f %.16f %.16f\n" % (v[0], v[1], v[2]))
    else:
        vert_color = _np(vert_color)
        for v, c in zip(vertices, vert_color):
            out.append(
                "%.16f %.16f %.16f" % (v[0], v[1], v[2])
                + (" %.16f" * len(c)) % tuple(c)
                + "\n"
            )
    if face_color is None:
        for f in faces:
            out.append("3 %d %d %d\n" % (f[0], f[1], f[2]))
    else:
        face_color = _np(face_color)
        for f, c in zip(faces, face_color):
            out.append(
                "3 %d %d %d\n" % (f[0], f[1], f[2])
                + (" %.16f" * len(c)) % tuple(c)
                + "\n"
            )
    with open(file_name, "w") as fl:
        fl.write("".join(out))


def save_goff(file_name, points, sigmas, radians=None):
    """Save a GOFF Gaussian scene (reference ``IO.py:129-163``)."""
    if isinstance(sigmas, tuple):
        sigmas = np.concatenate([_np(s) for s in sigmas], axis=1)
    points = _np(points)
    sigmas = _np(sigmas)
    if radians is not None:
        radians = _np(radians)

    if sigmas.ndim > 2:
        sigmas = sigmas.reshape((sigmas.shape[0], -1))
    if sigmas.ndim == 1:
        sigmas = sigmas[:, None]
    l_sigma = sigmas.shape[1]

    out = ["GOFF\n"]
    out.append("%d %d %d\n" % (points.shape[0], l_sigma, 0 if radians is None else 1))
    for v in points:
        out.append((("%.16f " * v.size) % tuple(v))[0:-2] + "\n")
    for v in sigmas:
        out.append((("%.16f " * v.size) % tuple(v))[0:-2] + "\n")
    if radians is not None:
        for v in radians:
            out.append("%.16f\n" % v)
    with open(file_name, "w") as fl:
        fl.write("".join(out))


def to_jax(*args):
    """numpy -> jnp float32 (None passthrough)."""
    import jax.numpy as jnp

    return [
        jnp.asarray(t, dtype=jnp.float32) if t is not None else None for t in args
    ]


# API-parity alias: the reference exposes ``to_torch`` (IO.py:166); in this
# framework the natural target is jax.
to_torch = to_jax


def pre_process_pascal(verts, *args):
    """PASCAL axis swap (reference ``IO.py:170-175``)."""
    verts = _np(verts)
    verts = np.concatenate((verts[:, 0:1], verts[:, 2:3], -verts[:, 1:2]), axis=1)
    return (verts,) + args
