"""Scene and training-state persistence.

The reference's only persistence is the GOFF text format plus torch
``nn.Parameter`` state (SURVEY §5).  Here:

  - GOFF stays the interchange format (byte-compatible reader/writer in
    :mod:`voge_tpu.converter.io`);
  - :func:`save_scene` / :func:`load_scene` persist a
    :class:`~voge_tpu.meshes.GaussianMeshes` (+ arbitrary extra arrays,
    e.g. colors/features) as a compressed ``.npz`` — exact float32
    round-trip, unlike text GOFF;
  - :func:`save_train_state` / :func:`load_train_state` persist arbitrary
    pytrees (params + optimizer state) for checkpoint/resume of fitting
    loops.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax

from voge_tpu.meshes import GaussianMeshes, GaussianMeshesNaive


def save_scene(path: str, gmesh, **extra_arrays) -> None:
    """Save a Gaussian scene (and optional per-kernel arrays) to .npz."""
    verts, sigmas, radians = gmesh()
    data = {"verts": np.asarray(verts), "sigmas": np.asarray(sigmas)}
    if radians is not None:
        data["radians"] = np.asarray(radians)
    if isinstance(gmesh, GaussianMeshes):
        data["gradianted_args"] = np.asarray(gmesh.gradianted_args)
    for k, v in extra_arrays.items():
        data[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_scene(path: str, naive: bool = False):
    """Load a scene saved by :func:`save_scene`.

    :return: (GaussianMeshes or GaussianMeshesNaive, dict of extra arrays)
    """
    with np.load(path) as z:
        verts = z["verts"]
        sigmas = z["sigmas"]
        radians = z["radians"] if "radians" in z else None
        extras = {
            k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
        }
        if naive or "gradianted_args" not in z:
            mesh = GaussianMeshesNaive(verts, sigmas, radians)
        else:
            mesh = GaussianMeshes(
                verts, sigmas, radians,
                gradianted_args=[bool(b) for b in z["gradianted_args"]],
            )
    return mesh, extras


def save_train_state(path: str, state: Any) -> None:
    """Persist an arbitrary pytree (params, optimizer state, step counters)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_train_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_train_state` into the structure
    of ``like`` (leaf order must match; the stored treedef repr is checked)."""
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as z:
        stored = z["__treedef__"].tobytes().decode()
        if stored != repr(treedef):
            raise ValueError(
                "checkpoint structure mismatch:\n saved: %s\n want:  %s"
                % (stored, repr(treedef))
            )
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
