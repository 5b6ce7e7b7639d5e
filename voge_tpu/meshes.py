"""Gaussian-ellipsoid scene structures (pytrees).

Mirrors reference ``VoGE/Meshes.py``: a scene is N Gaussian kernels with
centers ``verts (N,3)``, (inverse-)covariances ``sigmas`` of shape ``(N,)``
(isotropic), ``(N,3)`` (diagonal) or ``(N,3,3)``, and an optional ``radians``
field that is carried through the API and the GOFF format but ignored by the
renderer (reference ``Renderer.py:111`` unpacks and ignores it).

In JAX, parameters are just arrays — ``GaussianMeshes`` is a registered
pytree so it can be passed through ``jit`` / ``grad`` / optimizers directly.
Per-field trainability (the reference's ``gradianted_args`` /
``grad_parameters``, ``Meshes.py:30-54``) maps to selecting leaves for your
optimizer (e.g. via ``optax.masked``); ``grad_parameters()`` is kept for
API familiarity.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class GaussianMeshesNaive:
    """Plain container; ``__call__`` returns (verts, sigmas, radians)."""

    def __init__(self, verts, sigmas, radians=None):
        self.verts = jnp.asarray(verts) if verts is not None else None
        self.sigmas = jnp.asarray(sigmas) if sigmas is not None else None
        self.radians = jnp.asarray(radians) if radians is not None else None

    def to(self, device=None):  # device no-op for API parity
        return self

    def __call__(self):
        return self.verts, self.sigmas, self.radians

    def __getitem__(self, item):
        return type(self)(
            self.verts[item],
            self.sigmas[item],
            None if self.radians is None else self.radians[item],
        )

    # pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.verts, self.sigmas, self.radians), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.verts, obj.sigmas, obj.radians = children
        return obj


@jax.tree_util.register_pytree_node_class
class GaussianMeshes(GaussianMeshesNaive):
    """Trainable variant (reference ``Meshes.py:30``).

    ``gradianted_args`` is a list of 3 bools marking (verts, sigmas, radians)
    trainable; it is static metadata (part of the pytree aux data).
    """

    def __init__(self, verts, sigmas, radians=None, gradianted_args=None):
        super().__init__(verts, sigmas, radians)
        if gradianted_args is None:
            gradianted_args = [True, True, True]
        gradianted_args = list(gradianted_args)
        if self.radians is None:
            gradianted_args[2] = False
        self.gradianted_args = gradianted_args

    def grad_parameters(self):
        out = []
        if self.gradianted_args[0]:
            out.append(self.verts)
        if self.gradianted_args[1]:
            out.append(self.sigmas)
        if self.gradianted_args[2]:
            out.append(self.radians)
        return tuple(out)

    def trainable_mask(self) -> "GaussianMeshes":
        """Pytree of bools with the same structure, for optax.masked."""
        obj = GaussianMeshes.__new__(GaussianMeshes)
        obj.verts = self.gradianted_args[0]
        obj.sigmas = self.gradianted_args[1]
        obj.radians = self.gradianted_args[2] if self.radians is not None else None
        obj.gradianted_args = self.gradianted_args
        return obj

    def forward(self):
        return self()

    def tree_flatten(self):
        return (self.verts, self.sigmas, self.radians), tuple(self.gradianted_args)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.verts, obj.sigmas, obj.radians = children
        obj.gradianted_args = list(aux)
        return obj


DeformedGaussianMeshes = GaussianMeshes
