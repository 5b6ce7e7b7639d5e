"""Gradient-based Gaussian-scene fitting.

Packages the training loops of the reference demos (ShapeFitting,
ReasonOcclusion, EfficientCuboidViaOptimization) as a reusable trainer with
single-chip and multi-chip (shard_map) step functions.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from voge_tpu.renderer import (
    get_silhouette,
    interpolate_attr,
    render_pipeline,
)
from voge_tpu.parallel.shard import render_pipeline_sharded


class ShapeFitter:
    """Fit Gaussian centers / (inverse) covariances / colors to target
    multi-view RGB + silhouettes.

    :param params: dict with any of "verts" (N,3), "sigmas", "colors" (N,3);
        non-optimized quantities go in ``fixed``.
    :param mesh: optional ``jax.sharding.Mesh`` — when given, renders run
        under shard_map with cameras on ``data_axis`` and Gaussians on
        ``model_axis``.
    """

    def __init__(
        self,
        params: Dict[str, jax.Array],
        fixed: Optional[Dict[str, jax.Array]] = None,
        *,
        image_size: Tuple[int, int],
        focal, principal,
        max_assign: int = 25,
        thr_activation: float = 0.01,
        max_point_per_bin: Optional[int] = -1,
        w_rgb: float = 1.0,
        w_sil: float = 1.0,
        optimizer: Optional[optax.GradientTransformation] = None,
        mesh=None,
        data_axis: str = "data",
        model_axis: Optional[str] = "model",
    ):
        self.params = dict(params)
        self.fixed = dict(fixed or {})
        self.image_size = tuple(image_size)
        self.focal = jnp.asarray(focal, jnp.float32).reshape(1, -1)[:, :2]
        self.principal = jnp.asarray(principal, jnp.float32).reshape(1, -1)[:, :2]
        self.settings = dict(
            image_size=self.image_size, max_assign=max_assign,
            thr_activation=thr_activation, max_point_per_bin=max_point_per_bin,
        )
        self.w_rgb, self.w_sil = w_rgb, w_sil
        self.opt = optimizer or optax.sgd(0.8, momentum=0.9)
        self.opt_state = self.opt.init(self.params)
        self.mesh = mesh
        self.data_axis, self.model_axis = data_axis, model_axis
        self._step = jax.jit(self._make_step())

    def _get(self, params, name):
        if name in params:
            return params[name]
        return self.fixed[name]

    def _render(self, params, R, T):
        B = R.shape[0]
        focal = jnp.broadcast_to(self.focal, (B, 2))
        principal = jnp.broadcast_to(self.principal, (B, 2))
        verts = self._get(params, "verts")
        sigmas = self._get(params, "sigmas")
        if self.mesh is not None:
            frag = render_pipeline_sharded(
                verts, sigmas, R, T, focal, principal, mesh=self.mesh,
                data_axis=self.data_axis, model_axis=self.model_axis,
                **self.settings,
            )
        else:
            frag = render_pipeline(
                verts, sigmas, R, T, focal, principal, **self.settings
            )
        rgb = interpolate_attr(frag, self._get(params, "colors"))
        sil = get_silhouette(frag)
        return rgb, sil

    def _make_step(self):
        def loss_fn(params, R, T, target_rgb, target_sil):
            rgb, sil = self._render(params, R, T)
            loss = 0.0
            if self.w_sil:
                loss = loss + self.w_sil * jnp.mean((sil - target_sil) ** 2)
            if self.w_rgb:
                loss = loss + self.w_rgb * jnp.mean((rgb - target_rgb) ** 2)
            return loss

        def step(params, opt_state, R, T, target_rgb, target_sil):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, R, T, target_rgb, target_sil
            )
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def render(self, R, T):
        return self._render({**self.fixed, **self.params}, R, T)

    def step(self, R, T, target_rgb, target_sil) -> float:
        """One optimization step on a batch of views; returns the loss."""
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, R, T, target_rgb, target_sil
        )
        return float(loss)

    def fit(self, R, T, target_rgb, target_sil, iters: int,
            views_per_iter: Optional[int] = None, seed: int = 0,
            log_every: int = 0) -> float:
        """Run ``iters`` steps, sampling ``views_per_iter`` random views per
        step (reference ShapeFitting loop structure)."""
        import numpy as np

        rng = np.random.RandomState(seed)
        n = R.shape[0]
        loss = float("nan")
        for i in range(iters):
            if views_per_iter is not None and views_per_iter < n:
                js = rng.permutation(n)[:views_per_iter]
            else:
                js = np.arange(n)
            loss = self.step(R[js], T[js], target_rgb[js], target_sil[js])
            if log_every and (i + 1) % log_every == 0:
                print(f"iter {i + 1}: loss {loss:.6f}")
        return loss
