"""Efficient cuboid representation via covariance optimization
(reference ``demo/EfficientCuboidViaOptimization.py``): represent a cuboid
with only 6 x 17 Gaussians whose full covariances are optimized (through a
Cholesky-factor parameterization) so that renders of per-face one-hot
attributes match a dense 4000-Gaussian target — exercising the
``max_assign = all kernels``, ``thr_activation = 0``, no-coarse render
path and covariance gradients."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import interpolate_attr, render_pipeline

from demo_utils import save_image


def to_sym(m):
    """Cholesky-style SPD parameterization: tril(m) @ tril(m)^T,
    written as component planes (batched tiny matmuls are pathological on
    TPU)."""
    L = [[m[..., i, j] if j <= i else jnp.zeros_like(m[..., 0, 0]) for j in range(3)] for i in range(3)]
    rows = []
    for i in range(3):
        for j in range(3):
            rows.append(sum(L[i][k] * L[j][k] for k in range(3)))
    return jnp.stack(rows, axis=-1).reshape(m.shape)


def efficient_cuboid(scale=1.0):
    """17 template points per face x 6 faces (reference ``:21-41``)."""
    x = np.array([0, 0.4, 0.6, 0.85], np.float32)
    y = np.array([0.85, 0.6, 0.4, 0.85], np.float32)
    t0 = np.concatenate([[0], x, -x, y, -y]).astype(np.float32)
    t1 = np.concatenate([[0], y, -y, -x, x]).astype(np.float32)
    ones = np.ones_like(t0)
    faces = [
        np.stack([t0, t1, -ones], 1), np.stack([t0, t1, ones], 1),
        np.stack([t0, -ones, t1], 1), np.stack([t0, ones, t1], 1),
        np.stack([-ones, t0, t1], 1), np.stack([ones, t0, t1], 1),
    ]
    return np.concatenate(faces) * scale, t0.shape[0]


def main(iters=320, image_size=(256, 256), seed=0):
    rng = np.random.RandomState(seed)
    colors_0 = np.eye(6, dtype=np.float32)
    rgb_mapping = jnp.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0.8, 0.8], [0.8, 0, 0.8], [0.8, 0.8, 0]],
        jnp.float32,
    )
    tverts, tsigmas, tcolors = Cuboid.cuboid_gauss(
        (-1, 1), (-1, 1), (-1, 1), 4000, colors=colors_0, percentage=0.7
    )
    tverts = jnp.asarray(tverts, jnp.float32)
    tsigmas = jnp.asarray(tsigmas, jnp.float32)
    tcolors = jnp.asarray(tcolors, jnp.float32)

    verts_np, kn = efficient_cuboid()
    verts = jnp.asarray(verts_np)
    n = verts.shape[0]
    sig_init = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy() * 2.0
    for i in range(6):
        sig_init[i * kn] /= np.sqrt(3.0)
    params = {"sig": jnp.asarray(sig_init)}
    idx_attr = jnp.asarray(
        np.repeat(colors_0, kn, axis=0), jnp.float32
    )  # (n, 6) one-hot face id

    focal = jnp.asarray([[200.0, 200.0]])
    principal = jnp.asarray([[image_size[0] // 2, image_size[1] // 2]], jnp.float32)
    t_settings = dict(image_size=tuple(image_size), max_assign=50, max_point_per_bin=1500)
    # full-assign, zero threshold, no-coarse: every kernel on every ray
    g_settings = dict(
        image_size=tuple(image_size), max_assign=n, max_point_per_bin=-1,
        thr_activation=1e-8,
    )

    @jax.jit
    def target_map(R, T):
        frag = render_pipeline(tverts, tsigmas, R, T, focal, principal, **t_settings)
        return interpolate_attr(frag, tcolors)

    def pred_map(sig, R, T):
        frag = render_pipeline(verts, to_sym(sig), R, T, focal, principal, **g_settings)
        return interpolate_attr(frag, idx_attr)

    opt = optax.adam(0.02, b1=0.8, b2=0.6)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, R, T, t_map):
        def loss_fn(params):
            return jnp.mean(jnp.abs(pred_map(params["sig"], R, T) - t_map))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    fixed_views = [[-90, 0], [0, 0], [90, 0], [0, 90], [0, 180], [0, 270]]
    for i in range(iters):
        if i <= iters // 2:
            e, a = fixed_views[rng.randint(0, 6)]
        else:
            e, a = rng.randint(-60, 60), rng.randint(0, 360)
        R, T = look_at_view_transform(5, float(e), float(a))
        t_map = target_map(R, T)
        params, opt_state, loss = step(params, opt_state, R, T, t_map)
        if (i + 1) % 40 == 0:
            print(f"iter {i+1}: loss {float(loss):.5f}")

    R, T = look_at_view_transform(4, 20, 30)
    g_map = pred_map(params["sig"], R, T)
    img = jnp.einsum("bhwk,kc->bhwc", g_map, rgb_mapping)
    save_image("efficient_cuboid", jnp.clip(img, 0, 1))
    return float(loss)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=320)
    a = ap.parse_args()
    main(iters=a.iters)
