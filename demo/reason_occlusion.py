"""Occlusion-aware multi-object translation optimization
(reference ``demo/ReasonOcclusion.py``): two semi-transparent cuboids are
rendered together; the first one's translation is recovered by gradient
descent on an RGB MSE, with gradients flowing *through* occlusion."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from voge_tpu.cameras import PerspectiveCameras, look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.meshes import GaussianMeshesNaive
from voge_tpu.renderer import (
    GaussianRenderSettings,
    interpolate_attr,
    render_pipeline,
    to_white_background,
)

from demo_utils import save_image


def main(iters=200, image_size=(400, 400)):
    percentage = 0.7
    colors_a = np.array([[0, 0.2, 1]] * 2 + [[0, 1, 0.2]] * 2 + [[0, 1, 1]] * 2)
    verts0, sigmas0, colors0 = Cuboid.cuboid_gauss(
        (-0.8, 0.8), (-0.4, 0.4), (-0.6, 0.6), 4000, colors=colors_a,
        percentage=percentage,
    )
    colors_b = np.array([[1, 0.2, 0]] * 2 + [[1, 1, 0]] * 2 + [[0.2, 1, 0]] * 2)
    verts1, sigmas1, colors1 = Cuboid.cuboid_gauss(
        (-1, 1), (-1, 1), (-0.3, 0.3), 3000, colors=colors_b,
        percentage=percentage,
    )
    verts0, sigmas0 = jnp.asarray(verts0, jnp.float32), jnp.asarray(sigmas0, jnp.float32)
    verts1, sigmas1 = jnp.asarray(verts1, jnp.float32), jnp.asarray(sigmas1, jnp.float32)
    colors = jnp.asarray(np.concatenate([colors0, colors1]), jnp.float32)
    sigmas = jnp.concatenate([sigmas0, sigmas1])

    R, T = look_at_view_transform(dist=5, elev=10, azim=20)
    focal = jnp.asarray([[300.0, 300.0]])
    principal = jnp.asarray([[image_size[0] // 2, image_size[1] // 2]], jnp.float32)

    settings = dict(
        image_size=tuple(image_size), max_assign=60, max_point_per_bin=1500
    )

    def render_rgb(v0, v1):
        verts = jnp.concatenate([verts0 + v0, verts1 + v1])
        frag = render_pipeline(verts, sigmas, R, T, focal, principal, **settings)
        return interpolate_attr(frag, colors), frag

    # target scene
    v_true0 = jnp.asarray([[0.5, 0.0, 1.0]])
    v_true1 = jnp.asarray([[0.0, 0.0, 0.0]])
    timg, tfrag = render_rgb(v_true0, v_true1)
    timg = jax.lax.stop_gradient(timg)
    save_image("reason_occ_target", to_white_background(tfrag, colors))

    # init far away
    params = {
        "v0": jnp.asarray([[-1.0, 0.0, -5.0]]),
        "v1": jnp.asarray([[0.0, 0.0, 0.0]]),
    }
    opt = optax.adam(0.05, b1=0.6, b2=0.4)
    opt_state = opt.init(params)

    def loss_fn(params):
        img, _ = render_rgb(params["v0"], params["v1"])
        return jnp.mean((img - timg) ** 2)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    img0, frag0 = render_rgb(params["v0"], params["v1"])
    save_image("reason_occ_before", to_white_background(frag0, colors))

    for i in range(iters):
        params, opt_state, loss = step(params, opt_state)
        if (i + 1) % 25 == 0:
            print(f"iter {i+1}: loss {float(loss):.6f} v0 {np.asarray(params['v0'])[0]}")

    img1, frag1 = render_rgb(params["v0"], params["v1"])
    save_image("reason_occ_after", to_white_background(frag1, colors))
    err = float(jnp.linalg.norm(params["v0"] - v_true0))
    print("final translation error:", err)
    return err


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    a = ap.parse_args()
    main(iters=a.iters)
