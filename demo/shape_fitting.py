"""Shape and color fitting (reference ``demo/ShapeFitting.py``): optimize an
icosphere's Gaussian centers and per-kernel colors to match multi-view
silhouettes + RGB renders of a target scene, by SGD through the renderer.

The reference renders its targets with a pytorch3d mesh renderer on a cow
OBJ; here the targets are VoGE renders of the target Gaussians themselves
(same optimization problem, self-contained)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import IO, shapes
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.renderer import (
    get_silhouette,
    interpolate_attr,
    render_pipeline,
)

from demo_utils import ref_data, save_image


def target_mesh():
    cow = ref_data("cow.obj")
    if cow is not None:
        verts, faces = shapes.load_obj(cow)
        # normalize to unit scale at origin (reference does the same)
        center = verts.mean(0)
        verts = verts - center
        verts = verts / np.abs(verts).max()
        return verts, faces
    v, f = shapes.ico_sphere(3)
    v[:, 0] *= 1.4  # squash so there is something to fit
    v[:, 2] *= 0.7
    return v, f


def main(iters=400, num_views=20, views_per_iter=5, image_size=(128, 128), seed=0):
    rng = np.random.RandomState(seed)

    tv, tf = target_mesh()
    t_verts, t_isig, _ = naive_vertices_converter(tv, tf, percentage=0.5)
    t_verts, t_isig = jnp.asarray(t_verts), jnp.asarray(t_isig)
    t_colors = jnp.asarray((tv - tv.min(0)) / (tv.max(0) - tv.min(0)))

    # cameras on a ring (reference: num_views views, elev 0, azim 0..360)
    elev = np.zeros(num_views)
    azim = np.linspace(-180, 180, num_views, endpoint=False)
    R_all, T_all = look_at_view_transform(dist=2.7, elev=elev, azim=azim)
    focal = jnp.asarray([[126.0, 126.0]])
    principal = jnp.asarray([[64.0, 64.0]], jnp.float32)

    settings = dict(image_size=tuple(image_size), max_assign=25, max_point_per_bin=-1)

    @jax.jit
    def render_view(verts, sigmas, colors, R, T):
        frag = render_pipeline(verts, sigmas, R, T, focal, principal, **settings)
        return interpolate_attr(frag, colors), get_silhouette(frag)

    target_rgb, target_sil = [], []
    for j in range(num_views):
        rgb, sil = render_view(t_verts, t_isig, t_colors, R_all[j : j + 1], T_all[j : j + 1])
        target_rgb.append(rgb)
        target_sil.append(sil)
    target_rgb = jnp.concatenate(target_rgb)
    target_sil = jnp.concatenate(target_sil)
    save_image("shape_fitting_target", target_rgb[1])

    # source: icosphere
    sv, sf = shapes.ico_sphere(4)
    s_verts, s_isig, _ = naive_vertices_converter(sv, sf, percentage=0.5)
    params = {
        "verts": jnp.asarray(s_verts),
        "colors": jnp.ones((s_verts.shape[0], 3)) * 0.5,
    }
    s_isig = jnp.asarray(s_isig)

    opt = optax.sgd(0.8, momentum=0.9)
    opt_state = opt.init(params)
    w_rgb, w_sil = 1.0, 1.0

    def loss_fn(params, R, T):
        frag = render_pipeline(
            params["verts"], s_isig, R, T, focal, principal, **settings
        )
        rgb = interpolate_attr(frag, params["colors"])
        sil = get_silhouette(frag)
        return rgb, sil

    @jax.jit
    def step(params, opt_state, Rb, Tb, t_rgb, t_sil):
        def total(params):
            loss = 0.0
            for j in range(views_per_iter):
                rgb, sil = loss_fn(params, Rb[j : j + 1], Tb[j : j + 1])
                loss = loss + w_sil * jnp.mean((sil[0] - t_sil[j]) ** 2)
                loss = loss + w_rgb * jnp.mean((rgb[0] - t_rgb[j]) ** 2)
            return loss / views_per_iter

        loss, grads = jax.value_and_grad(total)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(iters):
        js = rng.permutation(num_views)[:views_per_iter]
        params, opt_state, loss = step(
            params, opt_state, R_all[js], T_all[js], target_rgb[js], target_sil[js]
        )
        if (i + 1) % 50 == 0:
            print(f"iter {i+1}: loss {float(loss):.6f}")

    rgb, sil = render_view(
        params["verts"], s_isig, params["colors"], R_all[1:2], T_all[1:2]
    )
    save_image("shape_fitting_result", rgb[0])
    return float(loss)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    a = ap.parse_args()
    main(iters=a.iters)
