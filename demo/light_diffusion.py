"""Lighting via interpolated normal maps (reference ``demo/LightDiffusion.py``):
render the scene's normals as an attribute map, then apply directional
diffuse shading (Lambert) — the pytorch3d ``DirectionalLights.diffuse``
equivalent is three lines of jnp."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from voge_tpu.cameras import (
    PerspectiveCameras,
    camera_position_from_spherical_angles,
    look_at_view_transform,
)
from voge_tpu.converter import IO, shapes
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.meshes import GaussianMeshesNaive
from voge_tpu.renderer import GaussianRenderer, GaussianRenderSettings, interpolate_attr

from demo_utils import ref_data, save_image


def diffuse(normals_map, direction, color=(1.0, 1.0, 1.0)):
    """Lambertian diffuse: color * max(0, n . l)."""
    l = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    dot = jnp.clip(jnp.sum(normals_map * l, axis=-1, keepdims=True), 0.0, None)
    return dot * jnp.asarray(color)


def main():
    bunny = ref_data("bunny.off")
    if bunny is not None:
        verts_, faces_ = IO.load_off(bunny)
    else:
        verts_, faces_ = shapes.ico_sphere(4, radius=0.08)

    meshes = GaussianMeshesNaive(
        *IO.to_jax(*naive_vertices_converter(verts_, faces_, percentage=0.6))
    )
    normals = jnp.asarray(shapes.vertex_normals(verts_, faces_))

    render_settings = GaussianRenderSettings(
        batch_size=-1, image_size=(256, 256), max_assign=40, principal=(128, 128)
    )
    cameras = PerspectiveCameras(
        focal_length=2000.0, principal_point=((128, 128),),
        image_size=(render_settings["image_size"],),
    )
    renderer = GaussianRenderer(cameras=cameras, render_settings=render_settings)
    R, T = look_at_view_transform([6], [0], [10], degrees=True)
    frag = renderer(meshes, R=R, T=T)

    # a small sweep of light directions, like the reference's animation loop
    for i, elev in enumerate((30.0, 60.0, 90.0)):
        direction = camera_position_from_spherical_angles(1.0, elev, 10.0)
        normals_map = interpolate_attr(frag, normals)
        img = diffuse(normals_map, direction)
        save_image(f"light_diffusion_{i}", jnp.clip(img, 0, 1))


if __name__ == "__main__":
    main()
