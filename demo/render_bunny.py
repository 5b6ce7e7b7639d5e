"""Render the Stanford bunny as per-vertex Gaussians with normals-as-color
(reference ``demo/RenderBunny.py``)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from voge_tpu.cameras import PerspectiveCameras, look_at_view_transform
from voge_tpu.converter import IO, shapes
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.meshes import GaussianMeshesNaive
from voge_tpu.renderer import (
    GaussianRenderer,
    GaussianRenderSettings,
    to_white_background,
)

from demo_utils import ref_data, save_image


def main():
    bunny = ref_data("bunny.off")
    if bunny is not None:
        verts_, faces_ = IO.load_off(bunny)
    else:  # self-contained fallback
        verts_, faces_ = shapes.ico_sphere(4, radius=0.08)
        verts_ = verts_ + np.array([0, 0.1, 0], np.float32)

    meshes = GaussianMeshesNaive(
        *IO.to_jax(*naive_vertices_converter(verts_, faces_, percentage=0.6))
    )
    normals = shapes.vertex_normals(np.asarray(verts_), np.asarray(faces_))
    color = jnp.asarray(normals * 0.4 + 0.4)

    render_settings = GaussianRenderSettings(
        batch_size=-1, image_size=(256, 256), max_assign=40, absorptivity=1,
        principal=(128, 128), inverse_sigma=False,
    )
    cameras = PerspectiveCameras(
        focal_length=2000.0, principal_point=((128, 128),),
        image_size=(render_settings["image_size"],), in_ndc=False,
    )
    renderer = GaussianRenderer(cameras=cameras, render_settings=render_settings)
    R, T = look_at_view_transform([6], [0], [10], degrees=True)
    frag = renderer(meshes, R=R, T=T)
    img = to_white_background(frag, color).clip(0, 1)
    save_image("bunny", img)


if __name__ == "__main__":
    main()
