"""Quickstart: render a 1000-Gaussian cuboid (reference ``Readme.md:70-101``)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from voge_tpu.cameras import PerspectiveCameras, look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import (
    GaussianRenderer,
    GaussianRenderSettings,
    to_white_background,
)

from demo_utils import save_image


def main():
    gaussians = Cuboid.cuboid_gauss(
        (-1, 1), (-1, 1), (-1, 1), 1000, percentage=0.6, as_obj=True
    )
    camera = PerspectiveCameras(
        focal_length=300, image_size=((256, 256),), principal_point=((128, 128),)
    )
    render_settings = GaussianRenderSettings(image_size=(256, 256), principal=(128, 128))
    renderer = GaussianRenderer(cameras=camera, render_settings=render_settings)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    frag = renderer(gaussians, R=R, T=T)
    img = to_white_background(frag, (gaussians.verts + 1) / 3).clip(0, 1)
    save_image("cuboid", img)


if __name__ == "__main__":
    main()
