"""Render a point cloud as fixed-radius isotropic Gaussians
(reference ``demo/RenderPointClouds.py``: PittsburghBridge pointcloud,
radius 0.003, 320x320).

The reference downloads its pointcloud via pytorch3d; in this zero-egress
environment we synthesize a colored pointcloud of comparable size (~50K
points) procedurally.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from voge_tpu.cameras import PerspectiveCameras, look_at_view_transform
from voge_tpu.converter.converters import fixed_pointcloud_converter
from voge_tpu.meshes import GaussianMeshesNaive
from voge_tpu.renderer import (
    GaussianRenderer,
    GaussianRenderSettings,
    interpolate_attr,
)

from demo_utils import save_image


def synth_pointcloud(n=50000, seed=0):
    """A colored 'terrain + arch' pointcloud in a unit-ish box."""
    rng = np.random.RandomState(seed)
    # ground plane
    g = rng.uniform(-1, 1, size=(n // 2, 2))
    ground = np.stack(
        [g[:, 0], -0.4 + 0.05 * np.sin(4 * g[:, 0]) * np.cos(4 * g[:, 1]), g[:, 1]],
        axis=1,
    )
    gc = np.stack([0.4 + 0.2 * g[:, 0], 0.5 + 0.1 * g[:, 1], 0.3 * np.ones(n // 2)], 1)
    # arch (half torus)
    t = rng.uniform(0, np.pi, size=(n - n // 2,))
    p = rng.uniform(0, 2 * np.pi, size=(n - n // 2,))
    r_maj, r_min = 0.6, 0.08
    arch = np.stack(
        [
            (r_maj + r_min * np.cos(p)) * np.cos(t),
            (r_maj + r_min * np.cos(p)) * np.sin(t) - 0.4,
            r_min * np.sin(p),
        ],
        axis=1,
    )
    ac = np.stack([0.7 + 0.2 * np.cos(t), 0.4 * np.ones_like(t), 0.2 + 0.2 * np.sin(p)], 1)
    points = np.concatenate([ground, arch]).astype(np.float32)
    colors = np.clip(np.concatenate([gc, ac]), 0, 1).astype(np.float32)
    return points, colors


def main():
    points, colors = synth_pointcloud()
    verts, isigma, _ = fixed_pointcloud_converter(points, radius=0.01)
    gmesh = GaussianMeshesNaive(jnp.asarray(verts), jnp.asarray(isigma))

    render_settings = GaussianRenderSettings(
        image_size=(320, 320), principal=(160, 160)
    )
    cameras = PerspectiveCameras(
        focal_length=400.0, principal_point=((160, 160),),
        image_size=((320, 320),),
    )
    renderer = GaussianRenderer(cameras=cameras, render_settings=render_settings)
    R, T = look_at_view_transform(dist=2.5, elev=25, azim=30)
    frag = renderer(gmesh, R=R, T=T)
    img = interpolate_attr(frag, jnp.asarray(colors)).clip(0, 1)
    save_image("pointcloud", img)


if __name__ == "__main__":
    main()
