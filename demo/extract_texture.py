"""Single-view texture extraction (inverse rendering) and re-rendering
(reference ``demo/ExtractTexture.py``): project a real photo onto a CAD
model's Gaussians with ``sample_features``, then render from a new pose."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from voge_tpu.cameras import PerspectiveCameras, look_at_view_transform
from voge_tpu.converter import IO
from voge_tpu.converter.converters import naive_vertices_converter
from voge_tpu.meshes import GaussianMeshesNaive
from voge_tpu.renderer import GaussianRenderer, GaussianRenderSettings, to_white_background
from voge_tpu.sampler import sample_features
from voge_tpu.utils import rotation_theta

from demo_utils import ref_data, save_image


def main():
    image_path = ref_data("car_image.JPEG")
    annos_path = ref_data("car_annotation.npz")
    cad_path = ref_data("car.off")
    if not all((image_path, annos_path, cad_path)):
        print("reference demo data unavailable; skipping")
        return

    from PIL import Image

    annos = np.load(annos_path)
    im = np.asarray(Image.open(image_path)).astype(np.float32)

    render_settings = GaussianRenderSettings(
        batch_size=-1, image_size=(256, 672), max_assign=80
    )
    cameras = PerspectiveCameras(
        focal_length=1800.0, principal_point=((336, 128),),
        image_size=(render_settings["image_size"],),
    )
    renderer = GaussianRenderer(cameras=cameras, render_settings=render_settings)

    theta = float(annos["theta"])
    azim = float(annos["azimuth"])
    elev = float(annos["elevation"])
    dist = 3.0

    meshes = GaussianMeshesNaive(
        *IO.to_jax(
            *naive_vertices_converter(
                *IO.pre_process_pascal(*IO.load_off(cad_path)),
                percentage=0.5, max_sig_rate=2,
            )
        )
    )

    R, T = look_at_view_transform([dist], [elev], [azim], degrees=False)
    R = jnp.matmul(R, rotation_theta(jnp.asarray([theta])))
    frag = renderer(meshes, R=R, T=T)

    feat, feat_sum = sample_features(
        frag, jnp.asarray(im)[None], meshes.verts.shape[0]
    )
    texture = feat / (1e-8 + feat_sum[:, None]) / 255.0
    texture = texture * 0.7
    print("extracted texture for", texture.shape[0], "kernels")

    # re-render from a rotated viewpoint
    R2, T2 = look_at_view_transform([dist], [elev], [azim - np.pi / 6], degrees=False)
    R2 = jnp.matmul(R2, rotation_theta(jnp.asarray([theta])))
    frag2 = renderer(meshes, R=R2, T=T2)
    img = to_white_background(frag2, texture).clip(0, 1)
    save_image("extract_texture_rerender", img)


if __name__ == "__main__":
    main()
