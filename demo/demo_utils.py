"""Shared helpers for the demo scripts."""
import os

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "output")
REF_DATA = "/root/reference/demo/data"


def save_image(path_stem: str, img) -> str:
    """Save a (H, W, 3) float image in [0, 1] as PNG under demo/output/."""
    os.makedirs(OUT_DIR, exist_ok=True)
    from PIL import Image

    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    path = os.path.join(OUT_DIR, path_stem + ".png")
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
    print("saved", path)
    return path


def ref_data(name: str):
    """Path to a reference demo data file, or None if unavailable."""
    p = os.path.join(REF_DATA, name)
    return p if os.path.exists(p) else None
