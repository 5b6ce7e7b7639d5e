"""Loader for the reference VoGE package's pure-torch modules (with the
CUDA extension and pytorch3d stubbed).  Used by tests/conftest.py and
tools/parity_gate.py; performs NO environment mutation (safe to import in a
TPU-backend process)."""
import importlib
import os
import sys
import types


def _skip(msg):
    try:
        import pytest
        pytest.skip(msg)
    except ImportError:
        raise RuntimeError(msg)


REFERENCE_PATH = "/root/reference"


def _load_reference():
    """Import reference modules by path with a stubbed CUDA extension.

    Bypasses ``VoGE/__init__.py`` (which would import the CUDA-backed
    RayTracing) by installing a bare package shell first.
    """
    if "VoGE" in sys.modules:
        return sys.modules["VoGE"]
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "VoGE")):
        _skip("reference repo not available")
    try:
        import torch  # noqa: F401
    except ImportError:
        _skip("torch not available for reference oracle")

    _stub_pytorch3d()

    pkg = types.ModuleType("VoGE")
    pkg.__path__ = [os.path.join(REFERENCE_PATH, "VoGE")]
    sys.modules["VoGE"] = pkg
    stub = types.ModuleType("VoGE._C")
    sys.modules["VoGE._C"] = stub
    pkg._C = stub

    conv = types.ModuleType("VoGE.Converter")
    conv.__path__ = [os.path.join(REFERENCE_PATH, "VoGE", "Converter")]
    sys.modules["VoGE.Converter"] = conv
    pkg.Converter = conv

    for name in ("Utils", "Meshes", "Aggregation"):
        mod = importlib.import_module(f"VoGE.{name}")
        setattr(pkg, name, mod)
    for name in ("IO", "Cuboid"):
        mod = importlib.import_module(f"VoGE.Converter.{name}")
        setattr(conv, name, mod)
    # Converters.py imports pytorch3d at module level; optional.
    try:
        conv.Converters = importlib.import_module("VoGE.Converter.Converters")
    except ImportError:
        conv.Converters = None
    return pkg


def _stub_pytorch3d():
    """Minimal pytorch3d stand-in so the reference converter modules import.

    ``look_at_rotation`` is a faithful torch implementation of the pytorch3d
    function (same formula as voge_tpu.cameras.look_at_rotation)."""
    if "pytorch3d" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    def look_at_rotation(camera_position, at=((0, 0, 0),), up=((0, 1, 0),), device="cpu"):
        if not torch.is_tensor(camera_position):
            camera_position = torch.tensor(camera_position, dtype=torch.float32)
        camera_position = camera_position.reshape(-1, 3).float()
        at_t = torch.tensor(at, dtype=torch.float32).expand_as(camera_position)
        up_t = torch.tensor(up, dtype=torch.float32).expand_as(camera_position)
        z_axis = F.normalize(at_t - camera_position, eps=1e-5)
        x_axis = F.normalize(torch.cross(up_t, z_axis, dim=1), eps=1e-5)
        y_axis = F.normalize(torch.cross(z_axis, x_axis, dim=1), eps=1e-5)
        is_close = torch.isclose(
            x_axis, torch.tensor(0.0), atol=5e-3
        ).all(dim=1, keepdim=True)
        if is_close.any():
            replacement = F.normalize(torch.cross(y_axis, z_axis, dim=1), eps=1e-5)
            x_axis = torch.where(is_close, replacement, x_axis)
        R = torch.cat(
            (x_axis[:, None, :], y_axis[:, None, :], z_axis[:, None, :]), dim=1
        )
        return R.transpose(1, 2)

    p3d = types.ModuleType("pytorch3d")
    structures = types.ModuleType("pytorch3d.structures")
    renderer = types.ModuleType("pytorch3d.renderer")

    class Meshes:  # placeholder container
        def __init__(self, verts=None, faces=None, **kw):
            self.verts, self.faces = verts, faces

    class Pointclouds:
        def __init__(self, points=None, **kw):
            self.points = points

    structures.Meshes = Meshes
    structures.Pointclouds = Pointclouds
    renderer.look_at_rotation = look_at_rotation
    p3d.structures = structures
    p3d.renderer = renderer
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.structures"] = structures
    sys.modules["pytorch3d.renderer"] = renderer


