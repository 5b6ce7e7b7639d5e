"""Camera-model and ray-generation convention tests.

There is no runnable pytorch3d here, so these tests pin the conventions
analytically: orthonormality, known look_at configurations, and the
projection/ray round trip (a point projected to pixel (i, j) must lie on the
ray generated for pixel (i, j))."""
import numpy as np
import pytest

import jax.numpy as jnp

from voge_tpu import cameras as C
from voge_tpu import rays as raysmod


def test_look_at_rotation_orthonormal():
    pos = jnp.asarray([[2.0, 1.0, 3.0], [0.0, 0.0, 5.0], [-1.0, 2.0, 0.5]])
    R = C.look_at_rotation(pos)
    eye = jnp.eye(3)
    for i in range(R.shape[0]):
        np.testing.assert_allclose(np.asarray(R[i] @ R[i].T), np.asarray(eye), atol=1e-6)
        assert np.linalg.det(np.asarray(R[i])) > 0.99


def test_look_at_camera_on_z_axis():
    # camera at +z looking at origin, up +y:
    #   view z axis = (0,0,-1); x = up x z = (-1,0,0); y = (0,1,0)
    R, T = C.look_at_view_transform(eye=[[0.0, 0.0, 5.0]])
    R = np.asarray(R[0])
    np.testing.assert_allclose(R[:, 2], [0, 0, -1], atol=1e-6)  # z column
    np.testing.assert_allclose(R[:, 0], [-1, 0, 0], atol=1e-6)  # x column
    np.testing.assert_allclose(R[:, 1], [0, 1, 0], atol=1e-6)   # y column
    # camera center maps to view origin
    Cw = C.camera_centers(jnp.asarray(R)[None], T)
    np.testing.assert_allclose(np.asarray(Cw[0]), [0, 0, 5], atol=1e-5)


def test_spherical_camera_position():
    pos = C.camera_position_from_spherical_angles(2.0, 0.0, 90.0)
    np.testing.assert_allclose(np.asarray(pos[0]), [2, 0, 0], atol=1e-6)
    pos = C.camera_position_from_spherical_angles(3.0, 90.0, 0.0)
    np.testing.assert_allclose(np.asarray(pos[0]), [0, 3, 0], atol=1e-6)


def test_look_at_points_at_target():
    R, T = C.look_at_view_transform(dist=4.0, elev=23.0, azim=77.0)
    # the 'at' point (origin) must project onto the optical axis: view coords
    # (0, 0, dist)
    at_view = C.world_to_view(jnp.zeros((1, 1, 3)), R, T)
    np.testing.assert_allclose(np.asarray(at_view[0, 0]), [0, 0, 4.0], atol=1e-5)


def test_projection_ray_roundtrip():
    """A world point projected to pixel (u, v) must lie on the ray generated
    for that pixel location (validates that ray generation and projection
    share one consistent convention, as the renderer requires)."""
    H, W = 32, 48
    R, T = C.look_at_view_transform(dist=5.0, elev=15.0, azim=40.0)
    focal = jnp.asarray([[60.0, 60.0]])
    principal = jnp.asarray([[W / 2, H / 2]])

    pts = jnp.asarray([[[0.3, -0.2, 0.1], [0.0, 0.0, 0.0], [-0.4, 0.3, -0.2]]])
    view = C.world_to_view(pts, R, T)
    scr = C.view_to_screen(view, focal, principal)

    dirs, origins = raysmod.camera_rays(R, T, focal, principal, (H, W))
    origin = np.asarray(origins[0])

    for n in range(pts.shape[1]):
        u, v = float(scr[0, n, 0]), float(scr[0, n, 1])
        j, i = int(np.floor(u)), int(np.floor(v))
        assert 0 <= i < H and 0 <= j < W
        # nearest pixel-center ray should pass within a pixel of the point
        d = np.asarray(dirs[0, i, j])
        p = np.asarray(pts[0, n])
        # distance from point to ray
        t = np.dot(p - origin, d)
        assert t > 0  # in front of camera
        closest = origin + t * d
        # the angular offset of up to half a pixel => spatial offset <= t * ~(1/f)
        assert np.linalg.norm(closest - p) < t * 1.0 / 60.0


def test_ray_grid_matches_half_pixel_convention():
    """Pixel (0,0) ray direction in view space is ((px-0.5)/fx, (py-0.5)/fy, 1)
    (mirrored screen convention)."""
    H = W = 4
    focal = jnp.asarray([[10.0, 20.0]])
    principal = jnp.asarray([[2.0, 1.0]])
    d = raysmod.pixel_dirs_view((H, W), focal, principal)
    np.testing.assert_allclose(
        np.asarray(d[0, 0, 0]), [(2.0 - 0.5) / 10.0, (1.0 - 0.5) / 20.0, 1.0],
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(d[0, 3, 2]), [(2.0 - 2.5) / 10.0, (1.0 - 3.5) / 20.0, 1.0],
        atol=1e-7,
    )


def test_perspective_cameras_formats():
    cam = C.PerspectiveCameras(focal_length=300, image_size=((256, 256),),
                               principal_point=((128, 128),))
    assert not cam.in_ndc()
    R, T, f, p = cam.batched_params()
    assert R.shape == (1, 3, 3) and T.shape == (1, 3)
    np.testing.assert_allclose(np.asarray(f[0]), [300.0, 300.0])
    cam.focal = 500.0
    np.testing.assert_allclose(np.asarray(cam.focal_length[0]), [500.0, 500.0])


def test_get_projection_transform():
    from voge_tpu.camera_op import get_projection_transform

    K = get_projection_transform(300.0, ((128.0, 120.0),))
    x = jnp.asarray([[0.5, -0.2, 2.0, 1.0]])
    out = x @ K[0]
    proj = out / out[..., -1:]
    np.testing.assert_allclose(
        np.asarray(proj[0, :2]),
        [300 * 0.5 / 2 + 128, 300 * -0.2 / 2 + 120],
        rtol=1e-6,
    )
    np.testing.assert_allclose(float(proj[0, 2]), 1 / 2.0, rtol=1e-6)
