"""Converter / Cuboid / IO parity vs the reference torch implementations."""
import os

import numpy as np
import pytest

from voge_tpu.converter import Converters, Cuboid, IO


def _rand_mesh(rng, n=40, f=60):
    verts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    faces = rng.randint(0, n, size=(f, 3)).astype(np.int64)
    return verts, faces


def test_naive_vertices_converter_matches_reference(ref, rng):
    verts, faces = _rand_mesh(rng)
    if ref.Converter.Converters is None:
        pytest.skip("reference Converters not importable")
    v_ref, s_ref, r_ref = ref.Converter.Converters.naive_vertices_converter(
        verts.copy(), faces.copy(), percentage=0.6
    )
    v, s, r = Converters.naive_vertices_converter(verts, faces, percentage=0.6)
    np.testing.assert_allclose(v, v_ref, rtol=1e-6)
    np.testing.assert_allclose(s, s_ref, rtol=1e-5)
    assert r is None and r_ref is None


def test_normal_mesh_converter_matches_reference(ref, rng):
    if ref.Converter.Converters is None:
        pytest.skip("reference Converters not importable")
    verts, faces = _rand_mesh(rng)
    normals = rng.normal(size=(verts.shape[0], 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals.astype(np.float32)
    v_ref, s_ref, _ = ref.Converter.Converters.normal_mesh_converter(
        verts.copy(), faces.copy(), normals.copy(), percentage=0.5, shape_ratio=0.4
    )
    v, s, _ = Converters.normal_mesh_converter(
        verts, faces, normals, percentage=0.5, shape_ratio=0.4
    )
    np.testing.assert_allclose(v, v_ref, rtol=1e-6)
    np.testing.assert_allclose(s, np.asarray(s_ref), rtol=1e-4, atol=1e-4)


def test_naive_point_cloud_converter_matches_reference(ref, rng):
    if ref.Converter.Converters is None:
        pytest.skip("reference Converters not importable")
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    import torch

    v_ref, s_ref, _ = ref.Converter.Converters.naive_point_cloud_converter(
        torch.from_numpy(pts.copy()), percentage=0.5
    )
    v, s, _ = Converters.naive_point_cloud_converter(pts, percentage=0.5)
    np.testing.assert_allclose(v, v_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(s, s_ref.numpy(), rtol=1e-4)


def test_fixed_pointcloud_converter_matches_reference(ref, rng):
    pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    if ref.Converter.Converters is None:
        pytest.skip("reference Converters not importable")
    v_ref, s_ref, _ = ref.Converter.Converters.fixed_pointcloud_converter(
        pts.copy(), radius=0.003
    )
    v, s, _ = Converters.fixed_pointcloud_converter(pts, radius=0.003)
    np.testing.assert_allclose(v, v_ref, rtol=1e-6)
    np.testing.assert_allclose(s, s_ref, rtol=1e-5)


def test_cuboid_gauss_matches_reference(ref):
    ref_out = ref.Converter.Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 1000, percentage=0.6)
    my_out = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 1000, percentage=0.6)
    np.testing.assert_allclose(my_out[0], ref_out[0], rtol=1e-7)
    np.testing.assert_allclose(my_out[1], ref_out[1], rtol=1e-7)


def test_cuboid_gauss_with_colors_matches_reference(ref):
    colors = [np.array([i / 6.0, 0.5, 1 - i / 6.0]) for i in range(6)]
    ref_out = ref.Converter.Cuboid.cuboid_gauss(
        (-1, 1), (-0.5, 0.5), (-2, 2), 800, percentage=0.5, colors=colors
    )
    my_out = Cuboid.cuboid_gauss(
        (-1, 1), (-0.5, 0.5), (-2, 2), 800, percentage=0.5, colors=colors
    )
    for a, b in zip(my_out, ref_out):
        np.testing.assert_allclose(a, b, rtol=1e-7)


def test_cuboid_mesh_matches_reference(ref):
    ref_out = ref.Converter.Cuboid.cuboid_mesh((-1, 1), (-1, 1), (-1, 1), 500)
    my_out = Cuboid.cuboid_mesh((-1, 1), (-1, 1), (-1, 1), 500)
    np.testing.assert_allclose(my_out[0], ref_out[0], rtol=1e-7)
    np.testing.assert_array_equal(my_out[1], ref_out[1])


def test_goff_roundtrip_matches_reference(ref, rng, tmp_path):
    pts = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
    for sig in (
        rng.uniform(0.5, 2, size=(20,)).astype(np.float32),
        rng.uniform(0.5, 2, size=(20, 3)).astype(np.float32),
        rng.uniform(0.5, 2, size=(20, 3, 3)).astype(np.float32),
    ):
        mine = str(tmp_path / "mine.goff")
        theirs = str(tmp_path / "theirs.goff")
        IO.save_goff(mine, pts, sig)
        ref.Converter.IO.save_goff(theirs, pts.copy(), sig.copy())
        assert open(mine).read() == open(theirs).read()
        p1, s1, r1 = IO.load_goff(mine)
        p2, s2, r2 = ref.Converter.IO.load_goff(theirs)
        np.testing.assert_allclose(p1, p2, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s1).reshape(20, -1), np.asarray(s2).reshape(20, -1), rtol=1e-6
        )
        assert r1 is None and r2 is None


def test_goff_radians_roundtrip(rng, tmp_path):
    pts = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
    sig = rng.uniform(0.5, 2, size=(10,)).astype(np.float32)
    rad = rng.uniform(0, 3, size=(10,)).astype(np.float32)
    path = str(tmp_path / "r.goff")
    IO.save_goff(path, pts, sig, rad)
    p, s, r = IO.load_goff(path)
    np.testing.assert_allclose(r, rad, rtol=1e-6)


def test_off_roundtrip_matches_reference(ref, rng, tmp_path):
    verts, faces = _rand_mesh(rng, n=15, f=20)
    mine = str(tmp_path / "m.off")
    theirs = str(tmp_path / "t.off")
    IO.save_off(mine, verts, faces)
    ref.Converter.IO.save_off(theirs, verts.copy(), faces.copy())
    assert open(mine).read() == open(theirs).read()
    v1, f1 = IO.load_off(mine)
    v2, f2 = ref.Converter.IO.load_off(theirs)
    np.testing.assert_allclose(v1, v2)
    np.testing.assert_array_equal(f1, f2)


def test_load_reference_bunny():
    path = "/root/reference/demo/data/bunny.off"
    if not os.path.exists(path):
        pytest.skip("bunny.off not available")
    verts, faces = IO.load_off(path)
    assert verts.shape[1] == 3 and faces.shape[1] == 3
    assert verts.shape[0] > 1000


def test_pre_process_pascal(rng):
    verts = rng.uniform(size=(5, 3)).astype(np.float32)
    out, extra = IO.pre_process_pascal(verts, "x")
    np.testing.assert_allclose(out[:, 0], verts[:, 0])
    np.testing.assert_allclose(out[:, 1], verts[:, 2])
    np.testing.assert_allclose(out[:, 2], -verts[:, 1])
    assert extra == "x"
