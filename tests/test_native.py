"""Native C++ helper tests (ctypes library vs Python oracles)."""
import numpy as np
import pytest

from voge_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_parse_floats():
    arr = native.parse_floats("1.5 2.25\n-3 4e2  7", 10)
    np.testing.assert_allclose(arr, [1.5, 2.25, -3.0, 400.0, 7.0])


def test_knn_matches_bruteforce(rng):
    pts = rng.rand(400, 3).astype(np.float32)
    out = native.knn_mean_dist(pts, 4, 2.0)
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    top = np.sort(d, axis=1)[:, :4]
    clipped = np.minimum(top, top.mean(1, keepdims=True) * 2.0)
    np.testing.assert_allclose(out, clipped.mean(1), rtol=1e-5, atol=1e-6)


def test_knn_clustered_distribution(rng):
    # stress the grid with a highly non-uniform cloud
    a = rng.randn(300, 3).astype(np.float32) * 0.01
    b = rng.randn(300, 3).astype(np.float32) * 0.01 + 5.0
    pts = np.concatenate([a, b])
    out = native.knn_mean_dist(pts, 4, 2.0)
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    top = np.sort(d, axis=1)[:, :4]
    clipped = np.minimum(top, top.mean(1, keepdims=True) * 2.0)
    np.testing.assert_allclose(out, clipped.mean(1), rtol=1e-4, atol=1e-6)


def test_vert_edge_length_matches_python(ref, rng):
    import torch

    verts = rng.rand(60, 3).astype(np.float32)
    faces = rng.randint(0, 60, (90, 3)).astype(np.int64)
    out = native.vert_edge_length(verts, faces, 0.7)
    oracle = ref.Converter.Converters.get_vert_edge_length(
        verts.astype(np.float64), faces, 0.7
    ) if ref.Converter.Converters else None
    if oracle is None:
        pytest.skip("reference converters unavailable")
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-6)
