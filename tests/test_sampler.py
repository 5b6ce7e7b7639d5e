"""Inverse-rendering sampler tests: value parity with the documented torch
scatter formulation and gradient parity with the CUDA backward math."""
import numpy as np

import jax
import jax.numpy as jnp

from voge_tpu.renderer import Fragments
from voge_tpu.sampler import sample_features, scatter_max_weight


def _frag(rng, B=2, H=5, W=6, K=4, N=20):
    idx = rng.randint(-1, N, size=(B, H, W, K)).astype(np.int32)
    w = rng.uniform(0, 1, size=(B, H, W, K)).astype(np.float32)
    valid_num = (idx >= 0).sum(-1)
    return Fragments(jnp.asarray(w), jnp.asarray(idx), jnp.asarray(valid_num), jnp.asarray(w))


def _oracle(image, w, idx, n_vert):
    """The reference docstring formulation (Sampler.py:7-11)."""
    B, H, W, K = idx.shape
    C = image.shape[-1]
    weight = np.zeros((B, H, W, n_vert), dtype=np.float64)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                for k in range(K):
                    if idx[b, i, j, k] >= 0:
                        weight[b, i, j, idx[b, i, j, k]] += w[b, i, j, k]
    sum_w = weight.sum(axis=(0, 1, 2))
    feat = weight.reshape(-1, n_vert).T @ image.reshape(-1, C).astype(np.float64)
    return feat, sum_w


def test_sample_features_matches_docstring_oracle(rng):
    frag = _frag(rng)
    B, H, W, K = frag.vert_index.shape
    N, C = 20, 3
    image = rng.uniform(0, 1, size=(B, H, W, C)).astype(np.float32)
    feat, sw = sample_features(frag, jnp.asarray(image), n_vert=N)
    feat_o, sw_o = _oracle(
        image, np.asarray(frag.vert_weight), np.asarray(frag.vert_index), N
    )
    np.testing.assert_allclose(np.asarray(feat), feat_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sw), sw_o, rtol=1e-5, atol=1e-5)


def test_sample_features_gradients(rng):
    """grad_image = sum_k w_k * g_feat[idx_k]; grad_w = <g_feat[idx], img> +
    g_sum[idx] (sample_voge.cu:173-209)."""
    frag = _frag(rng, B=1, H=3, W=3, K=3, N=8)
    B, H, W, K = frag.vert_index.shape
    image = jnp.asarray(rng.uniform(0, 1, size=(B, H, W, 3)).astype(np.float32))
    gf = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
    gs = rng.uniform(-1, 1, size=(8,)).astype(np.float32)

    def loss(img, w):
        f2 = Fragments(w, frag.vert_index, frag.valid_num, frag.vert_hit_length)
        feat, sw = sample_features(f2, img, n_vert=8)
        return jnp.sum(feat * gf) + jnp.sum(sw * gs)

    g_img, g_w = jax.grad(loss, argnums=(0, 1))(image, frag.vert_weight)
    idx = np.asarray(frag.vert_index)
    w = np.asarray(frag.vert_weight)
    img_np = np.asarray(image)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                gi = np.zeros(3)
                for k in range(K):
                    n = idx[b, i, j, k]
                    if n < 0:
                        assert abs(float(g_w[b, i, j, k])) < 1e-7
                        continue
                    gi += w[b, i, j, k] * gf[n]
                    expect = float(gf[n] @ img_np[b, i, j] + gs[n])
                    assert abs(float(g_w[b, i, j, k]) - expect) < 1e-5
                np.testing.assert_allclose(np.asarray(g_img[b, i, j]), gi, atol=1e-5)


def test_scatter_max_weight(rng):
    frag = _frag(rng, N=10)
    out = np.asarray(scatter_max_weight(frag, n_vert=10))
    idx = np.asarray(frag.vert_index).reshape(-1)
    w = np.asarray(frag.vert_weight).reshape(-1)
    expect = np.zeros(10)
    for n, v in zip(idx, w):
        if n >= 0:
            expect[n] = max(expect[n], v)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
