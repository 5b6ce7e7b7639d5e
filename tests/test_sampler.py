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


# ---------------------------------------------------------------------------
# fused (Pallas, interpret-mode) sampler vs the segment_sum formulation
# ---------------------------------------------------------------------------

def _ctx_scene(rng, B=2, H=20, W=20, P=80, K=6, bin_size=5, sort=True):
    """Kernel-layout selection + ctx arrays, as the renderer builds them on
    TPU (mirrors tests/test_pallas_attr.py)."""
    import math

    import voge_tpu.ops.fine as F
    from voge_tpu.cameras import look_at_view_transform
    from voge_tpu.ops.coarse import overlap_mask
    from voge_tpu.rays import camera_rays

    mus_w = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32) * 0.8
    a = rng.uniform(-1, 1, size=(P, 3, 3)).astype(np.float32)
    isig = np.einsum("pij,pkj->pik", a, a) + 2 * np.eye(3, dtype=np.float32)
    R_, T_ = look_at_view_transform(dist=[4.0, 5.0], elev=[5.0, 25.0],
                                    azim=[10.0, 50.0])
    focal = jnp.broadcast_to(jnp.asarray([[30.0, 30.0]]), (B, 2))
    principal = jnp.broadcast_to(jnp.asarray([[10.0, 10.0]]), (B, 2))
    rays, origins = camera_rays(R_, T_, focal, principal, (H, W))
    mus = jnp.asarray(mus_w)[None] - origins[:, None, :]
    isig_b = jnp.broadcast_to(jnp.asarray(isig)[None], (B, P, 3, 3))
    thr_act = -math.log(0.01 + 1e-10)
    base_ids = (jnp.arange(P, dtype=jnp.int32)[None, :]
                + (jnp.arange(B, dtype=jnp.int32) * P)[:, None])
    if sort:
        pts, isg, ids, perm = F._sort_bin_coherent(
            R_, T_, focal, principal, mus, isig_b, (H, W), bin_size,
            base_ids)
    else:
        # original candidate order (the emission-compacted production path):
        # perm=None, no unsort anywhere downstream
        pts, isg, ids, perm = mus, isig_b, base_ids, None
    mask = overlap_mask(R_, T_, focal, principal, pts, isg, (H, W), 0.01,
                        bin_size)
    sel_k, _aux = F._rt_fine_kern(pts, isg, rays, mask, ids, thr_act,
                                  (bin_size, bin_size), K)
    w_k = jnp.where(sel_k[0] >= 0,
                    1.0 / (1.0 + jnp.abs(sel_k[1])) + 0.1, 0.0)
    _, BH, BW, _ = mask.shape
    P_pad = 128
    mask_k = jnp.pad(mask.reshape(B * BH * BW, P).astype(jnp.int8),
                     ((0, 0), (0, P_pad - P)))[:, None, :]
    ids_p = F._prep_ids(ids, P, P_pad)
    geom_common = dict(B=B, H=H, W=W, BH=BH, BW=BW, bin_size=bin_size,
                       P=P, P_pad=P_pad, perm=perm)
    return (sel_k[0], w_k, mask_k, ids_p, pts, isg, geom_common)


def _mk_frag_g(sel_idx_k, w_k, mask_k, ids_p, gc, cand_chunk=128):
    import voge_tpu.ops.fine as F

    B, H, W, BH, BW, bs = (gc["B"], gc["H"], gc["W"], gc["BH"], gc["BW"],
                           gc["bin_size"])
    ub = lambda x: F.unbin_kern(x, B, BH, BW, H, W, bs, bs, False)
    sel_img = ub(sel_idx_k)
    w_img = ub(w_k)
    geom = (B, H, W, BH, BW, bs, bs, False, BH * BW, cand_chunk,
            gc["P"], gc["P_pad"], "g")
    frag = Fragments(
        vert_weight=w_img, vert_index=sel_img,
        valid_num=(sel_img >= 0).sum(-1), vert_hit_length=w_img,
        attr_ctx=(sel_idx_k, w_k, mask_k, ids_p, gc["perm"]),
        attr_geom=geom,
    )
    return frag, sel_img, w_img


def _mk_frag_c(sel_idx_k, w_k, mask_k, ids_p, pts, isg, gc):
    import voge_tpu.ops.fine as F
    from voge_tpu.ops.pallas_fine2 import compact_candidates

    B, H, W, BH, BW, bs = (gc["B"], gc["H"], gc["W"], gc["BH"], gc["BW"],
                           gc["bin_size"])
    P, P_pad = gc["P"], gc["P_pad"]
    gauss_feat = F._gauss_feature_planes_batched(pts, isg)
    gauss_feat = jnp.pad(gauss_feat, ((0, 0), (0, 0), (0, P_pad - P)))
    M_max = P_pad  # capacity covers everything: no truncation in the test
    table_c, bits_c, ids_c, pos_c, counts_c, ovf = compact_candidates(
        mask_k, gauss_feat, ids_p, M_max, BH * BW)
    assert int(jnp.sum(ovf)) == 0
    ub = lambda x: F.unbin_kern(x, B, BH, BW, H, W, bs, bs, False)
    sel_img = ub(sel_idx_k)
    w_img = ub(w_k)
    geom = (B, H, W, BH, BW, bs, bs, False, BH * BW, M_max, P, P_pad, "c")
    frag = Fragments(
        vert_weight=w_img, vert_index=sel_img,
        valid_num=(sel_img >= 0).sum(-1), vert_hit_length=w_img,
        attr_ctx=(sel_idx_k, w_k, ids_c, pos_c, counts_c, gc["perm"],
                  None),
        attr_geom=geom,
    )
    return frag, sel_img, w_img


def _check_fused_against_segment(rng, mode, sort=True):
    from voge_tpu.sampler import _sample_features_fused, _sample_features

    sel_k, w_k, mask_k, ids_p, pts, isg, gc = _ctx_scene(rng, sort=sort)
    if mode == "g":
        frag, sel_img, w_img = _mk_frag_g(sel_k, w_k, mask_k, ids_p, gc)
    else:
        frag, sel_img, w_img = _mk_frag_c(sel_k, w_k, mask_k, ids_p, pts,
                                          isg, gc)
    B, H, W = gc["B"], gc["H"], gc["W"]
    n_vert = B * gc["P"]
    C = 3
    image = jnp.asarray(rng.uniform(0, 1, size=(B, H, W, C)).astype(np.float32))
    feat_f, wsum_f = _sample_features_fused(frag, image, n_vert,
                                            interpret=True)
    feat_r, wsum_r = _sample_features(image, w_img, sel_img, n_vert)
    np.testing.assert_allclose(np.asarray(feat_f), np.asarray(feat_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wsum_f), np.asarray(wsum_r),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(wsum_r).max()) > 0

    # gradient parity w.r.t. (kernel-layout weights, image): the segment
    # formulation consumes the unbinned weights, which is a pure reshape
    cf = jnp.asarray(rng.uniform(-1, 1, size=(n_vert, C)).astype(np.float32))
    cw = jnp.asarray(rng.uniform(-1, 1, size=(n_vert,)).astype(np.float32))

    def loss_fused(w, img):
        fr = Fragments(vert_weight=frag.vert_weight,
                       vert_index=frag.vert_index,
                       valid_num=frag.valid_num,
                       vert_hit_length=frag.vert_hit_length,
                       attr_ctx=(frag.attr_ctx[0], w) + frag.attr_ctx[2:],
                       attr_geom=frag.attr_geom)
        f, s = _sample_features_fused(fr, img, n_vert, interpret=True)
        return jnp.sum(f * cf) + jnp.sum(s * cw)

    def loss_ref(w, img):
        import voge_tpu.ops.fine as F

        wi = F.unbin_kern(w, B, gc["BH"], gc["BW"], H, W, gc["bin_size"],
                          gc["bin_size"], False)
        f, s = _sample_features(img, wi, sel_img, n_vert)
        return jnp.sum(f * cf) + jnp.sum(s * cw)

    gf = jax.grad(loss_fused, argnums=(0, 1))(w_k, image)
    gr = jax.grad(loss_ref, argnums=(0, 1))(w_k, image)
    # invalid slots: the fused d_w is 0 there by construction while the
    # segment path sees w through the valid mask (also 0) — both zero
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-5)


def test_fused_sampler_global_mode_matches_segment(rng):
    _check_fused_against_segment(rng, "g")


def test_fused_sampler_compact_mode_matches_segment(rng):
    _check_fused_against_segment(rng, "c")


def test_fused_sampler_perm_none_matches_segment(rng):
    """perm=None (original candidate order, the emission-compacted
    production path) skips the unsort entirely — values and grads must
    still match the segment formulation."""
    _check_fused_against_segment(rng, "c", sort=False)
    _check_fused_against_segment(rng, "g", sort=False)


def test_fused_sampler_dtype_follows_promotion(rng):
    """The fused path computes in f32 internally but must return the dtype
    the segment_sum fallback would (promotion from image x weights), so TPU
    and CPU calls agree (advisor round-2 finding)."""
    from voge_tpu.sampler import _sample_features_fused

    sel_k, w_k, mask_k, ids_p, pts, isg, gc = _ctx_scene(rng)
    frag, sel_img, w_img = _mk_frag_g(sel_k, w_k, mask_k, ids_p, gc)
    B, H, W = gc["B"], gc["H"], gc["W"]
    n_vert = B * gc["P"]
    img16 = jnp.asarray(
        rng.uniform(0, 1, size=(B, H, W, 3)), dtype=jnp.bfloat16
    )
    feat, wsum = _sample_features_fused(frag, img16, n_vert, interpret=True)
    want = jnp.result_type(img16.dtype, frag.vert_weight.dtype)
    assert feat.dtype == want and wsum.dtype == want


def test_fragment_mutation_clears_fused_ctx(rng):
    """Assigning a data field after construction must drop attr_ctx: the
    fused interpolate/sample paths would otherwise read the stale
    kernel-layout copies while the fallback honors the new arrays
    (advisor round-2 finding)."""
    frag = _frag(rng)
    assert frag.attr_ctx is None
    frag2 = Fragments(
        vert_weight=frag.vert_weight, vert_index=frag.vert_index,
        valid_num=frag.valid_num, vert_hit_length=frag.vert_hit_length,
        attr_ctx=("sentinel",), attr_geom=("geom",),
    )
    assert frag2.attr_ctx is not None and frag2.attr_geom is not None
    frag2.vert_weight = frag2.vert_weight * 0.5
    assert frag2.attr_ctx is None and frag2.attr_geom is None
    # a fresh ctx-carrying fragment keeps its ctx until a field is assigned
    frag3 = Fragments(
        vert_weight=frag.vert_weight, vert_index=frag.vert_index,
        valid_num=frag.valid_num, vert_hit_length=frag.vert_hit_length,
        attr_ctx=("sentinel",), attr_geom=("geom",),
    )
    assert frag3.attr_ctx == ("sentinel",)
    frag3.vert_index = frag3.vert_index
    assert frag3.attr_ctx is None
