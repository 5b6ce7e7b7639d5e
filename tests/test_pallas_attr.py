"""Fused attribute-compositing kernels (interpret mode) vs merge_final."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import voge_tpu.ops.fine as F
from voge_tpu.aggregation import merge_final
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.ops.coarse import overlap_mask
from voge_tpu.ops.pallas_attr import (
    attr_merge_binned,
    attr_merge_fwd_pallas,
    attr_merge_bwd_attr_pallas,
    attr_merge_bwd_w_pallas,
)
from voge_tpu.rays import camera_rays


def _scene(rng, B=2, H=20, W=20, P=80, K=6, bin_size=5, Ca=3):
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
    pts, isg, ids, perm = F._sort_bin_coherent(
        R_, T_, focal, principal, mus, isig_b, (H, W), bin_size, base_ids)
    mask = overlap_mask(R_, T_, focal, principal, pts, isg, (H, W), 0.01,
                        bin_size)
    sel_k, _aux = F._rt_fine_kern(pts, isg, rays, mask, ids, thr_act,
                                  (bin_size, bin_size), K)
    # kernel-layout weights: a positive deterministic stand-in for agg
    w_k = jnp.where(sel_k[0] >= 0,
                    1.0 / (1.0 + jnp.abs(sel_k[1])) + 0.1, 0.0)

    _, BH, BW, _ = mask.shape
    cand_chunk = 128
    P_pad = 128
    mask_flat = jnp.pad(mask.reshape(B * BH * BW, P).astype(jnp.int8),
                        ((0, 0), (0, P_pad - P)))[:, None, :]
    ids_p = F._prep_ids(ids, P, P_pad)

    attr = jnp.asarray(rng.rand(B * P, Ca).astype(np.float32))
    attr_sorted = jnp.take_along_axis(attr.reshape(B, P, Ca),
                                      perm[:, :, None], axis=1)
    Ca_pad = 8
    planes = jnp.swapaxes(attr_sorted, 1, 2)
    planes = jnp.pad(planes, ((0, 0), (0, Ca_pad - Ca), (0, P_pad - P)))
    geom = dict(B=B, H=H, W=W, BH=BH, BW=BW, bin_size=bin_size,
                bh_bw=BH * BW, cand_chunk=cand_chunk)
    return (sel_k[0], w_k, mask_flat, ids_p, planes, attr, geom)


def _reference_img(sel_idx_k, w_k, attr, geom):
    """Oracle: per-entry gather + weighted sum in kernel layout."""
    sel = np.asarray(sel_idx_k)
    w = np.asarray(w_k)
    at = np.asarray(attr)
    out = np.zeros(sel.shape[:2] + (at.shape[-1],), np.float32)
    nb, R, K = sel.shape
    for b in range(nb):
        for r in range(R):
            for k in range(K):
                if sel[b, r, k] >= 0:
                    out[b, r] += w[b, r, k] * at[sel[b, r, k]]
    return out


@pytest.mark.parametrize("K", [6, 40])
def test_attr_fwd_matches_oracle(rng, K):
    """K=40 exercises the large-K fori_loop id match (one-hot lane
    extraction) instead of the python unroll."""
    sel_k, w_k, mask_flat, ids_p, planes, attr, geom = _scene(rng, K=K)
    img = attr_merge_fwd_pallas(
        planes, w_k, sel_k, mask_flat, ids_p, geom["bh_bw"],
        geom["cand_chunk"], interpret=True,
    )
    ref = _reference_img(sel_k, w_k, attr, geom)
    np.testing.assert_allclose(np.asarray(img)[..., :3], ref, rtol=1e-5,
                               atol=1e-5)
    assert np.abs(ref).max() > 0


@pytest.mark.parametrize("K", [6, 40])
def test_attr_bwd_matches_autodiff_of_oracle(rng, K):
    sel_k, w_k, mask_flat, ids_p, planes, attr, geom = _scene(rng, K=K)
    g = jnp.asarray(rng.rand(*(w_k.shape[:2] + (8,))).astype(np.float32))

    d_attr = attr_merge_bwd_attr_pallas(
        planes, w_k, sel_k, mask_flat, ids_p, g, geom["bh_bw"],
        geom["cand_chunk"], interpret=True,
    )
    d_w = attr_merge_bwd_w_pallas(
        planes, sel_k, mask_flat, ids_p, g, w_k.shape[2], geom["bh_bw"],
        geom["cand_chunk"], interpret=True,
    )

    # unified single-pass backward must match the pair exactly
    from voge_tpu.ops.pallas_attr import attr_merge_bwd_unified_pallas

    d_attr_u, d_w_u = attr_merge_bwd_unified_pallas(
        planes, w_k, sel_k, mask_flat, ids_p, g, geom["bh_bw"],
        geom["cand_chunk"], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(d_attr_u), np.asarray(d_attr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_w_u), np.asarray(d_w),
                               rtol=1e-6, atol=1e-6)

    # numpy oracle: entry-space chain rule
    sel = np.asarray(sel_k)
    w = np.asarray(w_k)
    gn = np.asarray(g)
    ids = np.asarray(ids_p)
    pn = np.asarray(planes)
    B, Ca_pad, P_pad = pn.shape
    nb, R, K = sel.shape
    bh_bw = geom["bh_bw"]
    ref_dattr = np.zeros_like(pn)
    ref_dw = np.zeros_like(w)
    # column lookup: original id -> (b_img, col)
    col_of = {}
    for b in range(B):
        for j in range(P_pad):
            if ids[b, 0, j] >= 0:
                col_of[int(ids[b, 0, j])] = (b, j)
    for b in range(nb):
        for r in range(R):
            for k in range(K):
                s = int(sel[b, r, k])
                if s < 0:
                    continue
                bi, j = col_of[s]
                ref_dattr[bi, :, j] += w[b, r, k] * gn[b, r, :]
                ref_dw[b, r, k] = float(np.dot(pn[bi, :, j], gn[b, r, :]))
    np.testing.assert_allclose(np.asarray(d_attr), ref_dattr, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_w), ref_dw, rtol=1e-4, atol=1e-5)
    assert np.abs(ref_dattr).max() > 0 and np.abs(ref_dw).max() > 0


def test_attr_merge_custom_vjp_interpret(rng):
    sel_k, w_k, mask_flat, ids_p, planes, attr, geom = _scene(rng)
    g = jnp.asarray(rng.rand(*(w_k.shape[:2] + (8,))).astype(np.float32))

    def f(planes_, w_):
        img = attr_merge_binned(planes_, w_, sel_k, mask_flat, ids_p,
                                geom["bh_bw"], geom["cand_chunk"], True)
        return jnp.sum(img * g)

    val, (ga, gw) = jax.value_and_grad(f, argnums=(0, 1))(planes, w_k)
    ref = _reference_img(sel_k, w_k, attr, geom)
    np.testing.assert_allclose(
        float(val),
        float(np.sum(np.asarray(ref) * np.asarray(g)[..., :3])), rtol=1e-4,
    )
    assert np.isfinite(np.asarray(ga)).all()
    assert np.isfinite(np.asarray(gw)).all()
    assert float(jnp.abs(ga).max()) > 0 and float(jnp.abs(gw).max()) > 0


def test_attr_merge_compact_matches_binned(rng):
    """Compacted-candidate attribute compositing (gather + kernel +
    scatter-back VJP) must match the global-space path at full capacity."""
    from voge_tpu.ops.pallas_attr import attr_merge_compact
    from voge_tpu.ops.pallas_fine2 import compact_candidates

    sel_k, w_k, mask_flat, ids_p, planes, attr, geom = _scene(rng)
    B = geom["B"]
    P_pad = planes.shape[2]
    gf_dummy = jnp.zeros((B, 16, P_pad), jnp.float32)
    table_c, bits_c, ids_c, pos_c, counts_c, _over = compact_candidates(
        mask_flat, gf_dummy, ids_p, M_max=P_pad, bh_bw=geom["bh_bw"],
    )
    g = jnp.asarray(rng.rand(*(w_k.shape[:2] + (8,))).astype(np.float32))

    def f_ref(planes_, w_):
        img = attr_merge_binned(planes_, w_, sel_k, mask_flat, ids_p,
                                geom["bh_bw"], geom["cand_chunk"], True)
        return jnp.sum(img * g), img

    def f_cmp(planes_, w_):
        img = attr_merge_compact(planes_, w_, sel_k, ids_c, pos_c, counts_c,
                                 None, B, True)
        return jnp.sum(img * g), img

    (v0, img0), (ga0, gw0) = jax.value_and_grad(f_ref, argnums=(0, 1),
                                                has_aux=True)(planes, w_k)
    (v1, img1), (ga1, gw1) = jax.value_and_grad(f_cmp, argnums=(0, 1),
                                                has_aux=True)(planes, w_k)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               rtol=1e-5, atol=1e-6)
