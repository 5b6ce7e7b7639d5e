"""Pallas fine-selection kernel vs the XLA fallback (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp
import jax  # noqa

from voge_tpu.ops.fine import _xla_select
from voge_tpu.ops.pallas_fine import FEAT, fine_select_pallas


def _random_inputs(rng, nb=3, R=16, M=256, P=40):
    # plausible feature planes: unit-ish rays, SPD-ish candidates
    rays = rng.normal(size=(nb, R, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rf = np.zeros((nb, R, FEAT), np.float32)
    rf[:, :, 0:3] = rays
    rr = rays[:, :, :, None] * rays[:, :, None, :]
    rf[:, :, 3:12] = rr.reshape(nb, R, 9)

    mus = rng.uniform(-1, 1, size=(nb, M, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, size=(nb, M, 3, 3)).astype(np.float32)
    lam = np.einsum("nmij,nmkj->nmik", a, a) + 2 * np.eye(3, dtype=np.float32)
    A = np.einsum("nmji,nmj->nmi", lam, mus)
    msm = np.einsum("nmi,nmi->nm", mus, A)
    cf = np.zeros((nb, FEAT, M), np.float32)
    cf[:, 0:3] = A.transpose(0, 2, 1)
    cf[:, 3] = msm
    cf[:, 4:13] = lam.reshape(nb, M, 9).transpose(0, 2, 1)
    cf[:, 13:16] = mus.transpose(0, 2, 1)  # residual-act form reads mu

    idx = rng.randint(0, P, size=(nb, M)).astype(np.int32)
    # some invalid candidates
    idx[rng.rand(nb, M) < 0.2] = -1
    ci = idx[:, None, :]
    return jnp.asarray(rf), jnp.asarray(cf), jnp.asarray(ci)


@pytest.mark.parametrize("K", [6, 40])
def test_pallas_select_matches_xla(rng, K):
    """K=40 exercises the v1 kernel's large-K fori_loop extraction."""
    rf, cf, ci = _random_inputs(rng)
    thr_act = 4.0
    out_p = fine_select_pallas(rf, cf, ci, thr_act, K, ray_chunk=8, interpret=True)
    out_x = _xla_select(rf, cf, ci, thr_act, K)
    np.testing.assert_array_equal(np.asarray(out_p[0]), np.asarray(out_x[0]))
    for a, b in zip(out_p[1:], out_x[1:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_pallas_select_handles_empty_and_full(rng):
    rf, cf, ci = _random_inputs(rng, nb=2, R=8, M=128)
    # bin 0: no valid candidates at all
    ci = ci.at[0].set(-1)
    K = 4
    out_p = fine_select_pallas(rf, cf, ci, 4.0, K, ray_chunk=8, interpret=True)
    assert (np.asarray(out_p[0][0]) == -1).all()
    assert (np.asarray(out_p[1][0]) == 1e10).all()
    assert (np.asarray(out_p[2][0]) == 1e10).all()
    assert (np.asarray(out_p[3][0]) == 0).all()
    # huge threshold: all valid candidates pass
    out_q = fine_select_pallas(rf, cf, ci, 1e9, K, ray_chunk=8, interpret=True)
    valid_cand = int((np.asarray(ci[1]) >= 0).sum())
    assert (np.asarray(out_q[0][1]) >= 0).sum() == min(valid_cand, K) * 8


def _identity_ids(B, P, P_pad):
    ids = np.full((B, 1, P_pad), -1, np.int32)
    for b in range(B):
        ids[b, 0, :P] = np.arange(P, dtype=np.int32) + b * P
    return jnp.asarray(ids)


import pytest as _pytest


@_pytest.mark.parametrize("K", [5, 40])
def test_mask_kernel_matches_xla(rng, K):
    """Streaming mask kernel (v2, interpret mode) vs the XLA mask fallback.
    K=40 exercises the large-K fori_loop extraction (dynamic sublane
    stores) instead of the python unroll."""
    import jax
    from voge_tpu.ops.fine import _xla_select_mask
    from voge_tpu.ops.pallas_fine2 import fine_select_mask_pallas

    B, BHBW, R, P = 2, 2, 16, 300
    nb = B * BHBW
    rays = rng.normal(size=(nb, R, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rf = np.zeros((nb, R, FEAT), np.float32)
    rf[:, :, 0:3] = rays
    rf[:, :, 3:12] = (rays[:, :, :, None] * rays[:, :, None, :]).reshape(nb, R, 9)

    mus = rng.uniform(-1, 1, size=(B, P, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, size=(B, P, 3, 3)).astype(np.float32)
    lam = np.einsum("bmij,bmkj->bmik", a, a) + 2 * np.eye(3, dtype=np.float32)
    A = np.einsum("bmji,bmj->bmi", lam, mus)
    msm = np.einsum("bmi,bmi->bm", mus, A)
    P_pad = 512
    gf = np.zeros((B, FEAT, P_pad), np.float32)
    gf[:, 0:3, :P] = A.transpose(0, 2, 1)
    gf[:, 3, :P] = msm
    gf[:, 4:13, :P] = lam.reshape(B, P, 9).transpose(0, 2, 1)
    gf[:, 13:16, :P] = mus.transpose(0, 2, 1)  # residual-act form reads mu

    mask = (rng.rand(nb, P_pad) < 0.6).astype(np.int8)
    mask[:, P:] = 0
    ids = _identity_ids(B, P, P_pad)

    out_p = fine_select_mask_pallas(
        jnp.asarray(rf), jnp.asarray(gf), jnp.asarray(mask)[:, None, :], ids,
        4.0, K, bh_bw=BHBW, n_gauss=P, ray_chunk=8, cand_chunk=128,
        interpret=True,
    )
    out_x = _xla_select_mask(
        jnp.asarray(rf), jnp.asarray(gf), jnp.asarray(mask), ids, 4.0, K,
        BHBW, P
    )
    np.testing.assert_array_equal(np.asarray(out_p[0]), np.asarray(out_x[0]))
    for a_, b_ in zip(out_p[1:], out_x[1:]):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@_pytest.mark.parametrize("K", [5, 40])
def test_pallas_bwd_kernels_match_xla_bwd(rng, K):
    """Pallas backward kernels (interpret mode) vs the XLA entry-space
    backward on a small scene.  K=40 exercises the large-K fori_loop
    coefficient match (one-hot lane extraction)."""
    import math
    import voge_tpu.ops.fine as F
    from voge_tpu.ops.pallas_bwd import fine_bwd_gauss_pallas, fine_bwd_rays_pallas
    from voge_tpu.cameras import look_at_view_transform
    from voge_tpu.rays import camera_rays
    from voge_tpu.ops.coarse import overlap_mask

    B, H, W, P = 2, 20, 20, 60
    mus_w = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32) * 0.8
    a = rng.uniform(-1, 1, size=(P, 3, 3)).astype(np.float32)
    isig = np.einsum("pij,pkj->pik", a, a) + 2 * np.eye(3, dtype=np.float32)
    R_, T_ = look_at_view_transform(dist=[4.0, 4.5], elev=[5.0, 20.0], azim=[10.0, 40.0])
    focal = jnp.broadcast_to(jnp.asarray([[30.0, 30.0]]), (B, 2))
    principal = jnp.broadcast_to(jnp.asarray([[10.0, 10.0]]), (B, 2))
    rays, origins = camera_rays(R_, T_, focal, principal, (H, W))
    mus = jnp.asarray(mus_w)[None] - origins[:, None, :]
    isig_b = jnp.broadcast_to(jnp.asarray(isig)[None], (B, P, 3, 3))
    bin_size = 10
    mask = overlap_mask(R_, T_, focal, principal, mus, isig_b, (H, W), 0.01, bin_size)
    thr_act = -math.log(0.01 + 1e-10)

    base_ids = (jnp.arange(P, dtype=jnp.int32)[None, :]
                + (jnp.arange(B, dtype=jnp.int32) * P)[:, None])
    sel = F._fine_forward_mask(mus, isig_b, rays, mask, base_ids, thr_act,
                               (bin_size, bin_size), K)
    g = (None,
         jnp.asarray(rng.rand(B, H, W, K).astype(np.float32)),
         jnp.asarray(rng.rand(B, H, W, K).astype(np.float32)),
         jnp.asarray(rng.rand(B, H, W, K).astype(np.float32)))

    # reference: XLA entry-space backward
    gm_x, gi_x, gr_x, _ = F._ray_trace_fine_bwd(
        thr_act, (bin_size, bin_size), K,
        (mus.reshape(-1, 3), isig_b.reshape(-1, 3, 3), rays, sel[0], mask), g,
    )
    gm_x = np.asarray(gm_x).reshape(B, P, 3)
    gi_x = np.asarray(gi_x).reshape(B, P, 3, 3)

    # pallas path (interpret)
    _, BH, BW, _ = mask.shape
    cand_chunk = 128
    P_pad = 128
    gf = F._gauss_feature_planes_batched(mus, isig_b)
    gf = jnp.pad(gf, ((0, 0), (0, 0), (0, P_pad - P)))
    mf = jnp.pad(mask.reshape(B * BH * BW, P).astype(jnp.int8),
                 ((0, 0), (0, P_pad - P)))[:, None, :]
    rays_feat, Rr, R_pad = F._rays_features(rays, BH, BW, bin_size, bin_size)
    args = (
        F._bin_hwk(sel[0], BH, BW, bin_size, bin_size, H, W, R_pad, -1),
        F._bin_hwk(g[1], BH, BW, bin_size, bin_size, H, W, R_pad, 0.0),
        F._bin_hwk(g[2], BH, BW, bin_size, bin_size, H, W, R_pad, 0.0),
        F._bin_hwk(g[3], BH, BW, bin_size, bin_size, H, W, R_pad, 0.0),
    )
    ids_p = _identity_ids(B, P, P_pad)
    gg = fine_bwd_gauss_pallas(
        rays_feat, gf, mf, ids_p, *args, thr_act=thr_act, K=K, bh_bw=BH * BW,
        n_gauss=P, ray_chunk=8, cand_chunk=cand_chunk, interpret=True,
    )
    rb = fine_bwd_rays_pallas(
        rays_feat, gf, mf, ids_p, *args, thr_act=thr_act, K=K, bh_bw=BH * BW,
        n_gauss=P, ray_chunk=8, cand_chunk=cand_chunk, interpret=True,
    )
    gm_p = np.asarray(jnp.stack([gg[:, i, :P] for i in range(3)], axis=-1))
    gi_p = np.asarray(jnp.stack([gg[:, 3 + q, :P] for q in range(9)], axis=-1)).reshape(B, P, 3, 3)
    gr_p = np.asarray(F._unbin(rb[:, : bin_size * bin_size, 0:3],
                               B, BH, BW, H, W, bin_size, bin_size))
    np.testing.assert_allclose(gm_p, gm_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gi_p, gi_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gr_p, np.asarray(gr_x), rtol=1e-4, atol=1e-4)

    # unified single-pass backward must match the two-kernel pair exactly
    from voge_tpu.ops.pallas_bwd import fine_bwd_unified_pallas

    gg_u, rb_u = fine_bwd_unified_pallas(
        rays_feat, gf, mf, ids_p, *args, thr_act=thr_act, K=K, bh_bw=BH * BW,
        n_gauss=P, ray_chunk=8, cand_chunk=cand_chunk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(gg_u), np.asarray(gg), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb_u), np.asarray(rb), rtol=1e-6, atol=1e-6)

    # compacted-candidate backward (kernel + segment_sum scatter-back) must
    # also match
    from voge_tpu.ops.pallas_bwd import fine_bwd_compact_pallas
    from voge_tpu.ops.pallas_fine2 import compact_candidates

    table_c, bits_c, ids_c, pos_c, counts_c, _over = compact_candidates(
        mf, gf, ids_p, M_max=128, bh_bw=BH * BW,
    )
    gg_c, rb_c = fine_bwd_compact_pallas(
        rays_feat, table_c, ids_c, pos_c, counts_c, *args,
        K=K, B=B, P_pad=P_pad, ray_chunk=8, cand_chunk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(gg_c), np.asarray(gg), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb_c), np.asarray(rb), rtol=1e-6, atol=1e-6)


def test_supertile_grouping_roundtrip(rng):
    from voge_tpu.ops.fine import _group_supertiles, _ungroup_supertiles

    B, BH, BW, R, C = 2, 3, 5, 8, 7
    x = jnp.asarray(rng.rand(B * BH * BW, R, C).astype(np.float32))
    g, BH2, BW2 = _group_supertiles(x, B, BH, BW)
    assert g.shape == (B * BH2 * BW2, 4 * R, C)
    back = _ungroup_supertiles(g, B, BH, BW)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_mask_kernel_supertiled_matches_xla(rng):
    """Grouped (2x2 sub-bin) kernel path vs ungrouped XLA selection."""
    from voge_tpu.ops.fine import (
        _group_supertiles,
        _ungroup_supertiles,
        _xla_select_mask,
    )
    from voge_tpu.ops.pallas_fine2 import fine_select_mask_pallas

    B, BH, BW, Rb, P, K = 2, 2, 2, 8, 200, 4
    nb = B * BH * BW
    rays = rng.normal(size=(nb, Rb, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rf = np.zeros((nb, Rb, FEAT), np.float32)
    rf[:, :, 0:3] = rays
    rf[:, :, 3:12] = (rays[:, :, :, None] * rays[:, :, None, :]).reshape(nb, Rb, 9)

    mus = rng.uniform(-1, 1, size=(B, P, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, size=(B, P, 3, 3)).astype(np.float32)
    lam = np.einsum("bmij,bmkj->bmik", a, a) + 2 * np.eye(3, dtype=np.float32)
    A = np.einsum("bmji,bmj->bmi", lam, mus)
    msm = np.einsum("bmi,bmi->bm", mus, A)
    P_pad = 256
    gf = np.zeros((B, FEAT, P_pad), np.float32)
    gf[:, 0:3, :P] = A.transpose(0, 2, 1)
    gf[:, 3, :P] = msm
    gf[:, 4:13, :P] = lam.reshape(B, P, 9).transpose(0, 2, 1)
    gf[:, 13:16, :P] = mus.transpose(0, 2, 1)  # residual-act form reads mu
    gf[:, 13:16, :P] = mus.transpose(0, 2, 1)

    mask = (rng.rand(nb, P_pad) < 0.5).astype(np.int8)
    mask[:, P:] = 0

    rf_j = jnp.asarray(rf)
    ids = _identity_ids(B, P, P_pad)
    out_x = _xla_select_mask(
        rf_j, jnp.asarray(gf), jnp.asarray(mask), ids, 4.0, K, BH * BW, P
    )

    rf_g, BH2, BW2 = _group_supertiles(rf_j, B, BH, BW)
    mask_g, _, _ = _group_supertiles(jnp.asarray(mask)[:, None, :], B, BH, BW)
    out_g = fine_select_mask_pallas(
        rf_g, jnp.asarray(gf), mask_g, ids, 4.0, K,
        bh_bw=BH2 * BW2, n_gauss=P, ray_chunk=rf_g.shape[1],
        cand_chunk=128, interpret=True,
    )
    out_p = tuple(_ungroup_supertiles(x, B, BH, BW) for x in out_g)
    np.testing.assert_array_equal(np.asarray(out_p[0]), np.asarray(out_x[0]))
    for a_, b_ in zip(out_p[1:], out_x[1:]):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5)


def test_bin_coherent_sorting_parity(rng):
    """Sorted candidates + ids plane produce the same selection (same
    original indices) as identity order, via the XLA mask fallback."""
    import math
    import voge_tpu.ops.fine as F
    from voge_tpu.cameras import look_at_view_transform
    from voge_tpu.rays import camera_rays
    from voge_tpu.ops.coarse import overlap_mask

    B, H, W, P, K = 2, 20, 20, 80, 6
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
    bin_size = 5
    thr_act = -math.log(0.01 + 1e-10)
    base_ids = (jnp.arange(P, dtype=jnp.int32)[None, :]
                + (jnp.arange(B, dtype=jnp.int32) * P)[:, None])

    mask_id = overlap_mask(R_, T_, focal, principal, mus, isig_b, (H, W),
                           0.01, bin_size)
    sel_id = F._fine_forward_mask(mus, isig_b, rays, mask_id, base_ids,
                                  thr_act, (bin_size, bin_size), K)

    pts_s, isg_s, ids_s, _perm = F._sort_bin_coherent(
        R_, T_, focal, principal, mus, isig_b, (H, W), bin_size, base_ids)
    # the permutation really reorders something
    assert not np.array_equal(np.asarray(ids_s), np.asarray(base_ids))
    mask_s = overlap_mask(R_, T_, focal, principal, pts_s, isg_s, (H, W),
                          0.01, bin_size)
    sel_s = F._fine_forward_mask(pts_s, isg_s, rays, mask_s, ids_s,
                                 thr_act, (bin_size, bin_size), K)

    # same original indices selected per pixel (as sets; tie order within
    # identical lengths may differ), and same lengths/acts sorted by length
    np.testing.assert_allclose(np.asarray(sel_s[1]), np.asarray(sel_id[1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.sort(np.asarray(sel_s[0]), axis=-1),
        np.sort(np.asarray(sel_id[0]), axis=-1),
    )


def test_erf32_matches_lax_erf():
    """The in-kernel rational erf (Mosaic has no erf lowering) tracks
    ``jax.lax.erf`` to ~5e-7 over the clipped [-4, 4] domain and saturates
    identically outside it."""
    from voge_tpu.ops.pallas_fine2 import _erf32

    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    got = np.asarray(_erf32(x))
    want = np.asarray(jax.lax.erf(x))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(float(_erf32(jnp.float32(100.0))) - 1.0) < 1e-6
    assert abs(float(_erf32(jnp.float32(-100.0))) + 1.0) < 1e-6


@_pytest.mark.parametrize("K", [5, 40])
def test_mask_kernel_fused_aggregation_matches_xla(rng, K):
    """agg_ow path: the kernel's 5th output (in-VMEM erf compositing over
    the final selection) equals ``weights_from_sel`` applied to the 4-tuple
    selection (the XLA math the renderer's separate pass used).  K=40
    exercises the fori_loop erf sweep (dynamic sublane reads)."""
    from voge_tpu.aggregation import weights_from_sel
    from voge_tpu.ops.pallas_fine2 import fine_select_mask_pallas

    B, BHBW, R, P = 2, 2, 16, 300
    nb = B * BHBW
    rays = rng.normal(size=(nb, R, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rf = np.zeros((nb, R, FEAT), np.float32)
    rf[:, :, 0:3] = rays
    rf[:, :, 3:12] = (rays[:, :, :, None] * rays[:, :, None, :]).reshape(nb, R, 9)

    mus = rng.uniform(-1, 1, size=(B, P, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, size=(B, P, 3, 3)).astype(np.float32)
    lam = np.einsum("bmij,bmkj->bmik", a, a) + 2 * np.eye(3, dtype=np.float32)
    A = np.einsum("bmji,bmj->bmi", lam, mus)
    msm = np.einsum("bmi,bmi->bm", mus, A)
    P_pad = 512
    gf = np.zeros((B, FEAT, P_pad), np.float32)
    gf[:, 0:3, :P] = A.transpose(0, 2, 1)
    gf[:, 3, :P] = msm
    gf[:, 4:13, :P] = lam.reshape(B, P, 9).transpose(0, 2, 1)
    gf[:, 13:16, :P] = mus.transpose(0, 2, 1)  # residual-act form reads mu

    mask = (rng.rand(nb, P_pad) < 0.6).astype(np.int8)
    mask[:, P:] = 0
    ids = _identity_ids(B, P, P_pad)

    ow = 0.7
    out = fine_select_mask_pallas(
        jnp.asarray(rf), jnp.asarray(gf), jnp.asarray(mask)[:, None, :], ids,
        4.0, K, bh_bw=BHBW, n_gauss=P, ray_chunk=8, cand_chunk=128,
        interpret=True, agg_ow=ow,
    )
    assert len(out) == 5
    want = weights_from_sel(out[1], out[2], out[3], ow)
    np.testing.assert_allclose(
        np.asarray(out[4]), np.asarray(want), rtol=1e-5, atol=1e-6
    )
    # empty slots must carry zero weight
    np.testing.assert_array_equal(
        np.asarray(out[4])[np.asarray(out[0]) < 0], 0.0
    )


@_pytest.mark.parametrize("K,Kp", [(6, 8), (40, 40)])
def test_fold_weights_kernel_matches_xla_vjp(rng, K, Kp):
    """The transposed fold backward kernel (fold_weights_pallas, interpret
    mode) equals jax.vjp of ``weights_from_sel`` on the same selection —
    including invalid (act = 1e10) and padding slots.  K=40 exercises the
    fori_loop sweep with scratch-row stores."""
    from voge_tpu.aggregation import weights_from_sel
    from voge_tpu.ops.pallas_fine2 import fold_weights_pallas

    nb, R = 3, 24
    l = rng.uniform(1, 9, (nb, R, K)).astype(np.float32)
    a = rng.uniform(0, 4, (nb, R, K)).astype(np.float32)
    d = rng.uniform(0.1, 50, (nb, R, K)).astype(np.float32)
    inv = rng.rand(nb, R, K) < 0.3
    l[inv] = 1e10
    a[inv] = 1e10
    d[inv] = 0.0
    gw = rng.normal(size=(nb, R, K)).astype(np.float32)
    ow = 1.3

    w = weights_from_sel(jnp.asarray(l), jnp.asarray(a), jnp.asarray(d), ow)
    _, vjp = jax.vjp(
        lambda l_, a_, d_: weights_from_sel(l_, a_, d_, ow),
        jnp.asarray(l), jnp.asarray(a), jnp.asarray(d),
    )
    dl0, da0, dd0 = vjp(jnp.asarray(gw))

    # transposed padded inputs as the select kernel would emit them
    def t_pad(x, fill):
        x_t = np.swapaxes(x, 1, 2)
        return jnp.asarray(np.concatenate(
            [x_t, np.full((nb, Kp - K, R), fill, np.float32)], axis=1))

    dl1, da1, dd1 = fold_weights_pallas(
        t_pad(l, 1e10), t_pad(a, 1e10), t_pad(d, 0.0),
        t_pad(np.asarray(w), 0.0), t_pad(gw, 0.0), ow, K, interpret=True,
    )
    for x0, x1 in [(dl0, dl1), (da0, da1), (dd0, dd1)]:
        x1_rk = np.swapaxes(np.asarray(x1), 1, 2)[:, :, :K]
        np.testing.assert_allclose(
            np.asarray(x0), x1_rk, rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
@_pytest.mark.parametrize("fold", [False, True])
@_pytest.mark.parametrize("K", [5, 40])
def test_bwd_compact_t_matches_ray_major(rng, K, fold):
    """The fully transposed compacted backward (fine_bwd_compact_t_pallas,
    interpret mode) — fold + entry-space chain rule + slot match all on the
    kernel-native (Kp, R) layout — matches the ray-major compacted backward
    (fine_bwd_compact_pallas) fed the separately-folded cotangents.  K=40
    exercises the fori_loop prologue/match paths."""
    import math
    import voge_tpu.ops.fine as F
    from voge_tpu.cameras import look_at_view_transform
    from voge_tpu.rays import camera_rays
    from voge_tpu.ops.coarse import overlap_mask
    from voge_tpu.ops.pallas_bwd import (
        fine_bwd_compact_pallas, fine_bwd_compact_t_pallas,
    )
    from voge_tpu.ops.pallas_fine2 import (
        compact_candidates, fine_select_compact_pallas, fold_weights_pallas,
        prefix_visit_lists,
    )

    B, H, W, P = 2, 20, 20, 60
    mus_w = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32) * 0.8
    a = rng.uniform(-1, 1, size=(P, 3, 3)).astype(np.float32)
    isig = np.einsum("pij,pkj->pik", a, a) + 2 * np.eye(3, dtype=np.float32)
    R_, T_ = look_at_view_transform(
        dist=[4.0, 4.5], elev=[5.0, 20.0], azim=[10.0, 40.0]
    )
    focal = jnp.broadcast_to(jnp.asarray([[30.0, 30.0]]), (B, 2))
    principal = jnp.broadcast_to(jnp.asarray([[10.0, 10.0]]), (B, 2))
    rays, origins = camera_rays(R_, T_, focal, principal, (H, W))
    mus = jnp.asarray(mus_w)[None] - origins[:, None, :]
    isig_b = jnp.broadcast_to(jnp.asarray(isig)[None], (B, P, 3, 3))
    bin_size = 10
    mask = overlap_mask(
        R_, T_, focal, principal, mus, isig_b, (H, W), 0.01, bin_size
    )
    thr_act = -math.log(0.01 + 1e-10)
    _, BH, BW, _ = mask.shape
    nb = B * BH * BW
    P_pad = 128
    M_max = 128
    ow = 0.9

    gf = F._gauss_feature_planes_batched(mus, isig_b)
    gf = jnp.pad(gf, ((0, 0), (0, 0), (0, P_pad - P)))
    mf = jnp.pad(mask.reshape(nb, P).astype(jnp.int8),
                 ((0, 0), (0, P_pad - P)))[:, None, :]
    rays_feat, _R, R_pad = F._rays_features(rays, BH, BW, bin_size, bin_size)
    ids_p = _identity_ids(B, P, P_pad)

    table_c, bits_c, ids_c, pos_c, counts_c, _over = compact_candidates(
        mf, gf, ids_p, M_max=M_max, bh_bw=BH * BW,
    )
    rays_t = jnp.swapaxes(rays_feat, 1, 2)
    csel, cnts = prefix_visit_lists(counts_c, M_max, 128)
    sel, raw = fine_select_compact_pallas(
        rays_t, table_c, bits_c, ids_c, csel, cnts, thr_act, K,
        sub_bins=1, ray_chunk=R_pad, cand_chunk=128, per_bin_cand=True,
        interpret=True, agg_ow=(ow if fold else None), return_raw=True,
    )
    Kp = raw[0].shape[1]

    gl = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))
    ga = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))
    gd = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))

    def t_pad(x):
        x = jnp.swapaxes(x, 1, 2)
        if Kp > K:
            x = jnp.pad(x, ((0, 0), (0, Kp - K), (0, 0)))
        return x

    if fold:
        gw = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))
        _idx_t, l_t, a_t, d_t, w_t = raw
        dl_t, da_t, dd_t = fold_weights_pallas(
            l_t, a_t, d_t, w_t, t_pad(gw), ow, K, interpret=True
        )
        rk = lambda x: jnp.swapaxes(x, 1, 2)[:, :, :K]
        gl_f, ga_f, gd_f = gl + rk(dl_t), ga + rk(da_t), gd + rk(dd_t)
        g_t = (t_pad(gl), t_pad(ga), t_pad(gd), t_pad(gw))
    else:
        gl_f, ga_f, gd_f = gl, ga, gd
        g_t = (t_pad(gl), t_pad(ga), t_pad(gd))

    gg_old, rb_old = fine_bwd_compact_pallas(
        rays_feat, table_c, ids_c, pos_c, counts_c,
        sel[0], gl_f, ga_f, gd_f, K=K, B=B, P_pad=P_pad,
        ray_chunk=8, cand_chunk=128, interpret=True,
    )
    gg_new, rb_new = fine_bwd_compact_t_pallas(
        rays_t, table_c, ids_c, counts_c, raw, g_t,
        K=K, cand_chunk=128, dst=None, B=B, P_pad=P_pad,
        agg_ow=ow, mode="both", interpret=True, pos_c=pos_c,
    )
    # the two formulations differ in accumulation order (the ray-major
    # kernel recomputes len/act/dsd from the features; the transposed one
    # uses the saved primals) — a few-ulp spread at f32 on O(1e2) grads
    np.testing.assert_allclose(
        np.asarray(gg_new), np.asarray(gg_old), rtol=5e-3, atol=5e-4
    )
    rb_new_rm = jnp.swapaxes(rb_new, 1, 2)
    np.testing.assert_allclose(
        np.asarray(rb_new_rm[..., 0:3]), np.asarray(rb_old[..., 0:3]),
        rtol=5e-3, atol=5e-4,
    )


@_pytest.mark.parametrize("K", [5, 40])
@_pytest.mark.parametrize("cc", [128, 64])
def test_fused_attr_kernels_match_lazy_chain(rng, K, cc):
    """The fused attribute compositing (attr columns riding the candidate
    table; ops/pallas_fine2._kernel_tc flush + ops/pallas_bwd._bwd_t_kernel
    prologue, interpret mode) matches the lazy chain it replaces:

      fwd:  img == sum_k w_k * attr[sel_k]   (pallas_attr math)
      bwd:  feature grads == the un-fused transposed backward fed the
            separately-computed total weight cotangent gw + d_w(attr);
            d_attr == the direct entry-space sum.

    Reference chain: Aggregation.py:111-141 composed with
    ray_trace_voge.cu:283-360.  K=40 exercises the fori_loop paths."""
    import math
    import voge_tpu.ops.fine as F
    from voge_tpu.cameras import look_at_view_transform
    from voge_tpu.rays import camera_rays
    from voge_tpu.ops.coarse import overlap_mask
    from voge_tpu.ops.pallas_bwd import fine_bwd_compact_t_pallas
    from voge_tpu.ops.pallas_fine2 import (
        compact_candidates, fine_select_compact_pallas, prefix_visit_lists,
    )

    B, H, W, P, Ca = 2, 20, 20, 60, 8
    mus_w = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32) * 0.8
    a = rng.uniform(-1, 1, size=(P, 3, 3)).astype(np.float32)
    isig = np.einsum("pij,pkj->pik", a, a) + 2 * np.eye(3, dtype=np.float32)
    R_, T_ = look_at_view_transform(
        dist=[4.0, 4.5], elev=[5.0, 20.0], azim=[10.0, 40.0]
    )
    focal = jnp.broadcast_to(jnp.asarray([[30.0, 30.0]]), (B, 2))
    principal = jnp.broadcast_to(jnp.asarray([[10.0, 10.0]]), (B, 2))
    rays, origins = camera_rays(R_, T_, focal, principal, (H, W))
    mus = jnp.asarray(mus_w)[None] - origins[:, None, :]
    isig_b = jnp.broadcast_to(jnp.asarray(isig)[None], (B, P, 3, 3))
    bin_size = 10
    mask = overlap_mask(
        R_, T_, focal, principal, mus, isig_b, (H, W), 0.01, bin_size
    )
    thr_act = -math.log(0.01 + 1e-10)
    _, BH, BW, _ = mask.shape
    nb = B * BH * BW
    P_pad = 128
    M_max = 128  # single chunk: the fused attr path's requirement
    ow = 0.9

    gf = F._gauss_feature_planes_batched(mus, isig_b)
    gf = jnp.pad(gf, ((0, 0), (0, 0), (0, P_pad - P)))
    attr = rng.normal(size=(B, Ca, P_pad)).astype(np.float32)
    attr[:, :, P:] = 0.0
    attr = jnp.asarray(attr)
    mf = jnp.pad(mask.reshape(nb, P).astype(jnp.int8),
                 ((0, 0), (0, P_pad - P)))[:, None, :]
    rays_feat, _R, R_pad = F._rays_features(rays, BH, BW, bin_size, bin_size)
    ids_p = _identity_ids(B, P, P_pad)

    table_c, bits_c, ids_c, pos_c, counts_c, _over = compact_candidates(
        mf, gf, ids_p, M_max=M_max, bh_bw=BH * BW,
    )
    # attr columns gathered by the same pos_c (as _rt_fine_compact_impl's
    # packed table gather does)
    rows_a = jnp.swapaxes(attr, 1, 2).reshape(B * P_pad, Ca)
    img_row = jnp.arange(nb, dtype=jnp.int32)[:, None] // (BH * BW)
    attr_c = rows_a[(img_row * P_pad + pos_c).reshape(-1)].reshape(
        nb, M_max, Ca)
    table_ca = jnp.concatenate([table_c, attr_c], axis=2)

    rays_t = jnp.swapaxes(rays_feat, 1, 2)
    csel, cnts = prefix_visit_lists(counts_c, M_max, cc)
    sel, raw = fine_select_compact_pallas(
        rays_t, table_ca, bits_c, ids_c, csel, cnts, thr_act, K,
        sub_bins=1, ray_chunk=R_pad, cand_chunk=cc, per_bin_cand=True,
        interpret=True, agg_ow=ow, return_raw=True, n_attr=Ca,
    )
    assert len(sel) == 6
    sel_idx, w_b, img_t = np.asarray(sel[0]), np.asarray(sel[4]), sel[5]

    # ---- fwd reference: img[ca, r] = sum_k w_k * attr[sel_k, ca] --------
    attr_flat = np.asarray(rows_a)                        # (B*P_pad, Ca)
    gid = np.where(sel_idx >= 0, sel_idx, 0)
    # global flattened id b*P + p -> row b*P_pad + p in attr_flat
    arow = (gid // P) * P_pad + gid % P
    picked = attr_flat[arow]                              # (nb, R, K, Ca)
    wv = np.where(sel_idx >= 0, w_b, 0.0)
    img_ref = np.einsum("nrk,nrkc->ncr", wv, picked)
    np.testing.assert_allclose(
        np.asarray(img_t), img_ref, rtol=1e-4, atol=1e-5
    )

    # ---- bwd: fused vs (un-fused + precomputed gw fold-in) --------------
    Kp = raw[0].shape[1]

    def t_pad(x, fill=0.0):
        x = jnp.swapaxes(x, 1, 2)
        if Kp > K:
            x = jnp.pad(x, ((0, 0), (0, Kp - K), (0, 0)),
                        constant_values=fill)
        return x

    gl = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))
    ga = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))
    gd = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))
    gw = jnp.asarray(rng.normal(size=(nb, R_pad, K)).astype(np.float32))
    g_img = jnp.asarray(rng.normal(size=(nb, Ca, R_pad)).astype(np.float32))

    gg_f, rb_f = fine_bwd_compact_t_pallas(
        rays_t, table_ca, ids_c, counts_c, raw, 
        (t_pad(gl), t_pad(ga), t_pad(gd), t_pad(gw)),
        K=K, cand_chunk=cc, dst=None, B=B, P_pad=P_pad,
        agg_ow=ow, mode="both", interpret=True, pos_c=pos_c,
        n_attr=Ca, g_img_t=g_img,
    )
    # d_w from the attr image, computed entry-space (invalid slots carry
    # arbitrary values — the fold multiplies by w = 0 either way, but zero
    # them to match what the fused kernel's id-match produces for them)
    dw_ref = np.einsum("ncr,nrkc->nrk", np.asarray(g_img), picked)
    gw_tot = gw + jnp.asarray(np.where(sel_idx >= 0, dw_ref, 0.0))
    gg_u, rb_u = fine_bwd_compact_t_pallas(
        rays_t, table_c, ids_c, counts_c, raw[:5],
        (t_pad(gl), t_pad(ga), t_pad(gd), t_pad(gw_tot)),
        K=K, cand_chunk=cc, dst=None, B=B, P_pad=P_pad,
        agg_ow=ow, mode="both", interpret=True, pos_c=pos_c,
    )
    np.testing.assert_allclose(
        np.asarray(gg_f[:, :16]), np.asarray(gg_u), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rb_f), np.asarray(rb_u), rtol=2e-3, atol=1e-4
    )
    # ---- d_attr reference: direct entry-space sum -----------------------
    d_attr_ref = np.zeros((B, Ca, P_pad), np.float32)
    gimg_np = np.asarray(g_img)
    for b in range(nb):
        bi = b // (BH * BW)
        for r in range(R_pad):
            for k in range(K):
                gidv = sel_idx[b, r, k]
                if gidv < 0:
                    continue
                p = gidv % P
                d_attr_ref[bi, :, p] += wv[b, r, k] * gimg_np[b, :, r]
    np.testing.assert_allclose(
        np.asarray(gg_f[:, 16:16 + Ca]), d_attr_ref, rtol=2e-3, atol=1e-4
    )
