"""Pallas fine-selection kernel vs the XLA fallback (interpret mode)."""
import numpy as np

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

    idx = rng.randint(0, P, size=(nb, M)).astype(np.int32)
    # some invalid candidates
    idx[rng.rand(nb, M) < 0.2] = -1
    ci = idx[:, None, :]
    return jnp.asarray(rf), jnp.asarray(cf), jnp.asarray(ci)


def test_pallas_select_matches_xla(rng):
    rf, cf, ci = _random_inputs(rng)
    thr_act, K = 4.0, 6
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


def test_mask_kernel_matches_xla(rng):
    """Streaming mask kernel (v2, interpret mode) vs the XLA mask fallback."""
    import jax
    from voge_tpu.ops.fine import _xla_select_mask
    from voge_tpu.ops.pallas_fine2 import fine_select_mask_pallas

    B, BHBW, R, P, K = 2, 2, 16, 300, 5
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

    mask = (rng.rand(nb, P_pad) < 0.6).astype(np.int8)
    mask[:, P:] = 0

    out_p = fine_select_mask_pallas(
        jnp.asarray(rf), jnp.asarray(gf), jnp.asarray(mask)[:, None, :], 4.0,
        K, bh_bw=BHBW, n_gauss=P, ray_chunk=8, cand_chunk=128, interpret=True,
    )
    out_x = _xla_select_mask(
        jnp.asarray(rf), jnp.asarray(gf), jnp.asarray(mask), 4.0, K, BHBW, P
    )
    np.testing.assert_array_equal(np.asarray(out_p[0]), np.asarray(out_x[0]))
    for a_, b_ in zip(out_p[1:], out_x[1:]):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5)
