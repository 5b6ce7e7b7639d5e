"""Core ray-tracing op tests: dense oracle, fine/coarse consistency, and the
analytic custom VJP against jax.grad of the dense formulation."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voge_tpu.ops import dense, fine, coarse
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.rays import camera_rays


def _scene(rng, P=30, seed_spread=1.0):
    mus = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32) * seed_spread
    # random SPD inverse covariances
    a = rng.uniform(-1, 1, size=(P, 3, 3)).astype(np.float32)
    isig = np.einsum("pij,pkj->pik", a, a) + 2.0 * np.eye(3, dtype=np.float32)
    return jnp.asarray(mus), jnp.asarray(isig)


def _camera(B=1):
    R, T = look_at_view_transform(
        dist=[4.0] * B, elev=list(10.0 + 5 * np.arange(B)),
        azim=list(30.0 + 20 * np.arange(B)),
    )
    focal = jnp.broadcast_to(jnp.asarray([[50.0, 50.0]]), (B, 2))
    principal = jnp.broadcast_to(jnp.asarray([[16.0, 16.0]]), (B, 2))
    return R, T, focal, principal


def test_dense_hit_values_match_manual(rng):
    mus, isig = _scene(rng, P=5)
    rays = rng.normal(size=(7, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rays = jnp.asarray(rays)
    hl, ha, hd = dense.ray_trace_voge_ray(mus, isig, rays)
    for n in range(7):
        for p in range(5):
            r = np.asarray(rays[n])
            m = np.asarray(mus[p])
            L = np.asarray(isig[p])
            ksk = r @ L @ r
            msk = m @ L @ r
            msm = m @ L @ m
            assert abs(float(hl[n, p]) - msk / ksk) < 1e-4
            assert abs(float(ha[n, p]) - (msm - msk**2 / ksk)) < 1e-3
            assert abs(float(hd[n, p]) - ksk) < 1e-4


def test_find_nearest_k_semantics(rng):
    hl = jnp.asarray(rng.uniform(0, 10, size=(4, 12)).astype(np.float32))
    ha = jnp.asarray(rng.uniform(0, 8, size=(4, 12)).astype(np.float32))
    hd = jnp.asarray(rng.uniform(0.1, 2, size=(4, 12)).astype(np.float32))
    K, thr = 5, 0.05
    thr_act = -math.log(thr + 1e-8)
    idx, sl, sa, sd = dense.find_nearest_k(hl, ha, hd, K, thr)
    idx, sl, sa, sd = map(np.asarray, (idx, sl, sa, sd))
    for n in range(4):
        ok = np.asarray(ha[n]) < thr_act
        cand = np.where(ok)[0]
        order = cand[np.argsort(np.asarray(hl[n])[cand], kind="stable")][:K]
        k_valid = len(order)
        np.testing.assert_array_equal(idx[n, :k_valid], order)
        np.testing.assert_allclose(sl[n, :k_valid], np.asarray(hl[n])[order], rtol=1e-6)
        np.testing.assert_allclose(sa[n, :k_valid], np.asarray(ha[n])[order], rtol=1e-6)
        np.testing.assert_allclose(sd[n, :k_valid], np.asarray(hd[n])[order], rtol=1e-6)
        assert (idx[n, k_valid:] == -1).all()
        assert (sl[n, k_valid:] == 1e10).all()
        assert (sa[n, k_valid:] == 1e10).all()
        assert (sd[n, k_valid:] == 0).all()


def test_fine_no_coarse_equals_dense_selection(rng):
    """The binned fine op on the all-points bin must equal
    dense hits + find_nearest_k (the brute-force path is the oracle)."""
    B, H, W, P, K, thr = 1, 8, 12, 30, 6, 0.01
    mus, isig = _scene(rng, P=P)
    R, T, focal, principal = _camera(B)
    rays, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus - origins[0]

    sel = fine.ray_tracing(
        (R, T, focal, principal), mus_cam[None], isig[None], rays,
        (H, W), thr=thr, n_assign=K, max_points_per_bin=-1,
    )
    hl, ha, hd = dense.ray_trace_voge_ray(mus_cam, isig, rays.reshape(-1, 3))
    # thr_act convention differs: fine uses -log(thr + 1e-10) (inf=1e10),
    # find_nearest_k uses -log(thr + 1e-8); negligible for thr=0.01 but we
    # match the fine op's threshold explicitly here.
    idx2, sl2, sa2, sd2 = dense._nearest_k_impl(
        hl, ha, hd, -math.log(thr + 1e-10), K
    )
    np.testing.assert_array_equal(
        np.asarray(sel[0]).reshape(-1, K), np.asarray(idx2)
    )
    np.testing.assert_allclose(
        np.asarray(sel[1]).reshape(-1, K), np.asarray(sl2), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sel[2]).reshape(-1, K), np.asarray(sa2), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sel[3]).reshape(-1, K), np.asarray(sd2), rtol=1e-5, atol=1e-5
    )


def test_coarse_bins_match_reference_ndc_oracle(rng):
    """My pixel-space binning must reproduce the reference's NDC-space
    binning *exactly*: literal numpy port of ``convert_to_box``
    (RayTracing.py:33-39), the bbox kernel (rasterize_coarse.cu:20-42) and
    the bin overlap tests (rasterize_coarse.cu:111-135)."""
    B, H, W, P, thr, bin_size = 1, 33, 47, 40, 0.01, 10
    mus, isig = _scene(rng, P=P, seed_spread=0.8)
    R, T, focal, principal = _camera(B)
    _, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus[None] - origins[:, None, :]
    isig_b = jnp.broadcast_to(isig[None], (B, P, 3, 3))

    from voge_tpu.cameras import camera_centers, world_to_view

    Rn = np.asarray(R)
    C = np.asarray(camera_centers(R, T))
    pts_world = np.asarray(mus_cam) + C[:, None, :]
    view = np.asarray(world_to_view(jnp.asarray(pts_world), R, T))
    z_view = view[..., 2]
    s = min(H, W)
    fx, fy = float(focal[0, 0]), float(focal[0, 1])
    px, py = float(principal[0, 0]), float(principal[0, 1])
    xs = px - fx * view[..., 0] / z_view  # mirrored screen convention
    ys = py - fy * view[..., 1] / z_view
    x_ndc = (2 * xs - W) / s  # negated-pytorch3d convention
    y_ndc = (2 * ys - H) / s
    isig_cam = np.einsum("bji,bpjk,bkl->bpil", Rn, np.asarray(isig_b), Rn)
    P2 = np.array([[-2 * fx / s, 0], [0, -2 * fy / s]])
    inv2 = np.linalg.inv(isig_cam[..., :2, :2])
    get = -math.log(thr) * np.einsum("ij,bpjk,kl->bpil", P2, inv2, P2)
    box = np.sqrt(get.sum(axis=2)) * (1 / z_view)[..., None]  # ones @ get

    BH, BW = (H - 1) // bin_size + 1, (W - 1) // bin_size + 1

    def pix2ndc(i, S1, S2):
        rg = 2.0 if S1 <= S2 else 2.0 * S1 / S2
        off = rg / 2
        return -off + (rg * i + off) / S1

    half_x = (2.0 if W <= H else 2.0 * W / H) / 2 / W
    half_y = (2.0 if H <= W else 2.0 * H / W) / 2 / H
    oracle = np.zeros((B, BH, BW, P), bool)
    for p in range(P):
        if z_view[0, p] < 0:
            continue
        xmin, xmax = x_ndc[0, p] - box[0, p, 0], x_ndc[0, p] + box[0, p, 0]
        ymin, ymax = y_ndc[0, p] - box[0, p, 1], y_ndc[0, p] + box[0, p, 1]
        for by in range(BH):
            bymin = pix2ndc(by * bin_size, H, W) - half_y
            bymax = pix2ndc((by + 1) * bin_size - 1, H, W) + half_y
            if not ((ymin <= bymax) and (bymin < ymax)):
                continue
            for bx in range(BW):
                bxmin = pix2ndc(bx * bin_size, W, H) - half_x
                bxmax = pix2ndc((bx + 1) * bin_size - 1, W, H) + half_x
                if (xmin <= bxmax) and (bxmin < xmax):
                    oracle[0, by, bx, p] = True

    bins = np.asarray(
        coarse.rasterize_coarse(
            R, T, focal, principal, mus_cam, isig_b, (H, W), thr, bin_size, P
        )
    )
    mine = np.zeros_like(oracle)
    for by in range(BH):
        for bx in range(BW):
            for v in bins[0, by, bx]:
                if v >= 0:
                    mine[0, by, bx, v % P] = True
    np.testing.assert_array_equal(mine, oracle)


@pytest.mark.parametrize("case", [
    "plain", "big",
    pytest.param("batch", marks=pytest.mark.slow),
])
def test_emit_supertile_matches_overlap_mask(case):
    # local generator: keep the shared session rng stream unchanged for
    # the scene-sensitive tests downstream
    rng = np.random.RandomState(1234)
    """The emission-sorted coarse stage must reproduce the dense
    ``overlap_mask`` membership exactly: same per-supertile candidate sets
    (ascending index), same per-sub-bin bits, exact counts and overflow."""
    B = 2 if case == "batch" else 1
    H, W, P, thr, bin_size = 33, 47, 60, 0.01, 10
    mus, isig = _scene(rng, P=P, seed_spread=0.8)
    # x100: keep pixel footprints below the 3-supertile window so the
    # plain/batch cases exercise the pure local-emission path
    isig = isig * 100.0
    if case == "big":
        # one Gaussian with a huge pixel footprint -> oversize/global path
        isig = isig.at[7].set(jnp.eye(3) * 5e-4)
    R, T, focal, principal = _camera(B)
    _, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = jnp.broadcast_to(mus[None], (B, P, 3)) - origins[:, None, :]
    isig_b = jnp.broadcast_to(isig[None], (B, P, 3, 3))

    mask = np.asarray(coarse.overlap_mask(
        R, T, focal, principal, mus_cam, isig_b, (H, W), thr, bin_size
    ))                                                       # (B, BH, BW, P)
    BH, BW = (H - 1) // bin_size + 1, (W - 1) // bin_size + 1
    BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
    M_max = 64
    pos_c, bits_c, ids_c, counts_c, overflow_c = jax.tree.map(
        np.asarray,
        coarse.emit_supertile_candidates(
            R, T, focal, principal, mus_cam, isig_b, (H, W), thr,
            bin_size, M_max,
        ),
    )
    assert pos_c.shape == (B * BH2 * BW2, M_max)
    for bimg in range(B):
        for sy in range(BH2):
            for sx in range(BW2):
                s = (bimg * BH2 + sy) * BW2 + sx
                want_bits = {}
                for p in range(P):
                    bits = 0
                    for i in range(2):
                        for j in range(2):
                            by, bx = 2 * sy + i, 2 * sx + j
                            if by < BH and bx < BW and mask[bimg, by, bx, p]:
                                bits |= 1 << (2 * i + j)
                    if bits:
                        want_bits[p] = bits
                want = sorted(want_bits)
                n = int(counts_c[s])
                # exact membership: rows ARE the overlap-mask member set in
                # ascending index order (reference insertion order), exact
                # bits, no inert entries (globals sort in like locals)
                got = [int(p) for p in pos_c[s, :n]]
                assert got == want, (s, got, want)
                for t in range(n):
                    p = got[t]
                    assert int(bits_c[s, t, 0]) == want_bits[p], (s, p)
                    assert int(ids_c[s, t, 0]) == bimg * P + p
                assert int(overflow_c[s]) == 0
    # padding rows are inert
    assert (bits_c[np.arange(M_max)[None, :] >= counts_c[:, None]] == 0).all()


def test_emit_supertile_overflow_counts():
    rng = np.random.RandomState(4321)
    """Members beyond M_max are dropped deterministically and counted."""
    H, W, P, thr, bin_size = 33, 47, 60, 0.01, 10
    mus, isig = _scene(rng, P=P, seed_spread=0.1)  # clustered -> dense bins
    R, T, focal, principal = _camera(1)
    _, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus[None] - origins[:, None, :]
    isig_b = isig[None]
    full = jax.tree.map(np.asarray, coarse.emit_supertile_candidates(
        R, T, focal, principal, mus_cam, isig_b, (H, W), thr, bin_size, 64
    ))
    capped = jax.tree.map(np.asarray, coarse.emit_supertile_candidates(
        R, T, focal, principal, mus_cam, isig_b, (H, W), thr, bin_size, 8
    ))
    n_full, n_cap = full[3], capped[3]
    assert (n_cap <= 8).all()
    np.testing.assert_array_equal(
        capped[4], np.maximum(n_full + full[4] - 8, 0)
    )
    # kept entries are the lowest-index prefix of the full rows
    for s in range(n_cap.shape[0]):
        np.testing.assert_array_equal(
            capped[0][s, : n_cap[s]], full[0][s, : n_cap[s]]
        )


@pytest.mark.slow
def test_fine_coarse_mostly_matches_no_coarse(rng):
    """The binned path equals the no-coarse path wherever the bbox culling
    (a reference-faithful *approximation*) retained every selected kernel;
    that must be the overwhelming majority of pixels."""
    B, H, W, P, K, thr = 2, 33, 47, 40, 8, 0.01
    mus, isig = _scene(rng, P=P, seed_spread=0.8)
    R, T, focal, principal = _camera(B)
    rays, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus[None] - origins[:, None, :]
    isig_b = jnp.broadcast_to(isig[None], (B, P, 3, 3))

    out_nc = fine.ray_tracing(
        (R, T, focal, principal), mus_cam, isig_b, rays,
        (H, W), thr=thr, n_assign=K, max_points_per_bin=-1,
    )
    bin_size = 10
    out_c = fine.ray_tracing(
        (R, T, focal, principal), mus_cam, isig_b, rays,
        (H, W), thr=thr, n_assign=K, bin_size=bin_size, max_points_per_bin=P,
    )
    bins = np.asarray(
        coarse.rasterize_coarse(
            R, T, focal, principal, mus_cam, isig_b, (H, W), thr, bin_size, P
        )
    )
    idx_nc = np.asarray(out_nc[0])
    idx_c = np.asarray(out_c[0])
    n_match = 0
    n_px = 0
    for b in range(B):
        for i in range(H):
            for j in range(W):
                blist = set(
                    int(v) for v in bins[b, i // bin_size, j // bin_size] if v >= 0
                )
                sel = set(int(v) for v in idx_nc[b, i, j] if v >= 0)
                n_px += 1
                if sel <= blist:
                    # culling kept everything -> selection must be identical
                    np.testing.assert_array_equal(
                        idx_c[b, i, j], idx_nc[b, i, j], err_msg=str((b, i, j))
                    )
                    n_match += 1
    assert n_match / n_px > 0.9, f"only {n_match}/{n_px} culling-safe pixels"


def _dense_pipeline_loss(mus, isig, rays, thr, K):
    """Differentiable loss through the *autodiffed* dense selection path."""
    hl, ha, hd = dense.hit_values(mus, isig, rays)
    idx, sl, sa, sd = dense._nearest_k_impl(hl, ha, hd, -math.log(thr + 1e-10), K)
    w = jnp.where(idx >= 0, sl * 0.3 + sa * 0.5 + sd * 0.2, 0.0)
    return jnp.sum(jnp.sin(w))


def _fine_pipeline_loss(mus, isig, rays4, bin_points, thr, K):
    idx, sl, sa, sd = fine.ray_tracing_fine(
        mus, isig, rays4, bin_points, thr, (rays4.shape[1], rays4.shape[2]), K
    )
    w = jnp.where(idx >= 0, sl * 0.3 + sa * 0.5 + sd * 0.2, 0.0)
    return jnp.sum(jnp.sin(w))


@pytest.mark.slow
def test_custom_vjp_matches_autodiff_of_dense(rng):
    """The analytic backward of the fine op must equal jax.grad through the
    dense jnp formulation (the key gradient-correctness test)."""
    H, W, P, K, thr = 6, 7, 16, 4, 0.01
    mus, isig = _scene(rng, P=P)
    R, T, focal, principal = _camera(1)
    rays, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus - origins[0]

    # all-points bin
    bin_points = (
        jnp.arange(P, dtype=jnp.int32)[None, None, None, :]
    )

    g_fine = jax.grad(_fine_pipeline_loss, argnums=(0, 1, 2))(
        mus_cam, isig, rays, bin_points, thr, K
    )
    g_dense = jax.grad(
        lambda m, s, r: _dense_pipeline_loss(m, s, r.reshape(-1, 3), thr, K),
        argnums=(0, 1, 2),
    )(mus_cam, isig, rays)

    for a, b, name in zip(g_fine, g_dense, ("mus", "isig", "rays")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_convert_to_box_matches_reference(ref, rng):
    import torch

    B, N = 2, 9
    a = rng.uniform(-1, 1, size=(B, N, 3, 3)).astype(np.float32)
    isig = np.einsum("bpij,bpkj->bpik", a, a) + 2.0 * np.eye(3, dtype=np.float32)
    z = rng.uniform(0.1, 2.0, size=(B, N)).astype(np.float32)
    mat = rng.uniform(-2, 2, size=(B, 4, 4)).astype(np.float32)
    thr = 0.01

    # reference convert_to_box lives in RayTracing.py which imports _C; the
    # formula is small enough to inline here as the torch oracle:
    t_isig = torch.from_numpy(isig)
    t_mat = torch.from_numpy(mat)
    get = -np.log(thr) * t_mat[:, None, :2, :2] @ torch.inverse(
        t_isig[:, :, :2, :2]
    ) @ t_mat[:, None, :2, :2]
    boxes_ref = (
        torch.ones((B, N, 1, 2)) @ get
    ).pow(0.5).squeeze(2) * torch.from_numpy(z).unsqueeze(-1)

    boxes_jax = coarse.convert_to_box(
        jnp.asarray(isig), thr, jnp.asarray(z), jnp.asarray(mat)
    )
    np.testing.assert_allclose(
        np.asarray(boxes_jax), boxes_ref.numpy(), rtol=1e-4, atol=1e-5, equal_nan=True
    )


def test_no_coarse_binned_mask_equals_single_bin(rng):
    """The no-coarse math is independent of bin geometry: an all-ones
    membership mask over the standard bin grid must reproduce the
    single-whole-image-bin selection exactly (incl. ragged bottom/right
    bins).  This is the property the TPU no-coarse dispatch relies on
    (fine.ray_tracing routes -1 through the bin grid to keep the Pallas
    kernels at their proven block shapes)."""
    B, H, W, P, K, thr = 2, 20, 28, 40, 7, 0.01
    mus, isig = _scene(rng, P=P)
    R, T, focal, principal = _camera(B)
    rays, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_b = jnp.stack([mus - origins[b] for b in range(B)])
    isig_b = jnp.broadcast_to(isig[None], (B, P, 3, 3))
    thr_act = -math.log(thr + 1e-10)
    base_ids = (
        jnp.arange(P, dtype=jnp.int32)[None, :]
        + (jnp.arange(B, dtype=jnp.int32) * P)[:, None]
    )

    single = fine._ray_trace_fine_mask(
        mus_b, isig_b, rays, jnp.ones((B, 1, 1, P), jnp.int8), base_ids,
        thr_act, (H, W), K,
    )
    bs = 8  # 3x4 bin grid with ragged 4-row / 4-col edge bins
    BH, BW = (H - 1) // bs + 1, (W - 1) // bs + 1
    binned = fine._ray_trace_fine_mask(
        mus_b, isig_b, rays, jnp.ones((B, BH, BW, P), jnp.int8), base_ids,
        thr_act, (bs, bs), K,
    )
    for a, b in zip(single, binned):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_max_kern_k_env_override(rng, monkeypatch):
    """VOGE_TPU_MAX_KERN_K moves the Pallas-vs-dense dispatch boundary at
    trace time (no re-import needed), and the selection is correct on both
    sides of it (documented in Documentation.md)."""
    monkeypatch.delenv("VOGE_TPU_MAX_KERN_K", raising=False)
    assert fine._max_kern_k() == fine._DEFAULT_MAX_KERN_K
    boundary = fine._DEFAULT_MAX_KERN_K
    assert fine._kern_k_ok(boundary) and not fine._kern_k_ok(boundary + 1)
    monkeypatch.setenv("VOGE_TPU_MAX_KERN_K", "102")
    assert fine._kern_k_ok(102) and not fine._kern_k_ok(103)
    # lower the boundary below this scene's K: every kernel boundary now
    # dispatches the dense XLA formulation; results must be unchanged
    B, H, W, P, thr, K = 1, 10, 12, 25, 1e-3, 9
    mus, isig = _scene(rng, P=P)
    R, T, focal, principal = _camera(B)
    rays, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus - origins[0]
    args = ((R, T, focal, principal), mus_cam[None], isig[None], rays,
            (H, W))
    sel_hi = fine.ray_tracing(*args, thr=thr, n_assign=K)
    monkeypatch.setenv("VOGE_TPU_MAX_KERN_K", "8")
    assert not fine._kern_k_ok(K)
    sel_lo = fine.ray_tracing(*args, thr=thr, n_assign=K)
    for a, b in zip(sel_hi, sel_lo):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_select_all_k_equals_p(rng):
    """n_assign >= P (EfficientCuboidViaOptimization's max_assign=all,
    reference demo :78): every passing candidate is selected, ordered by
    hit length; parity against the dense oracle.  On TPU this K routes to
    the dense XLA dispatch (fine._kern_k_ok)."""
    B, H, W, P, thr = 1, 10, 12, 25, 1e-8
    K = P  # select everything
    assert not fine._kern_k_ok(fine._max_kern_k() + 1)
    assert fine._kern_k_ok(fine._max_kern_k())
    mus, isig = _scene(rng, P=P)
    R, T, focal, principal = _camera(B)
    rays, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus - origins[0]
    sel = fine.ray_tracing(
        (R, T, focal, principal), mus_cam[None], isig[None], rays,
        (H, W), thr=thr, n_assign=K, max_points_per_bin=-1,
    )
    hl, ha, hd = dense.ray_trace_voge_ray(mus_cam, isig, rays.reshape(-1, 3))
    idx2, sl2, _, _ = dense._nearest_k_impl(
        hl, ha, hd, -math.log(thr + 1e-10), K
    )
    np.testing.assert_array_equal(
        np.asarray(sel[0]).reshape(-1, K), np.asarray(idx2)
    )
    np.testing.assert_allclose(
        np.asarray(sel[1]).reshape(-1, K), np.asarray(sl2), rtol=1e-5,
        atol=1e-5
    )


@pytest.mark.parametrize("case", ["plain", "big", "capped"])
def test_emit_supertile_dst_mapping(case):
    """``return_dst=True``: the inverse emission mapping must be an exact
    bijection onto the occupied compacted slots — gathering gradient rows
    through it equals the segment_sum scatter-back (the fine backward's
    round-3 fast path, ops/pallas_bwd._gather_back)."""
    from voge_tpu.ops.pallas_bwd import _gather_back

    rng = np.random.RandomState(99)
    B = 1
    H, W, P, thr, bin_size = 33, 47, 60, 0.01, 10
    mus, isig = _scene(rng, P=P, seed_spread=0.8)
    isig = isig * 100.0
    if case == "big":
        isig = isig.at[7].set(jnp.eye(3) * 5e-4)  # global member
    M_max = 8 if case == "capped" else 64
    R, T, focal, principal = _camera(B)
    _, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus[None] - origins[:, None, :]
    isig_b = isig[None]
    pos_c, bits_c, ids_c, counts_c, overflow_c, dst = jax.tree.map(
        np.asarray,
        coarse.emit_supertile_candidates(
            R, T, focal, principal, mus_cam, isig_b, (H, W), thr,
            bin_size, M_max, return_dst=True,
        ),
    )
    dst_l, dst_g, gpos, g_valid = dst
    nb = pos_c.shape[0]

    # 1. every valid local destination slot holds exactly that Gaussian
    seen = set()
    for p in range(P):
        for w in range(dst_l.shape[2]):
            d = int(dst_l[0, p, w])
            if d < 0:
                continue
            row, rank = d // M_max, d % M_max
            assert rank < int(counts_c[row])
            assert int(pos_c[row, rank]) == p, (p, w, row, rank)
            assert d not in seen
            seen.add(d)
    for gi in range(dst_g.shape[1]):
        for s in range(dst_g.shape[2]):
            d = int(dst_g[0, gi, s])
            if d < 0:
                continue
            assert bool(g_valid[0, gi])
            row, rank = d // M_max, d % M_max
            assert int(pos_c[row, rank]) == int(gpos[0, gi])
            assert d not in seen
            seen.add(d)
    # 2. ...and they cover every occupied slot exactly once (bijection)
    want = {int(r) * M_max + t for r in range(nb)
            for t in range(int(counts_c[r]))}
    assert seen == want

    # 3. gather-back == segment_sum scatter-back on random gradient rows
    FEAT = 16
    rows = jnp.asarray(
        rng.normal(size=(nb * M_max, FEAT)).astype(np.float32)
    )
    # zero the inert padding slots like the kernel's masked output
    iota = np.arange(M_max)[None, :]
    valid_t = (iota < counts_c[:, None]).reshape(-1)
    rows = rows * jnp.asarray(valid_t[:, None].astype(np.float32))
    P_pad = 64
    gg_gather = _gather_back(
        rows, jax.tree.map(jnp.asarray, dst), B, P_pad, nb * M_max
    )
    img = np.arange(nb, dtype=np.int32)[:, None] // nb
    flat = np.where(valid_t.reshape(nb, M_max),
                    img * P_pad + pos_c, B * P_pad).reshape(-1)
    summed = jax.ops.segment_sum(rows, jnp.asarray(flat),
                                 num_segments=B * P_pad + 1)
    gg_scatter = np.asarray(summed[: B * P_pad]).reshape(B, P_pad, FEAT)
    np.testing.assert_allclose(np.asarray(gg_gather), gg_scatter,
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("case", ["plain", "big"])
def test_emit_kernel_matches_xla_emission(case):
    """The fused Pallas emission kernel (ops/pallas_coarse.py, interpret
    mode) produces byte-identical compacted candidate outputs to the XLA
    emission formulation — windows, bits, keys, counts, overflow, and the
    inverse dst mapping."""
    rng = np.random.RandomState(77)
    B = 1
    H, W, P, thr, bin_size = 33, 47, 60, 0.01, 10
    mus, isig = _scene(rng, P=P, seed_spread=0.8)
    isig = isig * 100.0
    if case == "big":
        isig = isig.at[7].set(jnp.eye(3) * 5e-4)  # oversize/global member
    R, T, focal, principal = _camera(B)
    _, origins = camera_rays(R, T, focal, principal, (H, W))
    mus_cam = mus[None] - origins[:, None, :]
    isig_b = isig[None]
    outs = {}
    for force in ("xla", "kernel"):
        outs[force] = jax.tree.map(
            np.asarray,
            coarse.emit_supertile_candidates(
                R, T, focal, principal, mus_cam, isig_b, (H, W), thr,
                bin_size, 64, return_dst=True, _force=force,
            ),
        )
    names = ["pos_c", "bits_c", "ids_c", "counts_c", "overflow_c", "dst"]
    for nm, a, b in zip(names, outs["xla"], outs["kernel"]):
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(a)[0]) if nm != "dst" else a[0],
            np.asarray(jax.tree.leaves(b)[0]) if nm != "dst" else b[0],
            err_msg=nm,
        )
    for i in range(4):  # dst tuple elementwise
        np.testing.assert_array_equal(outs["xla"][5][i], outs["kernel"][5][i])
