"""Coarse stage: cull Gaussians to image bins (tiles).

TPU-native, fully vectorized and deterministic replacement for the CUDA
binning rasterizer (reference ``rasterize_coarse.cu`` + the camera math in
``RayTracing.py:33-73``).  Differences by design:

  - works directly in continuous pixel coordinates (the reference's negated
    NDC convention is an affine rescale of these; the overlap tests are
    equivalent term by term — verified exactly in
    ``tests/test_ops.py::test_coarse_bins_match_reference_ndc_oracle``);
  - all math is *component planes* over (B, P) arrays — no batched 3x3
    matmuls, no (..., 3, 3) hot arrays (those compile catastrophically on
    TPU);
  - per-bin candidate lists are built with a cumsum + capped scatter instead
    of shared-memory atomics, so the output is deterministic and ordered by
    Gaussian index (the CUDA version's intra-bin order is nondeterministic);
  - overflow (more than ``max_points_per_bin`` candidates in a bin) is
    *reported* via a returned per-bin count instead of a device printf with
    silent truncation (``rasterize_coarse.cu:154-170``); truncation keeps
    the lowest-index candidates;
  - no 66-bins-per-axis limit (``rasterization_utils.cuh:51`` is a CUDA
    shared-memory constraint that does not apply here).

The ellipse bounding-box radius reproduces ``RayTracing.py:33-39``
(``convert_to_box``): in pixel units,

    r_j = sqrt(-log(thr) * sum_i f_i f_j inv2[i, j]) / z_view,  j in {x, y}

with ``inv2`` the inverse of the top-left 2x2 block of the camera-rotated
Lambda (Lambda_cam = R^T Lambda R) and f the focal lengths.  Gaussians
behind the camera (z_view < 0) are skipped (``rasterize_coarse.cu:35``).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


def coarse_bin_config(image_size, n_assign: int, n_points: int,
                      bin_size: Optional[int] = None,
                      max_points_per_bin: Optional[int] = None):
    """The reference's auto-config heuristics (``RayTracing.py:14-19``)."""
    if bin_size is None:
        max_image_size = max(image_size)
        bin_size = max(int(2 ** math.ceil(math.log2(max_image_size) - 5)), 10)
    if max_points_per_bin is None:
        max_points_per_bin = min(
            int(max(n_assign * 10, n_points / 10)), n_points
        )
    return int(bin_size), int(max_points_per_bin)


def _camera_planes(R, T, focal, principal, points):
    """Per-Gaussian view-space / screen-space planes.

    :param points: (B, P, 3) camera-centered world points (verts - C)
    :return: (u, v, z_view) each (B, P); and the world points' view coords
        are u = fx x/z + px etc.  All math elementwise over (B, P).
    """
    # camera center (row convention): C @ R + T = 0 -> C = -T @ inv(R).
    # For points expressed camera-centered (x_w - C), the view transform is
    #   x_v = (x_w - C + C) @ R + T = x_cc @ R + (C @ R + T) = x_cc @ R.
    p = [points[..., d] for d in range(3)]                    # (B, P) planes
    view = [
        sum(p[j] * R[:, j, d][:, None] for j in range(3)) for d in range(3)
    ]
    z = view[2]
    # mirrored screen convention: u = px - fx x_v/z (see voge_tpu/rays.py)
    u = principal[:, 0:1] - view[0] * focal[:, 0:1] / z
    v = principal[:, 1:2] - view[1] * focal[:, 1:2] / z
    return u, v, z


def _pixel_radii_planes(R, focal, isigmas, thr: float, z):
    """Pixel-space half-extents (rx, ry) of the thr-level ellipse bbox,
    reference ``convert_to_box`` math in planes form.

    Lc[a][b] = sum_ij R[i,a] L[i,j] R[j,b] for a,b in {0,1} (camera-rotated
    Lambda, top-left 2x2 block); inv2 = closed-form 2x2 inverse;
    r_j = sqrt(-log(thr) * colsum_j(F inv2 F)) / z.
    """
    L = [[isigmas[..., i, j] for j in range(3)] for i in range(3)]  # (B,P)
    Rc = [[R[:, i, a][:, None] for a in range(3)] for i in range(3)]
    Lc = [[None, None], [None, None]]
    for a in range(2):
        for b in range(2):
            acc = 0.0
            for i in range(3):
                for j in range(3):
                    acc = acc + Rc[i][a] * L[i][j] * Rc[j][b]
            Lc[a][b] = acc
    det = Lc[0][0] * Lc[1][1] - Lc[0][1] * Lc[1][0]
    inv00 = Lc[1][1] / det
    inv01 = -Lc[0][1] / det
    inv10 = -Lc[1][0] / det
    inv11 = Lc[0][0] / det
    fx = focal[:, 0:1]
    fy = focal[:, 1:2]
    nlt = -math.log(thr)
    col_x = fx * fx * inv00 + fy * fx * inv10
    col_y = fx * fy * inv01 + fy * fy * inv11
    rx = jnp.sqrt(nlt * col_x) / z
    ry = jnp.sqrt(nlt * col_y) / z
    return rx, ry


def overlap_mask(
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    points: jax.Array, isigmas: jax.Array, image_size: Tuple[int, int],
    thr: float, bin_size: int,
):
    """Per-(bin, Gaussian) overlap mask (B, BH, BW, P) plus z-cull."""
    B, P = points.shape[0], points.shape[1]
    H, W = int(image_size[0]), int(image_size[1])
    BH = (H - 1) // bin_size + 1
    BW = (W - 1) // bin_size + 1

    u, v, z = _camera_planes(R, T, focal, principal, points)
    rx, ry = _pixel_radii_planes(R, focal, isigmas, thr, z)
    keep = ~(z < 0)

    bx = jnp.arange(BW, dtype=points.dtype)[None, :, None] * bin_size
    by = jnp.arange(BH, dtype=points.dtype)[None, :, None] * bin_size
    # (B, BW, P) and (B, BH, P): P stays on lanes
    xo = ((u - rx)[:, None, :] <= bx + bin_size) & (bx < (u + rx)[:, None, :])
    yo = ((v - ry)[:, None, :] <= by + bin_size) & (by < (v + ry)[:, None, :])
    overlap = (
        yo[:, :, None, :] & xo[:, None, :, :] & keep[:, None, None, :]
    )  # (B, BH, BW, P)
    return overlap


def compact_mask(mask: jax.Array, M: int, base_offset: Optional[jax.Array] = None):
    """Rows of set-bit indices, ascending, -1-padded, capped at M.

    :param mask: (nb, P) bool
    :param base_offset: optional (nb,) added to emitted indices
    :return: (bin_points (nb, M) int32, counts (nb,) int32)
    """
    nb, P = mask.shape
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    counts = pos[:, -1] + 1
    row = jnp.broadcast_to(jnp.arange(nb)[:, None], (nb, P))
    flat_idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :], (nb, P))
    if base_offset is not None:
        flat_idx = flat_idx + base_offset[:, None].astype(jnp.int32)
    pos_write = jnp.where(mask, pos, M)  # out-of-range -> dropped
    bin_points = jnp.full((nb, M), -1, dtype=jnp.int32)
    bin_points = bin_points.at[row, pos_write].set(flat_idx, mode="drop")
    return bin_points, counts


def rasterize_coarse(
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    points: jax.Array, isigmas: jax.Array, image_size: Tuple[int, int],
    thr: float, bin_size: int, max_points_per_bin: int,
    return_counts: bool = False,
):
    """Build per-bin candidate index lists.

    :param R, T, focal, principal: camera params, (B,3,3)/(B,3)/(B,2)/(B,2)
    :param points: (B, P, 3) *camera-centered* world points (verts - C), as
        passed by the renderer (reference ``Renderer.py:130``)
    :param isigmas: (B, P, 3, 3)
    :return: bin_points (B, BH, BW, M) int32 of *flattened* indices
        (b * P + p), -1-padded — same convention as the reference
        (``RayTracing.py:60-72``).  With ``return_counts=True`` also returns
        the exact per-bin candidate counts (B, BH, BW) int32 so callers can
        detect overflow (count > M).
    """
    B, P = points.shape[0], points.shape[1]
    H, W = int(image_size[0]), int(image_size[1])
    BH = (H - 1) // bin_size + 1
    BW = (W - 1) // bin_size + 1
    M = int(max_points_per_bin)

    overlap = overlap_mask(
        R, T, focal, principal, points, isigmas, (H, W), thr, bin_size
    )
    mask = overlap.reshape(B * BH * BW, P)
    base = (
        jnp.repeat(jnp.arange(B, dtype=jnp.int32), BH * BW) * P
    )
    bin_points, counts = compact_mask(mask, M, base_offset=base)
    bin_points = bin_points.reshape(B, BH, BW, M)
    if return_counts:
        return bin_points, counts.reshape(B, BH, BW)
    return bin_points


def emit_supertile_candidates(
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    points: jax.Array, isigmas: jax.Array, image_size: Tuple[int, int],
    thr: float, bin_size: int, M_max: int, n_globals: int = 64,
    return_dst: bool = False, _force: Optional[str] = None,
):
    """Per-supertile compacted candidate lists via duplicate-key emission.

    The TPU-native analog of the CUDA coarse binner's per-Gaussian bbox walk
    (``rasterize_coarse.cu:111-185``): instead of materializing the dense
    (bins, P) overlap mask and argsort-compacting it (O(bins*P) work — the
    round-1 design), every Gaussian *emits* up to win^2 (supertile, index,
    bits) keys for the win x win supertile window covering its pixel-space
    bbox; one flat sort of the ~win^2*P keys groups them by supertile, and
    fixed-capacity rows are sliced out of the sorted stream.  The window
    covers exactly — the lowest overlapped BIN starts above ``lo - b``
    (overlap test ``lo <= bin_start + b``), so supertiles
    [floor((lo-b)/2b), floor(hi/2b)] hold every overlap; ``win`` is a
    static function of scene size (2 for dense scenes whose footprints
    stay under a supertile, 3 for sparse large-kernel scenes — see the
    ``win`` comment in the body).  Footprints beyond the window route to
    the global path.  The per-2x2-sub-bin
    membership bits are computed AT EMISSION (the same float comparisons
    ``overlap_mask`` uses) and ride in the key's low 4 bits — the sliced
    rows decode position and bits arithmetically, with no per-element
    gathers (gathering u/v/rx/ry back by ``pos_c`` cost ~3 ms at 10K; TPU
    element gathers are slow).  Candidate sets are identical to the mask
    path (``tests/test_ops.py::test_emit_supertile_matches_overlap_mask``).

    Gaussians whose bbox spans more than the 2-supertile window (rare: a
    pixel radius approaching a supertile, or z ~ 0 blowing the projected
    radius up to the whole screen) are *global*: the first ``n_globals``
    of them (ascending index) emit one key per overlapped supertile, so
    they sort into the rows like any local member (exact bits, exact
    insertion order).  Globals beyond the cap are dropped and counted.

    Ordering within a supertile is ascending Gaussian index — the
    reference's insertion order for its fine-stage tie-break
    (``RayTracing.py:22-26`` builds candidate lists in index order; the CUDA
    atomics only randomize it).

    :param points: (B, P, 3) camera-centered means; :param isigmas: (B, P, 3, 3)
    :param M_max: static per-supertile row capacity (multiple of the select
        kernel's cand_chunk)
    :return: (pos_c (nb, M_max) int32 per-image candidate positions,
        bits_c (nb, M_max, 1) int32 sub-bin membership bitfields,
        ids_c (nb, M_max, 1) int32 global flattened original ids (-1 pad),
        counts_c (nb,) int32 row occupancy,
        overflow_c (nb,) int32 members dropped beyond capacity)
        with nb = B * BH2 * BW2 supertile rows (2x2-bin supertiles).

    With ``return_dst`` a sixth element carries the INVERSE mapping —
    per-emission destination slots in the compacted rows:
        (dst_l (B, P, win^2) int32 = row * M_max + rank, -1 when not emitted /
         truncated;  dst_g (B, n_globals, nst) likewise for the global
         members;  gpos (B, n_globals) their Gaussian indices;
         g_valid (B, n_globals) bool).
    It turns the backward scatter-back (segment_sum over nb*M_max rows,
    ~1 ms at the 10K benchmark) into a 9-wide row GATHER per Gaussian
    (~0.2 ms): every Gaussian knows exactly which compacted slots hold its
    contributions.  Costs one extra argsort at emission (the permutation
    inverse of the sort, finding 3 in DESIGN_NOTES: invert with argsort,
    never scatter).
    """
    B, P = points.shape[0], points.shape[1]
    H, W = int(image_size[0]), int(image_size[1])
    b = int(bin_size)
    fb = float(b)
    BH = (H - 1) // b + 1
    BW = (W - 1) // b + 1
    BH2, BW2 = (BH + 1) // 2, (BW + 1) // 2
    nst = BH2 * BW2
    nb = B * nst
    st = 2.0 * b

    points = jax.lax.stop_gradient(points)
    isigmas = jax.lax.stop_gradient(isigmas)

    # key = ((img*nst + supertile) * S + index) * 16 + bits; invalid -> big.
    # Sorting groups by supertile with ascending index (bits are a no-op
    # tie-break: each (supertile, index) pair occurs at most once).
    S = 1 << max(int(P - 1).bit_length(), 1)                  # per-image idx range
    big = nb * S * 16                                         # > any valid key
    kdt = jnp.int32 if big < 2**31 - 1 else jnp.int64

    kv_kern = None
    # see ``win`` below.  When the caller picked bins SMALLER than the
    # reference heuristic (the big-K bin-8 geometry), the same absolute
    # footprints span more supertiles: grow the window to cover at least
    # the envelope the reference-heuristic geometry (win 2 at ref_b) would
    # — r_cov = 1.5*ref_b, win*st - b >= 2*r_cov (round-5: occlusion at
    # bin 8 with win 2 dropped 2.3M memberships through the capped global
    # path; the envelope rule gives win 4 there, win 7 for the 672-wide
    # texture config, overflow back to 0)
    win_k = 3 if P <= 4096 else 2
    ref_b = max(int(2 ** math.ceil(math.log2(max(H, W)) - 5)), 10)
    if b < ref_b:
        win_k = max(win_k, min(8, int(math.ceil((3 * ref_b + b) / st))))
    use_kernel = (
        jax.default_backend() == "tpu" if _force is None
        else _force == "kernel"
    )
    if use_kernel and kdt == jnp.int32:
        # fused Pallas emission: the ~80-op elementwise window/bits chain
        # in one kernel (voge_tpu/ops/pallas_coarse.py); the oversize
        # (global) path below stays in XLA on the returned planes
        from voge_tpu.ops.pallas_coarse import emit_keys_pallas

        kv_kern, u, v, rx, ry, oversize = emit_keys_pallas(
            R, T, focal, principal, points, isigmas, thr, b, (H, W),
            nst, BH2, BW2, S, win=win_k,
            interpret=jax.default_backend() != "tpu",
        )
        keep = jnp.ones_like(oversize)  # oversize already gated by keep
    else:
        u, v, z = _camera_planes(R, T, focal, principal, points)
        rx, ry = _pixel_radii_planes(R, focal, isigmas, thr, z)
        keep = ~(z < 0)

    # tight integer supertile window [f0, f0 + win) per axis: the lowest
    # overlapped bin satisfies bin_start > (c - r) - b (overlap test
    # ``lo <= bin_start + b``), so f0 = floor((c - r - b)/st) covers it;
    # the highest overlapped bin has bin_start < (c + r), so
    # f1 = floor((c + r)/st) covers it.  span > win supertiles -> global.
    #
    # ``win`` is a STATIC function of the scene size: dense scenes carry
    # small per-Gaussian footprints (a 2x2 window covers radii up to a
    # supertile and halves the sort/inverse-mapping cost vs 3x3 — the
    # round-4 change that cut the 10K step ~0.8 ms), while sparse scenes
    # (the quickstart-style few-hundred-Gaussian configs) have footprints
    # of several supertiles and need the 3x3 window (their 9P sort is tiny
    # anyway).  Footprints beyond the window go to the exact-but-capped
    # global path with the dropped count surfaced via overflow_points.
    win = win_k

    def _window(c, r):
        lo = (c - r - fb) / st
        hi = (c + r) / st
        fin = jnp.isfinite(lo) & jnp.isfinite(hi)
        f0 = jnp.where(fin, jnp.floor(jnp.where(fin, lo, 0.0)), 0.0)
        f1 = jnp.where(fin, jnp.floor(jnp.where(fin, hi, 0.0)), -2.0)
        f0 = jnp.clip(f0, -2.0**30, 2.0**30).astype(jnp.int32)
        w = jnp.clip(f1, -2.0**30, 2.0**30).astype(jnp.int32) - f0 + 1
        return f0, w, fin

    if kv_kern is None:
        fx0, wx, finx = _window(u, rx)
        fy0, wy, finy = _window(v, ry)
        oversize = keep & ((~finx) | (~finy) | (wx > win) | (wy > win))

    def _bits(uu, vv, rxx, ryy, sxf, syf):
        """Exact 2x2 sub-bin membership bits for supertile pixel origin
        (sxf, syf): bit 2i+j for y sub-bin i, x sub-bin j — the identical
        comparisons as ``overlap_mask`` restricted to in-grid bins."""
        lo_u, hi_u = uu - rxx, uu + rxx
        lo_v, hi_v = vv - ryy, vv + ryy
        bits = None
        for i in range(2):
            byi = syf + i * fb
            yo_i = (lo_v <= byi + fb) & (byi < hi_v) & (byi < H)
            for j in range(2):
                bxj = sxf + j * fb
                xo_j = (lo_u <= bxj + fb) & (bxj < hi_u) & (bxj < W)
                t = (yo_i & xo_j).astype(jnp.int32) << (2 * i + j)
                bits = t if bits is None else bits | t
        return bits

    EMIT = win * win
    if kv_kern is None:
        dx = jnp.arange(EMIT, dtype=jnp.int32) % win          # (EMIT,)
        dy = jnp.arange(EMIT, dtype=jnp.int32) // win
        sx = fx0[..., None] + dx                              # (B, P, 4)
        sy = fy0[..., None] + dy
        sxf = sx.astype(points.dtype) * st
        syf = sy.astype(points.dtype) * st
        bits_l = _bits(u[..., None], v[..., None], rx[..., None],
                       ry[..., None], sxf, syf)               # (B, P, 4)
        valid = (
            keep[..., None] & (~oversize)[..., None]
            & (sx >= 0) & (sx < BW2) & (sy >= 0) & (sy < BH2)
            & (bits_l != 0)
        )

    # Global (oversize) members: first n_globals ascending-index; each emits
    # one key per supertile it actually overlaps (exact bits gate).
    n_globals = min(int(n_globals), P)
    is_g = keep & oversize
    idx_i32 = jnp.arange(P, dtype=jnp.int32)[None, :]
    g_take = jnp.minimum(
        -jax.lax.top_k(-jnp.where(is_g, idx_i32, P), n_globals)[0], P
    )                                                          # (B, n_globals)
    g_valid = g_take < P
    gpos = jnp.where(g_valid, g_take, 0)
    ga = lambda p: jnp.take_along_axis(p, gpos, axis=1)[..., None]
    sx_all = (jnp.arange(nst, dtype=jnp.int32) % BW2)          # (nst,)
    sy_all = (jnp.arange(nst, dtype=jnp.int32) // BW2)
    bits_g = _bits(ga(u), ga(v), ga(rx), ga(ry),
                   sx_all.astype(points.dtype) * st,
                   sy_all.astype(points.dtype) * st)           # (B, ng, nst)
    valid_g = g_valid[..., None] & (bits_g != 0)
    g_full = is_g.sum(axis=1).astype(jnp.int32)                # (B,)
    g_over = jnp.maximum(g_full - n_globals, 0)

    img = jnp.arange(B, dtype=kdt)[:, None, None]
    if kv_kern is not None:
        kv = kv_kern
    else:
        s_gid = img * nst + (sy * BW2 + sx).astype(kdt)
        idx = jnp.arange(P, dtype=kdt)[None, :, None]
        kv = jnp.where(valid, (s_gid * S + idx) * 16 + bits_l.astype(kdt),
                       jnp.array(big, kdt))
    s_gid_g = img * nst + jnp.arange(nst, dtype=kdt)[None, None, :]
    kv_g = jnp.where(
        valid_g,
        (s_gid_g * S + gpos.astype(kdt)[..., None]) * 16 + bits_g.astype(kdt),
        jnp.array(big, kdt),
    )
    allk = jnp.concatenate([kv.reshape(-1), kv_g.reshape(-1)])
    if return_dst:
        # one PAIR sort carries the permutation along (iota rides the keys)
        iota_e = jnp.arange(allk.shape[0], dtype=jnp.int32)
        flat, order = jax.lax.sort((allk, iota_e), num_keys=1)
    else:
        flat = jnp.sort(allk)
    tot = flat.shape[0]
    edges = jnp.arange(nb + 1, dtype=kdt) * (S * 16)
    starts = jnp.searchsorted(flat, edges, side="left").astype(jnp.int32)
    counts_full = starts[1:] - starts[:-1]                    # (nb,)

    img_row = jnp.arange(nb, dtype=jnp.int32)[:, None] // nst  # (nb, 1)
    counts_c = jnp.minimum(counts_full, M_max)
    # g_over is a PER-IMAGE count (oversize Gaussians beyond the global
    # cap): add it to the image's first supertile row only, so summing
    # overflow_c counts each drop once (round-5 fix: it was added to every
    # row, inflating the reported total by nst)
    first_row = (jnp.arange(nb, dtype=jnp.int32) % nst) == 0
    overflow_c = counts_full - counts_c + jnp.where(
        first_row, g_over[img_row[:, 0]], 0
    )

    iota_t = jnp.arange(M_max, dtype=jnp.int32)[None]         # (1, M_max)
    # per-supertile rows are CONTIGUOUS ranges of the sorted keys, so a
    # vmapped dynamic_slice replaces the elementwise gather (XLA TPU row
    # gathers run ~6 ns/element; the slice form measured 8x faster at
    # M_max 3840 — round 5).  flat is padded by M_max sentinels so a
    # start near ``tot`` never shifts (dynamic_slice clamps starts, which
    # would misread valid rows).
    flat_pad = jnp.concatenate(
        [flat, jnp.full((M_max,), jnp.array(big, kdt))])
    rows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(flat_pad, (s,), (M_max,))
    )(starts[:-1])                                            # (nb, M_max)
    valid_t = iota_t < counts_c[:, None]
    pos_c = jnp.where(valid_t, ((rows // 16) % S).astype(jnp.int32), 0)
    bits_c = jnp.where(valid_t, (rows % 16).astype(jnp.int32), 0)
    ids_c = jnp.where(valid_t, img_row * P + pos_c, -1)
    out = (pos_c, bits_c[:, :, None], ids_c[:, :, None],
           counts_c.astype(jnp.int32), overflow_c.astype(jnp.int32))
    if not return_dst:
        return out

    # Inverse mapping, computed entirely on the SORTED side (no per-emission
    # lookups — element gathers are slow on TPU): each sorted slot's
    # supertile row is arithmetic on its key, its rank is a segmented iota
    # (cummax of run boundaries), and one scatter carries (row, rank) back
    # to emission order.  The scatter's indices (sort output) and updates
    # (arithmetic on keys) come from distinct producers — safe from the
    # TpuInstructionFusion crash of DESIGN_NOTES finding 3.
    iota_s = jnp.arange(tot, dtype=jnp.int32)
    run_id = (flat // (S * 16)).astype(jnp.int32)             # supertile row
    boundary = jnp.concatenate([
        jnp.ones((1,), bool), run_id[1:] != run_id[:-1]
    ])
    seg_start = jax.lax.cummax(jnp.where(boundary, iota_s, 0))
    rank_s = iota_s - seg_start
    dst_s = jnp.where((run_id < nb) & (rank_s < M_max),
                      run_id * M_max + rank_s, -1)
    dst_e = jnp.full((tot,), -1, jnp.int32).at[order].set(dst_s)
    n_loc = B * P * EMIT
    dst_l = dst_e[:n_loc].reshape(B, P, EMIT)
    if n_globals:
        dst_g = dst_e[n_loc:].reshape(B, n_globals, nst)
    else:
        dst_g = jnp.full((B, 0, nst), -1, jnp.int32)
        gpos = jnp.zeros((B, 0), jnp.int32)
        g_valid = jnp.zeros((B, 0), bool)
    return out + ((dst_l, dst_g, gpos, g_valid),)


def convert_to_box(isigmas: jax.Array, thr: float, z: jax.Array, matrix: jax.Array) -> jax.Array:
    """NDC-space box half-extents; literal port of ``RayTracing.py:33-39``
    for API parity / tests (planes math, no batched tiny matmuls).

    :param isigmas: (B, N, 3, 3) camera-rotated Lambda
    :param z: (B, N) multiplier (the renderer passes 1/z_view)
    :param matrix: (B, 4, 4) projection matrix (only [:2,:2] used)
    :return: (B, N, 2)
    """
    a = isigmas[..., 0, 0]
    b = isigmas[..., 0, 1]
    c = isigmas[..., 1, 0]
    d = isigmas[..., 1, 1]
    det = a * d - b * c
    inv = [[d / det, -b / det], [-c / det, a / det]]
    m = [[matrix[:, i, j][:, None] for j in range(2)] for i in range(2)]
    nlt = -math.log(thr)
    boxes = []
    for col in range(2):
        acc = 0.0
        for i in range(2):
            for k in range(2):
                for j in range(2):
                    acc = acc + m[i][k] * inv[k][j] * m[j][col]
        boxes.append(jnp.sqrt(nlt * acc) * z)
    return jnp.stack(boxes, axis=-1)
