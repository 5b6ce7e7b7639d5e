"""Literal full-chain torch oracle of the reference render pipeline.

This module transcribes the ENTIRE reference forward chain — ray sampling,
coarse binning, fine ray tracing, aggregation, compositing, feature
sampling — into plain torch (float64 by default), so the voge_tpu pipeline
can be gated end-to-end against one independent implementation at full
frames (<1e-4 max pixel / gradient error, BASELINE.md north star).

Sources transcribed (cited per function):
  - pytorch3d ``NDCMultinomialRaysampler`` + ``unproject_points`` as invoked
    by the reference renderer (``/root/reference/VoGE/Renderer.py:124-128``);
  - the coarse camera math (``/root/reference/VoGE/RayTracing.py:33-73``)
    and binning kernel (``rasterize_coarse.cu:20-135``,
    ``rasterization_utils.cuh:16-42``);
  - the fine CUDA hot loop (``ray_trace_voge.cu:155-217``): per-pixel
    insertion-sorted top-K over the bin's candidate list;
  - aggregation / merge_final: the REFERENCE's own torch modules
    (``VoGE/Aggregation.py``) are used directly — not re-implemented;
  - ``sample_features``: the reference's documented scatter equivalence
    (``VoGE/Sampler.py:7-11``, ``Documentation.md:94-101``).

Truncation semantics: the CUDA coarse stage drops per-bin candidates beyond
``max_points_per_bin`` in nondeterministic (chunk-race) order
(``rasterize_coarse.cu:153-170``), so bit-parity under overflow is undefined
even between two runs of the reference.  The oracle truncates in ascending
candidate order (deterministic, equal to the reference whenever no bin
overflows).  Parity-gate configs therefore either use ``mppb >= P`` (exact,
no truncation anywhere) or verify no bin overflows.
"""
from __future__ import annotations

import math

import numpy as np
import torch


# ---------------------------------------------------------------------------
# ray sampling (pytorch3d NDCMultinomialRaysampler, unit_directions=True)
# ---------------------------------------------------------------------------

def reference_rays(R, T, focal, principal, H, W, dtype=torch.float64):
    """Unit world-space ray directions + origins.

    Literal transcription of pytorch3d's ``NDCMultinomialRaysampler``
    (grid construction) + ``cameras.unproject_points(..., from_ndc=True)``
    + ``_xy_to_ray_bundle`` (two-depth unprojection difference), as invoked
    at ``Renderer.py:124-128``:

      - NDC grid: x descends over ``linspace(range_x - hx, -range_x + hx, W)``
        with ``range_x = W / s`` (s = min(H, W)), ``hx = range_x / W`` —
        i.e. pixel centers;
      - screen camera projection ``x_ndc = (2 fx x_v / z + W - 2 px) / s``
        (PerspectiveCameras in_ndc=False composed with
        ``get_screen_to_ndc_transform``), inverted at depths 1 and 2;
      - ``directions = unproject(d=2) - unproject(d=1)``;
        ``origins = unproject(d=1) - directions`` (= camera centers);
        normalized (``unit_directions=True``).

    :param R: (B, 3, 3) torch, row-vector world-to-view
    :param T: (B, 3); :param focal:/:param principal: (B, 2) screen units
    :return: (rays (B, H, W, 3) unit world dirs, origins (B, 3))
    """
    B = R.shape[0]
    s = float(min(H, W))
    range_x = W / s
    range_y = H / s
    hx = range_x / W
    hy = range_y / H
    xs = torch.linspace(range_x - hx, -range_x + hx, W, dtype=dtype)
    ys = torch.linspace(range_y - hy, -range_y + hy, H, dtype=dtype)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")          # (H, W)

    fx = focal[:, 0].reshape(B, 1, 1)
    fy = focal[:, 1].reshape(B, 1, 1)
    px = principal[:, 0].reshape(B, 1, 1)
    py = principal[:, 1].reshape(B, 1, 1)

    def unproject(depth):
        # invert x_ndc = (2 fx x_v/z + W - 2 px)/s at z = depth
        xv = depth * (gx[None] * s - W + 2.0 * px) / (2.0 * fx)
        yv = depth * (gy[None] * s - H + 2.0 * py) / (2.0 * fy)
        zv = torch.full_like(xv, float(depth))
        pv = torch.stack([xv, yv, zv], dim=-1)              # (B, H, W, 3)
        # view -> world: x_w = (x_v - T) @ R^{-1}
        Rinv = torch.linalg.inv(R)                          # (B, 3, 3)
        return torch.einsum("bhwj,bji->bhwi", pv - T[:, None, None, :], Rinv)

    p1 = unproject(1.0)
    p2 = unproject(2.0)
    dirs = p2 - p1
    origins = (p1 - dirs)[:, 0, 0, :]                       # camera centers
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    return dirs, origins


# ---------------------------------------------------------------------------
# coarse binning (RayTracing.py:33-73 + rasterize_coarse.cu)
# ---------------------------------------------------------------------------

def _pix_to_nonsquare_ndc(i, S1, S2):
    """``PixToNonSquareNdc`` (rasterization_utils.cuh:35-42)."""
    rng = 2.0 if S1 <= S2 else 2.0 * S1 / S2
    off = rng / 2.0
    return -off + (rng * i + off) / S1


def reference_coarse(R, T, focal, principal, points_cc, isigmas, H, W,
                     thr, bin_size, max_points_per_bin):
    """Per-bin candidate lists; literal ``rasterize_coarse``
    (``RayTracing.py:42-73``) + the CUDA binning (``rasterize_coarse.cu``).

    :param points_cc: (B, P, 3) camera-centered world points (verts - C),
        exactly what the renderer passes (``Renderer.py:130``)
    :return: (bin_points (B, BH, BW, M) int64 flattened indices -1-padded,
        counts (B, BH, BW) exact per-bin candidate counts)
    """
    B, P = points_cc.shape[0], points_cc.shape[1]
    dtype = points_cc.dtype
    s = float(min(H, W))
    # C = -inverse(R^T) T  (RayTracing.py:45); points back to world
    C = -torch.einsum(
        "bij,bj->bi", torch.linalg.inv(R.transpose(1, 2)), T
    )
    pts_w = points_cc + C[:, None, :]
    # world -> view (row convention), then the negated-NDC projection
    view = torch.einsum("bpj,bji->bpi", pts_w, R) + T[:, None, :]
    z_view = view[..., 2]
    fx = focal[:, 0:1]
    fy = focal[:, 1:2]
    px = principal[:, 0:1]
    py = principal[:, 1:2]
    # points_ndc = -transform_points(points): x = (2(px - fx x/z) - W)/s
    x_ndc = (2.0 * (px - fx * view[..., 0] / z_view) - W) / s
    y_ndc = (2.0 * (py - fy * view[..., 1] / z_view) - H) / s
    # convert_to_box (RayTracing.py:33-39): camera-rotated Lambda, 2x2 inv
    lam_cam = torch.einsum("bji,bpjk,bkl->bpil", R, isigmas, R)
    inv2 = torch.linalg.inv(lam_cam[..., :2, :2])
    # projection-to-NDC matrix [:2,:2] = diag(-2fx/s, -2fy/s) (sign squares
    # away inside M inv M)
    m00 = -2.0 * fx / s
    m11 = -2.0 * fy / s
    get_xx = m00 * inv2[..., 0, 0] * m00
    get_xy = m00 * inv2[..., 0, 1] * m11
    get_yx = m11 * inv2[..., 1, 0] * m00
    get_yy = m11 * inv2[..., 1, 1] * m11
    nlt = -math.log(thr)
    # boxes = (ones @ get).sqrt() * z with z = -points_ndc[..., -1] = 1/z_view
    bx_half = torch.sqrt(nlt * (get_xx + get_yx)) / z_view
    by_half = torch.sqrt(nlt * (get_xy + get_yy)) / z_view

    BH = (H - 1) // bin_size + 1
    BW = (W - 1) // bin_size + 1
    hx = (2.0 if W <= H else 2.0 * W / H) / 2.0 / W
    hy = (2.0 if H <= W else 2.0 * H / W) / 2.0 / H
    # bin extents in (negated) NDC (rasterize_coarse.cu:111-135)
    by_idx = torch.arange(BH, dtype=dtype)
    bx_idx = torch.arange(BW, dtype=dtype)
    bin_y_min = _pix_to_nonsquare_ndc(by_idx * bin_size, H, W) - hy
    bin_y_max = _pix_to_nonsquare_ndc((by_idx + 1) * bin_size - 1, H, W) + hy
    bin_x_min = _pix_to_nonsquare_ndc(bx_idx * bin_size, W, H) - hx
    bin_x_max = _pix_to_nonsquare_ndc((bx_idx + 1) * bin_size - 1, W, H) + hx

    xmin = x_ndc - bx_half
    xmax = x_ndc + bx_half
    ymin = y_ndc - by_half
    ymax = y_ndc + by_half
    skip = z_view < 0                                        # bbox kernel :35
    # overlap tests, vectorized over (B, BH/BW, P)
    yo = (ymin[:, None, :] <= bin_y_max[None, :, None]) & (
        bin_y_min[None, :, None] < ymax[:, None, :]
    )                                                        # (B, BH, P)
    xo = (xmin[:, None, :] <= bin_x_max[None, :, None]) & (
        bin_x_min[None, :, None] < xmax[:, None, :]
    )                                                        # (B, BW, P)
    member = yo[:, :, None, :] & xo[:, None, :, :] & (~skip)[:, None, None, :]

    M = int(max_points_per_bin)
    counts = member.sum(dim=-1)
    bin_points = torch.full((B, BH, BW, M), -1, dtype=torch.int64)
    for b in range(B):
        for by in range(BH):
            for bxi in range(BW):
                idx = torch.nonzero(member[b, by, bxi], as_tuple=False)[:, 0]
                take = idx[:M]
                bin_points[b, by, bxi, : take.numel()] = take + b * P
    return bin_points, counts


# ---------------------------------------------------------------------------
# fine ray tracing (ray_trace_voge.cu:155-217)
# ---------------------------------------------------------------------------

def reference_fine(mus, isigmas, rays, bin_points, thr, bin_size, K,
                   inf=1e10):
    """Per-pixel top-K nearest selection over the pixel's bin candidates.

    The CUDA kernel (``ray_trace_voge.cu:184-215``) walks the bin's list in
    order maintaining an insertion-sorted K-list keyed on hit length with
    strict-inequality comparisons — equivalent to: K smallest hit lengths
    among threshold-passing candidates, ascending, earlier list position on
    ties.  Implemented here with a stable sort per bin (vectorized over the
    bin's pixels).  Fill values per ``ray_trace_voge.cu:244-247``:
    idx=-1, len=1e10, act=1e10, dsd=0.

    :param mus: (P_total, 3) flattened over batch; :param isigmas: (P_total, 3, 3)
    :param rays: (B, H, W, 3); :param bin_points: (B, BH, BW, M) int64
    :return: (sel_idx, sel_len, sel_act, sel_dsd) each (B, H, W, K)
    """
    thr_act = -math.log(thr + 1.0 / inf)
    B, H, W, _ = rays.shape
    _, BH, BW, M = bin_points.shape
    dtype = mus.dtype
    sel_idx = torch.full((B, H, W, K), -1, dtype=torch.int64)
    sel_len = torch.full((B, H, W, K), 1e10, dtype=dtype)
    sel_act = torch.full((B, H, W, K), 1e10, dtype=dtype)
    sel_dsd = torch.zeros((B, H, W, K), dtype=dtype)

    for b in range(B):
        for by in range(BH):
            y0, y1 = by * bin_size, min((by + 1) * bin_size, H)
            if y0 >= H:
                continue
            for bxi in range(BW):
                x0, x1 = bxi * bin_size, min((bxi + 1) * bin_size, W)
                if x0 >= W:
                    continue
                cand = bin_points[b, by, bxi]
                cand = cand[cand >= 0]
                if cand.numel() == 0:
                    continue
                mu = mus[cand]                                # (C, 3)
                lam = isigmas[cand]                           # (C, 3, 3)
                r = rays[b, y0:y1, x0:x1].reshape(-1, 3)      # (Rp, 3)
                # Innerdot3d math (ray_trace_voge.cu:11-38), contracted
                # without (C, Rp, 3) intermediates: ksk = lam9 . rr,
                # msk = (mu^T lam) . r  — exact in f64 regardless of order
                rr = torch.einsum("ri,rj->rij", r, r).reshape(-1, 9)  # (Rp, 9)
                ksk = lam.reshape(-1, 9) @ rr.T               # (C, Rp)
                a = torch.einsum("ci,cij->cj", mu, lam)       # (C, 3)
                msk = a @ r.T                                 # (C, Rp)
                msm = torch.einsum("cj,cj->c", a, mu)[:, None]
                length = msk / ksk                            # (C, Rp)
                act = msm - msk * msk / ksk
                ok = act < thr_act
                lm = torch.where(ok, length, torch.full_like(length, 1e10))
                kk = min(K, lm.shape[0])
                # stable sort => earlier candidate position wins ties, the
                # insertion sort's strict-< behavior
                order = torch.argsort(lm, dim=0, stable=True)[:kk]  # (kk, Rp)
                top_len = torch.gather(lm, 0, order)
                valid = top_len < 1e10
                top_act = torch.where(
                    valid, torch.gather(act, 0, order),
                    torch.full_like(top_len, 1e10),
                )
                top_dsd = torch.where(
                    valid,
                    torch.gather(ksk.expand_as(lm), 0, order),
                    torch.zeros_like(top_len),
                )
                top_idx = torch.where(
                    valid, cand[order], torch.full_like(order, -1)
                )
                top_len = torch.where(
                    valid, top_len, torch.full_like(top_len, 1e10)
                )
                Rp = r.shape[0]
                hh, ww = y1 - y0, x1 - x0
                sel_idx[b, y0:y1, x0:x1, :kk] = (
                    top_idx.T.reshape(hh, ww, kk)
                )
                sel_len[b, y0:y1, x0:x1, :kk] = (
                    top_len.T.reshape(hh, ww, kk)
                )
                sel_act[b, y0:y1, x0:x1, :kk] = (
                    top_act.T.reshape(hh, ww, kk)
                )
                sel_dsd[b, y0:y1, x0:x1, :kk] = (
                    top_dsd.T.reshape(hh, ww, kk)
                )
    return sel_idx, sel_len, sel_act, sel_dsd


# ---------------------------------------------------------------------------
# full chain (Renderer.py:102-150) — differentiable in torch
# ---------------------------------------------------------------------------

def reference_render(ref, verts, sigmas, R, T, focal, principal, image_size,
                     max_assign=20, thr_activation=0.01, absorptivity=1.0,
                     inverse_sigma=False, max_point_per_bin=None,
                     bin_size=None, dtype=torch.float64):
    """Full reference forward render; returns a dict with rays, fragments
    fields, and the intermediate selections.  ``ref`` is the imported
    reference VoGE package (conftest fixture) — its own torch
    ``Aggregation`` module performs the compositing.

    All tensors torch; ``verts``/``sigmas`` may require grad.
    """
    H, W = int(image_size[0]), int(image_size[1])
    B = R.shape[0]
    P = verts.shape[0] if verts.dim() == 2 else verts.shape[1]

    sigmas = ref.Aggregation.expend_sigma(sigmas)
    if verts.dim() == 2:
        verts = verts[None]
    verts = verts.expand(B, P, 3)

    rays, origins = reference_rays(R, T, focal, principal, H, W, dtype=dtype)
    verts_cc = verts - origins[:, None, :]
    sig_b = sigmas[None].expand(B, P, 3, 3)
    isigma = 2.0 * torch.linalg.inv(sig_b) if inverse_sigma else 2.0 * sig_b

    # bin config heuristics (RayTracing.py:14-19)
    if bin_size is None:
        bin_size = max(int(2 ** math.ceil(math.log2(max(H, W)) - 5)), 10)
    if max_point_per_bin is None:
        max_point_per_bin = min(int(max(max_assign * 10, P / 10)), P)

    if max_point_per_bin == -1:
        BH = (H - 1) // bin_size + 1
        BW = (W - 1) // bin_size + 1
        base = (
            torch.arange(P).view(1, 1, 1, -1)
            + torch.arange(B).view(-1, 1, 1, 1) * P
        )
        # (faithfully reproduces the reference's square-grid expand at
        # RayTracing.py:25 only for square grids; uses the correct BH/BW —
        # the no-coarse path puts every candidate in every bin either way)
        bin_points = base.expand(B, BH, BW, P).contiguous()
        counts = torch.full((B, BH, BW), P, dtype=torch.int64)
    else:
        bin_points, counts = reference_coarse(
            R, T, focal, principal, verts_cc.detach(), isigma.detach(),
            H, W, thr_activation, bin_size, max_point_per_bin,
        )

    sel_idx, sel_len, sel_act, sel_dsd = reference_fine(
        verts_cc.reshape(-1, 3), isigma.reshape(-1, 3, 3), rays,
        bin_points, thr_activation, bin_size, max_assign,
    )
    vert_weight, vert_index, valid_num, vert_hit_length = (
        ref.Aggregation.aggregation(
            sel_idx=sel_idx, sel_act=sel_act, sel_len=sel_len,
            sel_dsd=sel_dsd, occupation_weight=absorptivity,
        )
    )
    return dict(
        rays=rays, origins=origins,
        sel=(sel_idx, sel_len, sel_act, sel_dsd),
        bin_counts=counts, max_point_per_bin=max_point_per_bin,
        vert_weight=vert_weight, vert_index=vert_index,
        valid_num=valid_num, vert_hit_length=vert_hit_length,
    )


def reference_interpolate(ref, frag_dict, vert_attr):
    """``interpolate_attr`` via the reference's own ``merge_final``.

    The reference ``merge_final`` mutates ``vert_assign`` IN PLACE
    (``vert_assign += (vert_assign < 0) * 1``, ``Aggregation.py:133``); the
    reference renderer guards its fragments with ``.clone()``
    (``Renderer.py:145``) — mirrored here so ``frag_dict['vert_index']``
    stays comparable after compositing."""
    return ref.Aggregation.merge_final(
        vert_attr=vert_attr, weight=frag_dict["vert_weight"],
        valid_num=frag_dict["valid_num"],
        vert_assign=frag_dict["vert_index"].clone(),
    )


def reference_silhouette(frag_dict):
    w = frag_dict["vert_weight"].sum(-1)
    return torch.minimum(w, torch.ones_like(w))


def reference_white_background(ref, frag_dict, colors):
    """``to_white_background`` (Renderer.py:162-176)."""
    masks = reference_silhouette(frag_dict)[..., None]
    rgb = reference_interpolate(ref, frag_dict, colors)
    return torch.minimum(
        rgb + torch.ones_like(rgb) * (1 - masks), torch.ones_like(rgb)
    )


def reference_sample_features(frag_dict, image, n_vert):
    """``sample_features`` via the documented scatter equivalence
    (``Sampler.py:7-11``): feature[n] = sum_pixels w * image where
    sel == n; weight_sum[n] = sum w."""
    w = frag_dict["vert_weight"]                         # (B, H, W, K)
    idx = frag_dict["vert_index"]                        # (B, H, W, K)
    C = image.shape[-1]
    dtype = w.dtype
    flat_w = w.reshape(-1)
    flat_i = idx.reshape(-1).clone()
    valid = flat_i >= 0
    flat_i = torch.where(valid, flat_i, torch.zeros_like(flat_i))
    flat_w = torch.where(valid, flat_w, torch.zeros_like(flat_w))
    K = w.shape[-1]
    img_e = image[..., None, :].expand(*w.shape, C).reshape(-1, C)
    feat = torch.zeros((n_vert, C), dtype=dtype)
    feat.index_add_(0, flat_i, img_e * flat_w[:, None])
    wsum = torch.zeros((n_vert,), dtype=dtype)
    wsum.index_add_(0, flat_i, flat_w)
    return feat, wsum
