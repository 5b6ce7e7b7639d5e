"""Pallas backward kernels for the fine ray-tracing stage.

Replaces the E = B*H*W*K entry-space backward (gather -> chain ->
segment_sum) with two streaming kernels over the same (bin, ray-chunk,
cand-chunk) structure as the forward (:mod:`voge_tpu.ops.pallas_fine2`):

  - :func:`fine_bwd_gauss_pallas` — per-Gaussian gradients.  For each
    occupied (bin, chunk) step it reconstructs the selection coefficient
    matrices G_len/G_act/G_dsd (R, C) by matching the bin's selected indices
    against the chunk's index range, applies the closed-form chain rule of
    ``ray_trace_voge.cu:324-326``, reduces over rays (13 column reductions),
    and accumulates per-candidate gradient planes into a (B, 16, P_pad)
    output with Mosaic block-revisit accumulation (grid ordered with the
    candidate chunk *outermost* so each output block's visits are
    consecutive).

  - :func:`fine_bwd_rays_pallas` — per-ray gradients, accumulated in VMEM
    scratch across candidate chunks (grid ordered like the forward, chunk
    innermost).

No gathers, no scatters: deterministic, bandwidth-light, and skips empty
chunks like the forward.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voge_tpu.ops.pallas_fine import FEAT
from voge_tpu.ops.pallas_fine2 import _erf32
from voge_tpu.ops.pallas_attr import (
    _MAX_UNROLL_K, _lane_extract, gather_back_rows as _gather_back,
)

_INF = 1e10

_INV_SQRT_PI = 0.5641895835477563


def _fold_ray_major(l, a, d, w, gw, ow: float, K: int):
    """Analytic backward of the fused erf compositing in RAY-MAJOR (R, K)
    layout — the slot arrays exactly as the select returns them, so the
    unified backward kernel can fold the weight cotangent in its own
    prologue with zero boundary transposes (the standalone
    :func:`voge_tpu.ops.pallas_fine2.fold_weights_pallas` works on the
    kernel-native transposed buffers and needs one XLA transpose in and
    three out).  Math identical — see fold_weights_pallas' docstring.

    :return: (dl, da, dd) each (R, K)
    """
    R = l.shape[0]
    s = jnp.sqrt(d + 1e-10)
    e = jnp.exp(-a)
    G = gw * w

    def _sweep(lk, sk, ek, B):
        diff = l - lk                                   # (R, K) vs slot k
        ca = diff * sk
        phi = jnp.exp(-ca * ca) * _INV_SQRT_PI
        Phi = (_erf32(ca) + 1.0) * 0.5
        cols = (
            jnp.sum(G * Phi, axis=1, keepdims=True),    # A_k (R, 1)
            jnp.sum(G * phi, axis=1, keepdims=True),    # C_k
            jnp.sum(G * phi * diff, axis=1, keepdims=True),  # D_k
        )
        return cols, B + (ek * sk) * phi

    if K <= _MAX_UNROLL_K:
        B = jnp.zeros_like(l)
        A_cols, C_cols, D_cols = [], [], []
        for k in range(K):
            cols, B = _sweep(l[:, k:k + 1], s[:, k:k + 1], e[:, k:k + 1], B)
            A_cols.append(cols[0])
            C_cols.append(cols[1])
            D_cols.append(cols[2])
        A = jnp.concatenate(A_cols, axis=1)
        C = jnp.concatenate(C_cols, axis=1)
        D = jnp.concatenate(D_cols, axis=1)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)

        def body(k, carry):
            A, C, D, B = carry
            cols, B = _sweep(
                _lane_extract(l, k, _INF), jnp.sqrt(
                    _lane_extract(d, k, 0.0) + 1e-10),
                jnp.exp(-_lane_extract(a, k, _INF)), B,
            )
            put = lambda acc, col: jnp.where(lane == k, col, acc)
            return put(A, cols[0]), put(C, cols[1]), put(D, cols[2]), B

        A, C, D, _B = jax.lax.fori_loop(
            0, K, body,
            (jnp.zeros_like(l), jnp.zeros_like(l), jnp.zeros_like(l),
             jnp.zeros_like(l)),
            unroll=False,
        )
        B = _B
    f_ow = jnp.float32(ow)
    da = -G + f_ow * e * A
    dl = -f_ow * (G * B - e * s * C)
    dd = -f_ow * e * D * (0.5 / s)
    return dl, da, dd


def _coeffs_and_forms(rf, gf, ids, sel, gl, ga, gd, K):
    """Shared reconstruction: selection coefficient matrices and the chain
    gradients (g_ksk, g_msk, g_msm), each (R, C)."""
    R = rf.shape[0]
    C = gf.shape[1]
    gidx = ids                                                  # (1, C)

    Gl = jnp.zeros((R, C), jnp.float32)
    Ga = jnp.zeros((R, C), jnp.float32)
    Gd = jnp.zeros((R, C), jnp.float32)
    if K <= _MAX_UNROLL_K:
        for k in range(K):
            oh = sel[:, k : k + 1] == gidx                       # (R, C)
            Gl = Gl + jnp.where(oh, gl[:, k : k + 1], 0.0)
            Ga = Ga + jnp.where(oh, ga[:, k : k + 1], 0.0)
            Gd = Gd + jnp.where(oh, gd[:, k : k + 1], 0.0)
    else:
        # large K: one compiled body (compile time of the unroll grows
        # ~linearly in K — see ops/pallas_attr.py); slot k extracted with a
        # one-hot lane sum (dynamic lane slicing does not lower in Mosaic)
        def body(k, carry):
            Gl, Ga, Gd = carry
            oh = _lane_extract(sel, k, 0) == gidx
            Gl = Gl + jnp.where(oh, _lane_extract(gl, k, 0.0), 0.0)
            Ga = Ga + jnp.where(oh, _lane_extract(ga, k, 0.0), 0.0)
            Gd = Gd + jnp.where(oh, _lane_extract(gd, k, 0.0), 0.0)
            return Gl, Ga, Gd

        Gl, Ga, Gd = jax.lax.fori_loop(
            0, K, body, (Gl, Ga, Gd), unroll=False
        )
    # padding candidates (id == -1) match invalid selections (also -1); in
    # a compacted table they carry real gathered features, so gate them out
    ok = (gidx >= 0).astype(jnp.float32)
    Gl = Gl * ok
    Ga = Ga * ok
    Gd = Gd * ok

    msk = rf[:, 0:1] * gf[0:1, :] + rf[:, 1:2] * gf[1:2, :] + rf[:, 2:3] * gf[2:3, :]
    ksk = rf[:, 3:4] * gf[4:5, :]
    for q in range(1, 9):
        ksk = ksk + rf[:, 3 + q : 4 + q] * gf[4 + q : 5 + q, :]
    nz = ksk != 0.0
    ksk_s = jnp.where(nz, ksk, 1.0)

    g_ksk = (Ga * msk - Gl) * msk / (ksk_s * ksk_s) + Gd
    g_msk = (Gl - 2.0 * Ga * msk) / ksk_s
    g_msm = Ga
    return g_ksk, g_msk, g_msm


def _bwd_gauss_kernel(
    mask_ref, gf_ref, ids_ref, rf_ref, sel_ref, gl_ref, ga_ref, gd_ref,
    out_ref,  # (1, FEAT, C) accumulated gradient planes
    *, thr_act: float, K: int, chunk: int, bh_bw: int, n_gauss: int,
):
    c = pl.program_id(0)
    b = pl.program_id(1)
    r = pl.program_id(2)

    first = (b % bh_bw == 0) & (r == 0)

    @pl.when(first)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    m = mask_ref[0]

    @pl.when(jnp.max(m.astype(jnp.float32)) > 0.5)
    def _():
        rf = rf_ref[0]
        gf = gf_ref[0]
        g_ksk, g_msk, g_msm = _coeffs_and_forms(
            rf, gf, ids_ref[0], sel_ref[0], gl_ref[0], ga_ref[0], gd_ref[0], K,
        )
        # column reductions over rays
        S1 = jnp.sum(g_msm, axis=0, keepdims=True)               # (1, C)
        Sr = [
            jnp.sum(g_msk * rf[:, j : j + 1], axis=0, keepdims=True)
            for j in range(3)
        ]
        Srr = [
            jnp.sum(g_ksk * rf[:, 3 + q : 4 + q], axis=0, keepdims=True)
            for q in range(9)
        ]
        L = [[gf[4 + i * 3 + j : 5 + i * 3 + j, :] for j in range(3)] for i in range(3)]
        mu = [gf[13 + i : 14 + i, :] for i in range(3)]
        g_mu = [
            sum(L[i][j] * Sr[j] for j in range(3))
            + S1 * sum((L[i][j] + L[j][i]) * mu[j] for j in range(3))
            for i in range(3)
        ]
        g_L = [
            Srr[i * 3 + j] + Sr[j] * mu[i] + S1 * mu[i] * mu[j]
            for i in range(3)
            for j in range(3)
        ]
        zero = jnp.zeros_like(S1)
        contrib = jnp.concatenate(g_mu + g_L + [zero] * (FEAT - 12), axis=0)
        out_ref[0] = out_ref[0] + contrib


def _bwd_rays_kernel(
    mask_ref, gf_ref, ids_ref, rf_ref, sel_ref, gl_ref, ga_ref, gd_ref,
    out_ref,  # (1, R, FEAT) per-ray gradient (cols 0..2 used)
    acc,      # (R, FEAT) scratch
    *, thr_act: float, K: int, chunk: int, bh_bw: int, n_gauss: int,
):
    b = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    n_c = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    m = mask_ref[0]

    @pl.when(jnp.max(m.astype(jnp.float32)) > 0.5)
    def _():
        rf = rf_ref[0]
        gf = gf_ref[0]
        R = rf.shape[0]
        g_ksk, g_msk, g_msm = _coeffs_and_forms(
            rf, gf, ids_ref[0], sel_ref[0], gl_ref[0], ga_ref[0], gd_ref[0], K,
        )
        L = [[gf[4 + i * 3 + j : 5 + i * 3 + j, :] for j in range(3)] for i in range(3)]
        mu = [gf[13 + i : 14 + i, :] for i in range(3)]
        cols = []
        for i in range(3):
            lam_r_i = sum(L[i][j] * rf[:, j : j + 1] for j in range(3))
            lamT_r_i = sum(L[j][i] * rf[:, j : j + 1] for j in range(3))
            lamT_mu_i = sum(L[j][i] * mu[j] for j in range(3))
            term = g_ksk * (lam_r_i + lamT_r_i) + g_msk * lamT_mu_i
            cols.append(jnp.sum(term, axis=1, keepdims=True))    # (R, 1)
        zero = jnp.zeros_like(cols[0])
        acc[:] = acc[:] + jnp.concatenate(cols + [zero] * (FEAT - 3), axis=1)

    @pl.when(c == n_c - 1)
    def _():
        out_ref[0] = acc[:]


def _bwd_unified_kernel(
    csel_ref,   # (nb, n_c) int32 SMEM: chunk visit list (scalar prefetch)
    cnt_ref,    # (nb,) int32 SMEM: occupied chunk count per bin
    gf_ref, ids_ref, rf_ref, sel_ref, gl_ref, ga_ref, gd_ref,
    *refs,      # [fuse_fold inputs: lw/aw/dw/ww/gww (1, R, K)] then
                # outputs + scratch, per (want_gauss, want_rays):
                #   both:  og_ref (1, FEAT, P_pad), or_ref (1, R, FEAT), acc
                #   gauss: og_ref
                #   rays:  or_ref, acc
                # [fuse_fold scratch: cl/ca/cd (R, K)]
    K: int, chunk: int, bh_bw: int,
    want_gauss: bool = True, want_rays: bool = True,
    fuse_fold: bool = False, ow: float = 1.0,
):
    if fuse_fold:
        lw_ref, aw_ref, dw_ref, ww_ref, gww_ref = refs[:5]
        refs = refs[5:]
        cl_s, ca_s, cd_s = refs[-3:]
        refs = refs[:-3]
    if want_gauss and want_rays:
        og_ref, or_ref, acc = refs
    elif want_gauss:
        (og_ref,) = refs
        or_ref = acc = None
    else:
        or_ref, acc = refs
        og_ref = None
    b = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    n_c = pl.num_programs(2)

    if want_gauss:
        @pl.when((b % bh_bw == 0) & (r == 0) & (c == 0))
        def _():
            og_ref[0] = jnp.zeros_like(og_ref[0])

    if want_rays:
        @pl.when(c == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

    if fuse_fold:
        # fold the weight cotangent into the selection cotangents once per
        # (bin, ray-chunk), in the slot arrays' own ray-major layout
        @pl.when(c == 0)
        def _():
            dl, da, dd = _fold_ray_major(
                lw_ref[0], aw_ref[0], dw_ref[0], ww_ref[0], gww_ref[0],
                ow, K,
            )
            cl_s[:] = gl_ref[0] + dl
            ca_s[:] = ga_ref[0] + da
            cd_s[:] = gd_ref[0] + dd

    @pl.when(c < cnt_ref[b])
    def _():
        rf = rf_ref[0]
        gf = gf_ref[0]
        if fuse_fold:
            gl_v, ga_v, gd_v = cl_s[:], ca_s[:], cd_s[:]
        else:
            gl_v, ga_v, gd_v = gl_ref[0], ga_ref[0], gd_ref[0]
        g_ksk, g_msk, g_msm = _coeffs_and_forms(
            rf, gf, ids_ref[0], sel_ref[0], gl_v, ga_v, gd_v, K,
        )
        L = [[gf[4 + i * 3 + j : 5 + i * 3 + j, :] for j in range(3)]
             for i in range(3)]
        mu = [gf[13 + i : 14 + i, :] for i in range(3)]

        if want_gauss:
            # ---- per-Gaussian gradient planes (column reductions over rays)
            S1 = jnp.sum(g_msm, axis=0, keepdims=True)           # (1, C)
            Sr = [
                jnp.sum(g_msk * rf[:, j : j + 1], axis=0, keepdims=True)
                for j in range(3)
            ]
            Srr = [
                jnp.sum(g_ksk * rf[:, 3 + q : 4 + q], axis=0, keepdims=True)
                for q in range(9)
            ]
            g_mu = [
                sum(L[i][j] * Sr[j] for j in range(3))
                + S1 * sum((L[i][j] + L[j][i]) * mu[j] for j in range(3))
                for i in range(3)
            ]
            g_L = [
                Srr[i * 3 + j] + Sr[j] * mu[i] + S1 * mu[i] * mu[j]
                for i in range(3)
                for j in range(3)
            ]
            zero = jnp.zeros_like(S1)
            contrib = jnp.concatenate(
                g_mu + g_L + [zero] * (FEAT - 12), axis=0
            )
            off = csel_ref[b, c] * chunk
            og_ref[0, :, pl.ds(off, chunk)] = (
                og_ref[0, :, pl.ds(off, chunk)] + contrib
            )

        if want_rays:
            # ---- per-ray gradients (row reductions over candidates)
            cols = []
            for i in range(3):
                lam_r_i = sum(L[i][j] * rf[:, j : j + 1] for j in range(3))
                lamT_r_i = sum(L[j][i] * rf[:, j : j + 1] for j in range(3))
                lamT_mu_i = sum(L[j][i] * mu[j] for j in range(3))
                term = g_ksk * (lam_r_i + lamT_r_i) + g_msk * lamT_mu_i
                cols.append(jnp.sum(term, axis=1, keepdims=True))  # (R, 1)
            zc = jnp.zeros_like(cols[0])
            acc[:] = acc[:] + jnp.concatenate(
                cols + [zc] * (FEAT - 3), axis=1
            )

    if want_rays:
        @pl.when(c == n_c - 1)
        def _():
            or_ref[0] = acc[:]


def _bwd_unified_call(
    rays_feat, gauss_planes, ids_row, csel, counts, sel_b, gl_b, ga_b, gd_b,
    K: int, ray_chunk: int, cand_chunk: int, per_bin_cand: bool,
    bh_bw: int, interpret: bool, mode: str = "both",
    fold_in=None, agg_ow: float = 1.0,
):
    """Shared pallas_call for the unified backward.  ``gauss_planes``
    (NB, FEAT, C_total) / ``ids_row`` (NB, 1, C_total) are per bin
    (NB == nb, compacted) or per image (NB == B).

    ``mode``: "both" (one fused pass, the coefficient reconstruction
    shared), "gauss" or "rays" (single-output variants — issuing the two
    as SEPARATE pallas_calls lets XLA dead-code the whole rays pass when
    the cameras are not being differentiated, the common fitting loop; the
    reconstruction is duplicated only when BOTH gradients are live)."""
    nb, R_pad, _ = rays_feat.shape
    NB, _, C_total = gauss_planes.shape
    assert R_pad % ray_chunk == 0 and C_total % cand_chunk == 0, (
        "ray/cand chunks must divide the padded extents; a non-divisor "
        "silently drops grid steps", R_pad, ray_chunk, C_total, cand_chunk,
    )
    n_r = R_pad // ray_chunk
    n_c = C_total // cand_chunk
    if per_bin_cand:
        cmap = lambda b, r, c, cs, ct: (b, 0, cs[b, c])
        omap = lambda b, r, c, cs, ct: (b, 0, 0)
        out_bins = nb
        eff_bh_bw = 1
    else:
        cmap = lambda b, r, c, cs, ct, _bw=int(bh_bw): (b // _bw, 0, cs[b, c])
        omap = lambda b, r, c, cs, ct, _bw=int(bh_bw): (b // _bw, 0, 0)
        out_bins = NB
        eff_bh_bw = bh_bw
    want_gauss = mode in ("both", "gauss")
    want_rays = mode in ("both", "rays")
    fuse_fold = fold_in is not None
    kernel = functools.partial(
        _bwd_unified_kernel, K=int(K), chunk=int(cand_chunk),
        bh_bw=int(eff_bh_bw), want_gauss=want_gauss, want_rays=want_rays,
        fuse_fold=fuse_fold, ow=float(agg_ow),
    )
    slot = pl.BlockSpec((1, ray_chunk, K), lambda b, r, c, cs, ct: (b, r, 0),
                        memory_space=pltpu.VMEM)
    og_spec = pl.BlockSpec((1, FEAT, C_total), omap, memory_space=pltpu.VMEM)
    og_shape = jax.ShapeDtypeStruct((out_bins, FEAT, C_total), jnp.float32)
    or_spec = pl.BlockSpec((1, ray_chunk, FEAT),
                           lambda b, r, c, cs, ct: (b, r, 0),
                           memory_space=pltpu.VMEM)
    or_shape = jax.ShapeDtypeStruct((nb, R_pad, FEAT), jnp.float32)
    out_specs = ([og_spec] if want_gauss else []) + (
        [or_spec] if want_rays else []
    )
    out_shapes = ([og_shape] if want_gauss else []) + (
        [or_shape] if want_rays else []
    )
    scratch = (
        [pltpu.VMEM((ray_chunk, FEAT), jnp.float32)] if want_rays else []
    )
    in_specs = [
        pl.BlockSpec((1, FEAT, cand_chunk), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cand_chunk), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ray_chunk, FEAT),
                     lambda b, r, c, cs, ct: (b, r, 0),
                     memory_space=pltpu.VMEM),
        slot, slot, slot, slot,
    ]
    inputs = [gauss_planes, ids_row, rays_feat, sel_b, gl_b, ga_b, gd_b]
    if fuse_fold:
        in_specs += [slot] * 5
        inputs += list(fold_in)          # lw, aw, dw, ww, gww (nb, R, K)
        scratch = scratch + [pltpu.VMEM((ray_chunk, K), jnp.float32)] * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_r, n_c),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(csel, counts, *inputs)
    if mode == "both":
        return out
    return out[0]


def fine_bwd_unified_pallas(
    rays_feat, gauss_feat, mask, ids, sel_b, gl_b, ga_b, gd_b,
    thr_act: float, K: int, bh_bw: int, n_gauss: int,
    ray_chunk: int, cand_chunk: int = 512, interpret: bool = False,
    hitmask=None,
):
    """Both gradient outputs in one streaming pass (the coefficient/forms
    reconstruction — the dominant per-step cost — is shared):

    :return: (gauss_grads (B, FEAT, P_pad): rows 0..2 grad_mu, 3..11
        grad_Lambda;  ray_grads (nb, R_pad, FEAT): cols 0..2 grad_ray)

    Per-Gaussian gradients accumulate into a full-width (FEAT, P_pad) output
    block at the visit list's dynamic chunk offset — deterministic, and the
    block stays resident across all of an image's grid steps.  Empty chunks
    are skipped entirely via the scalar-prefetched visit list (the mask is
    consumed host-side by :func:`chunk_visit_lists`, not streamed).
    """
    from voge_tpu.ops.pallas_fine2 import chunk_visit_lists, hit_visit_lists

    P_pad = gauss_feat.shape[2]
    n_c = P_pad // cand_chunk
    if hitmask is not None:
        # restrict visits to the forward's hit-producing chunks (a hit
        # requires membership, so hit chunks ⊆ mask-occupied chunks and
        # the restriction is exact): (hm (nb, n_c_sel) int32, select cc)
        hm, sel_cc = hitmask
        csel, counts = hit_visit_lists(hm, sel_cc, cand_chunk)
    else:
        csel, counts = chunk_visit_lists(mask, n_c, cand_chunk)
    return _bwd_unified_call(
        rays_feat, gauss_feat, ids, csel, counts, sel_b, gl_b, ga_b, gd_b,
        K=K, ray_chunk=ray_chunk, cand_chunk=cand_chunk, per_bin_cand=False,
        bh_bw=bh_bw, interpret=interpret,
    )


def fine_bwd_compact_pallas(
    rays_feat,          # (nb, R_pad, FEAT)
    table_c,            # (nb, M_max, FEAT) compacted candidate rows
    ids_c,              # (nb, M_max, 1) int32 original ids (-1 pad)
    pos_c,              # (nb, M_max) int32 source (sorted-space) positions
    counts_c,           # (nb,) member counts (<= M_max)
    sel_b, gl_b, ga_b, gd_b,
    K: int, B: int, P_pad: int,
    ray_chunk: int, cand_chunk: int, interpret: bool = False,
    dst=None, fold_in=None, agg_ow: float = 1.0, mode: str = "both",
    hitmask=None,
):
    """Unified backward over the per-supertile COMPACTED candidate space.

    The kernel accumulates per-(supertile, compacted-slot) gradient planes.
    Without ``dst`` a deterministic ``segment_sum`` scatters them back to
    the global (sorted-space) Gaussian axis (~1 ms at the 10K benchmark).
    With ``dst`` — the inverse emission mapping from
    ``emit_supertile_candidates(return_dst=True)`` — the scatter becomes a
    9-wide row GATHER per Gaussian (plus an ``nst``-wide gather for the few
    global members), ~5x cheaper.  Invalid compacted slots (id == -1) can
    match invalid selections (also -1); their contributions are routed to a
    dump segment / dump row and dropped.

    :return: (gauss_grads (B, FEAT, P_pad), ray_grads (nb, R_pad, FEAT))
    """
    from voge_tpu.ops.pallas_fine2 import (
        hit_visit_lists, prefix_visit_lists,
    )

    nb, M_max, _ = table_c.shape
    if hitmask is not None:
        hm, sel_cc = hitmask   # fwd hit bitmap: exact visit restriction
        csel, counts = hit_visit_lists(hm, sel_cc, cand_chunk)
    else:
        csel, counts = prefix_visit_lists(counts_c, M_max, cand_chunk)
    planes_c = jnp.swapaxes(table_c, 1, 2)               # (nb, FEAT, M_max)
    ids_row = jnp.swapaxes(ids_c, 1, 2)                  # (nb, 1, M_max)
    # one fused pass: the coefficient reconstruction (the dominant cost) is
    # shared between the two outputs.  (A split into single-output "gauss"/
    # "rays" passes was measured round-3: the rays side is too cheap for
    # the split to register — pallas_calls are not XLA-DCE'd anyway — while
    # pose+shape optimization would pay the reconstruction twice.)
    out = _bwd_unified_call(
        rays_feat, planes_c, ids_row, csel, counts, sel_b, gl_b, ga_b, gd_b,
        K=K, ray_chunk=ray_chunk, cand_chunk=cand_chunk, per_bin_cand=True,
        bh_bw=1, interpret=interpret, mode=mode,
        fold_in=fold_in, agg_ow=agg_ow,
    )
    if mode == "both":
        gg_c, rb = out
    else:
        gg_c, rb = out, None
    rows = jnp.swapaxes(gg_c, 1, 2).reshape(nb * M_max, FEAT)
    if dst is not None:
        gg = _gather_back(rows, dst, B, P_pad, nb * M_max)
        return jnp.swapaxes(gg, 1, 2), rb
    # scatter-back: (nb, FEAT, M_max) -> rows (nb*M_max, FEAT) -> global
    iota = jnp.arange(M_max, dtype=jnp.int32)[None]
    valid = iota < counts_c[:, None]
    img = jnp.arange(nb, dtype=jnp.int32)[:, None] // (nb // B)
    flat = jnp.where(valid, img * P_pad + pos_c, B * P_pad).reshape(-1)
    summed = jax.ops.segment_sum(rows, flat, num_segments=B * P_pad + 1)
    gg = summed[: B * P_pad].reshape(B, P_pad, FEAT)
    return jnp.swapaxes(gg, 1, 2), rb




def _bwd_t_kernel(
    csel_ref,   # (nb, n_c) int32 SMEM chunk visit list
    cnt_ref,    # (nb,) int32 SMEM occupied chunk count
    ids_ref,    # (1, C, 1) int32 candidate original ids (-1 pad)
    gp_ref,     # (1, FEAT, C) f32 candidate feature PLANES (row-sliceable)
    rft_ref,    # (1, FEAT, R) f32 transposed ray features
    selt_ref,   # (1, Kp, R) int32 raw selection ids (kernel-native)
    lt_ref, at_ref, dt_ref,      # (1, Kp, R) raw selection primals
    glt_ref, gat_ref, gdt_ref,   # (1, Kp, R) transposed cotangents
    *refs,      # [wt_ref, gwt_ref when fold] [gimg_ref (1, Ca, R) when
                # n_attr] then outputs og(,ort) + scratch
    K: int, chunk: int, want_rays: bool, fold: bool, ow: float,
    n_attr: int = 0,
):
    """Fully TRANSPOSED unified fine backward: slots on sublanes (Kp rows),
    rays on lanes — the layout the select kernel already produces, so the
    fold, the entry-space chain rule, and the slot-to-candidate match all
    run without a single ray-major (K-on-lanes) array.  The ray-major
    variant of this kernel (:func:`_bwd_unified_kernel`) pays 84% lane
    waste and cross-lane reduction tails in its fold prologue and spends
    ~60 (R, C) VPU passes on the two reduction sides; here both reductions
    are MXU contractions over R / over C:

      gauss side:  T0(c) = sum_r OHa;  Tr_j(c) = sum_r OHm * r_j(r);
                   Trr_q(c) = sum_r OHg * rr_q(r)
                   => dot(rf_t rows, OH) — the per-candidate reduced sums.
                   The final combine with the candidate features (g_mu,
                   g_Lambda from T0/Tr/Trr — ray_trace_voge.cu:324-330) is
                   elementwise over (nb, M_max) rows and runs OUTSIDE in
                   XLA (fine_bwd_compact_t_pallas wrapper).
      rays side:   g_ray_i(r) = sum_j r_j(r) * [dot(sym_ij, OHg)](r)
                                + [dot(A_i, OHm)](r)

    with OHg/OHm/OHa = sum_k onehot(sel_k == ids) * coeff_k the three
    matched coefficient matrices (coeff = entry-space chain gradients
    g_ksk/g_msk/g_msm, computed in the c==0 prologue from the SAVED
    selection primals: ksk = dsd, msk = len * dsd — no feature recompute).
    Invalid slots carry zeroed coefficients, so padding candidates
    (id == -1) matching invalid selections (-1) contribute exactly zero —
    no gating pass needed.
    """
    if fold:
        wt_ref, gwt_ref = refs[:2]
        refs = refs[2:]
    gimg_ref = dw_s = None
    if n_attr:
        gimg_ref = refs[0]
        refs, dw_s = refs[1:-1], refs[-1]
    if want_rays:
        og_ref, ort_ref, gk_s, gm_s, ga_s, racc = refs
    else:
        og_ref, gk_s, gm_s, ga_s = refs
        ort_ref = racc = None
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)
    if n_attr:
        # the chunk axis is doubled: a d_w phase streaming every occupied
        # chunk (the fold below needs the COMPLETE attr weight-cotangent
        # before the chain rule runs), then the gradient phase re-streaming
        # them
        n_c = n_c // 2
    Kp = gk_s.shape[0]
    R = gk_s.shape[1]
    ph1 = n_c if n_attr else 0  # first gradient-phase step

    if n_attr:
        # ---- phase 0: accumulate d_w from the fused attr image cotangent
        # (the ``interpolate_attr`` VJP's weight side,
        # pallas_attr._bwd_unified_kernel math):
        #   S[c, r]   = sum_ca attr[c, ca] * g_img[ca, r]
        #   d_w[k, r] = S[sel_k(r), r]
        @pl.when(c == 0)
        def _():
            dw_s[:] = jnp.zeros_like(dw_s)

        def _dw_chunk(ids_col):
            attr_p = gp_ref[0][FEAT:FEAT + n_attr]       # (Ca, C)
            S = jax.lax.dot_general(
                attr_p, gimg_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                            # (C, R)
            if K <= _MAX_UNROLL_K:
                rows = [jnp.sum(
                    jnp.where(ids_col == selt_ref[0, k:k + 1, :], S, 0.0),
                    axis=0, keepdims=True,
                ) for k in range(K)]
                if Kp > K:
                    rows.append(jnp.zeros((Kp - K, R), jnp.float32))
                dw_s[:] = dw_s[:] + jnp.concatenate(rows, axis=0)
            else:
                def dw_body(k, _):
                    oh = ids_col == selt_ref[0, pl.ds(k, 1), :]
                    dw_s[pl.ds(k, 1), :] = dw_s[pl.ds(k, 1), :] + jnp.sum(
                        jnp.where(oh, S, 0.0), axis=0, keepdims=True
                    )
                    return 0
                jax.lax.fori_loop(0, K, dw_body, 0, unroll=False)

        @pl.when(c < cnt_ref[b])
        def _():
            ids_col = ids_ref[0]                         # (C, 1)
            # id-range gate — same reasoning as the grad phase below
            _sel = selt_ref[0]
            _ovl = jnp.max(jnp.where(
                (_sel >= ids_col[0, 0]) & (_sel <= jnp.max(ids_col)),
                1.0, 0.0)) > 0.0

            @pl.when(_ovl)
            def _():
                _dw_chunk(ids_col)

    @pl.when(c == ph1)
    def _():
        og_ref[0] = jnp.zeros_like(og_ref[0])
        if want_rays:
            racc[:] = jnp.zeros_like(racc)
        l = lt_ref[0]
        a = at_ref[0]
        d = dt_ref[0]
        gl = glt_ref[0]
        ga = gat_ref[0]
        gd = gdt_ref[0]
        if n_attr:
            dw = dw_s[:]
        if fold:
            # transposed erf-compositing fold (math of fold_weights_pallas)
            w = wt_ref[0]
            s = jnp.sqrt(d + 1e-10)
            e = jnp.exp(-a)
            gw = gwt_ref[0]
            if n_attr:
                gw = gw + dw   # the attr image's weight cotangent
            G = gw * w

            def _sweep(lk, sk, ek, Bc):
                diff = l - lk
                ca = diff * sk
                phi = jnp.exp(-ca * ca) * _INV_SQRT_PI
                Phi = (_erf32(ca) + 1.0) * 0.5
                rows = (
                    jnp.sum(G * Phi, axis=0, keepdims=True),
                    jnp.sum(G * phi, axis=0, keepdims=True),
                    jnp.sum(G * phi * diff, axis=0, keepdims=True),
                )
                return rows, Bc + (ek * sk) * phi

            if K <= _MAX_UNROLL_K:
                Bc = jnp.zeros_like(l)
                A_r, C_r, D_r = [], [], []
                for k in range(K):
                    rows, Bc = _sweep(
                        l[k:k + 1, :], jnp.sqrt(d[k:k + 1, :] + 1e-10),
                        jnp.exp(-a[k:k + 1, :]), Bc,
                    )
                    A_r.append(rows[0])
                    C_r.append(rows[1])
                    D_r.append(rows[2])
                pad = [jnp.zeros((Kp - K, R), jnp.float32)] if Kp > K else []
                A = jnp.concatenate(A_r + pad, axis=0)
                Cm = jnp.concatenate(C_r + pad, axis=0)
                D = jnp.concatenate(D_r + pad, axis=0)
            else:
                # large K: dynamic sublane slices, one compiled body
                ga_s[:] = jnp.zeros_like(ga_s)
                gk_s[:] = jnp.zeros_like(gk_s)
                gm_s[:] = jnp.zeros_like(gm_s)

                def body(k, Bc):
                    rows, Bc = _sweep(
                        lt_ref[0, pl.ds(k, 1), :],
                        jnp.sqrt(dt_ref[0, pl.ds(k, 1), :] + 1e-10),
                        jnp.exp(-at_ref[0, pl.ds(k, 1), :]), Bc,
                    )
                    ga_s[pl.ds(k, 1), :] = rows[0]
                    gk_s[pl.ds(k, 1), :] = rows[1]
                    gm_s[pl.ds(k, 1), :] = rows[2]
                    return Bc

                Bc = jax.lax.fori_loop(0, K, body, jnp.zeros_like(l),
                                       unroll=False)
                A, Cm, D = ga_s[:], gk_s[:], gm_s[:]
            f_ow = jnp.float32(ow)
            ga = ga + (-G + f_ow * e * A)
            gl = gl + (-f_ow * (G * Bc - e * s * Cm))
            gd = gd + (-f_ow * e * D * (0.5 / s))
        # entry-space chain rule (ray_trace_voge.cu:324-326) from the saved
        # primals: ksk = dsd, msk = len * dsd; invalid slots zeroed
        valid = selt_ref[0] >= 0
        vf = jnp.where(valid, 1.0, 0.0)
        lenv = jnp.where(valid, l, 0.0)
        ksk = jnp.where(valid, d, 1.0)
        msk = lenv * ksk
        gl = gl * vf
        ga = ga * vf
        gd = gd * vf
        gk_s[:] = (ga * msk - gl) * msk / (ksk * ksk) + gd
        gm_s[:] = (gl - 2.0 * ga * msk) / ksk
        ga_s[:] = ga

    @pl.when((c >= ph1) & (c - ph1 < cnt_ref[b]))
    def _():
        ids = ids_ref[0]                                    # (C, 1)
        C = ids.shape[0]
        # id-range gate (see pallas_fine2._kernel_tc attr phase): compacted
        # ids are ascending per supertile, so a chunk whose [min, max] id
        # range contains no selected id builds all-zero OH matrices and
        # contributes nothing — skip the K match passes, the MXU dots and
        # the output accumulate.  Large win on multi-chunk supertiles
        # (K=60/80 workloads, no-coarse fitting).
        mn_id = ids[0, 0]
        mx_id = jnp.max(ids)
        _sel = selt_ref[0]
        _ovl = jnp.max(jnp.where(
            (_sel >= mn_id) & (_sel <= mx_id), 1.0, 0.0)) > 0.0

        @pl.when(_ovl)
        def _():
            rft = rft_ref[0]                                # (FEAT, R)
            gp = gp_ref[0]                                      # (FEAT, C)

            def acc_k(k_sel, k_gk, k_gm, k_ga, k_w, carry):
                OHg, OHm, OHa, Wc = carry
                oh = jnp.where(ids == k_sel, 1.0, 0.0)          # (C, R)
                Wc = None if Wc is None else Wc + oh * k_w
                return (OHg + oh * k_gk, OHm + oh * k_gm, OHa + oh * k_ga, Wc)

            zero = jnp.zeros((C, R), jnp.float32)
            Wc0 = zero if n_attr else None
            if K <= _MAX_UNROLL_K:
                OHg, OHm, OHa, Wc = zero, zero, zero, Wc0
                for k in range(K):
                    OHg, OHm, OHa, Wc = acc_k(
                        selt_ref[0, k:k + 1, :], gk_s[k:k + 1, :],
                        gm_s[k:k + 1, :], ga_s[k:k + 1, :],
                        wt_ref[0, k:k + 1, :] if n_attr else None,
                        (OHg, OHm, OHa, Wc),
                    )
            elif n_attr:
                def body(k, carry):
                    return acc_k(
                        selt_ref[0, pl.ds(k, 1), :], gk_s[pl.ds(k, 1), :],
                        gm_s[pl.ds(k, 1), :], ga_s[pl.ds(k, 1), :],
                        wt_ref[0, pl.ds(k, 1), :], carry,
                    )
                OHg, OHm, OHa, Wc = jax.lax.fori_loop(
                    0, K, body, (zero, zero, zero, zero), unroll=False
                )
            else:
                def body(k, carry):
                    out = acc_k(
                        selt_ref[0, pl.ds(k, 1), :], gk_s[pl.ds(k, 1), :],
                        gm_s[pl.ds(k, 1), :], ga_s[pl.ds(k, 1), :], None,
                        carry + (None,),
                    )
                    return out[:3]
                OHg, OHm, OHa = jax.lax.fori_loop(
                    0, K, body, (zero, zero, zero), unroll=False
                )
                Wc = None

            # gauss side: (q, C) = dot over R of (q, R) ray rows with (C, R) OH
            # matrices — contraction dims (1, 1), no in-kernel transposes
            dotR = lambda aq, OH: jax.lax.dot_general(
                aq, OH, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            ones_row = rft[0:1, :] * 0.0 + 1.0                   # (1, R)
            T0 = dotR(ones_row, OHa)                             # (1, C)
            Tr = dotR(rft[0:3, :], OHm)                          # (3, C)
            Trr = dotR(rft[3:12, :], OHg)                        # (9, C)
            # feature combine IN-KERNEL as (1, C) plane-row ops (an XLA combine
            # over the (nb, M_max, 16) ROW-major table lane-slices/stacks cost
            # ~3.4 ms at the 10K benchmark — lane-dim shuffles):
            #   g_mu_i = sum_j L_ij Tr_j + T0 * sum_j (L_ij + L_ji) mu_j
            #   g_L_ij = Trr_ij + Tr_j mu_i + T0 * mu_i mu_j
            L = [[gp[4 + 3 * i + j: 5 + 3 * i + j, :] for j in range(3)]
                 for i in range(3)]
            mu = [gp[13 + i: 14 + i, :] for i in range(3)]
            Trj = [Tr[j:j + 1, :] for j in range(3)]
            g_mu = [
                sum(L[i][j] * Trj[j] for j in range(3))
                + T0 * sum((L[i][j] + L[j][i]) * mu[j] for j in range(3))
                for i in range(3)
            ]
            g_L = [
                Trr[3 * i + j: 3 * i + j + 1, :] + Trj[j] * mu[i]
                + T0 * mu[i] * mu[j]
                for i in range(3) for j in range(3)
            ]
            zrow = jnp.zeros_like(T0)
            rows = g_mu + g_L + [zrow] * (FEAT - 12)
            if n_attr:
                # d_attr[ca, c] = sum_r W[c, r] * g_img[ca, r] — the attr rows
                # of the gradient block (the match above already built W)
                rows.append(jax.lax.dot_general(
                    gimg_ref[0], Wc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ))                                               # (Ca, C)
            else:
                rows += [zrow] * (og_ref.shape[1] - FEAT)
            contrib = jnp.concatenate(rows, axis=0)              # (featw, C)
            off = csel_ref[b, c % n_c] * chunk
            og_ref[0, :, pl.ds(off, chunk)] = (
                og_ref[0, :, pl.ds(off, chunk)] + contrib
            )

            if want_rays:
                # rays side: standard (n, C) @ (C, R) matmuls with the sym /
                # A = Lambda^T mu rows built from the feature planes in-kernel
                sym = jnp.concatenate(
                    [L[i][j] + L[j][i] for i in range(3) for j in range(3)],
                    axis=0,
                )                                                # (9, C)
                dotC = lambda f, OH: jax.lax.dot_general(
                    f, OH, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                A = dotC(sym, OHg)                               # (9, R)
                Bv = dotC(gp[0:3, :], OHm)                       # (3, R)
                racc[0:3, :] = racc[0:3, :] + jnp.concatenate(
                    [
                        sum(A[3 * i + j:3 * i + j + 1, :] * rft[j:j + 1, :]
                            for j in range(3)) + Bv[i:i + 1, :]
                        for i in range(3)
                    ],
                    axis=0,
                )

    if want_rays:
        @pl.when(c == pl.num_programs(1) - 1)
        def _():
            ort_ref[0] = racc[:]


def fine_bwd_compact_t_pallas(
    rays_t,            # (nb, FEAT, R_pad) transposed ray features
    table_c,           # (nb, M_max, FEAT) compacted candidate rows
    ids_c,             # (nb, M_max, 1) int32 original ids (-1 pad)
    counts_c,          # (nb,) member counts
    raw,               # kernel-native (nb, Kp, R) primals: (idx, l, a, d[, w])
    g_t,               # transposed cotangents (gl_t, ga_t, gd_t[, gw_t])
    K: int, cand_chunk: int,
    dst, B: int, P_pad: int,
    agg_ow: float = 1.0, mode: str = "both", interpret: bool = False,
    pos_c=None, n_attr: int = 0, g_img_t=None, hitmask=None,
):
    """Transposed unified backward over the compacted candidate space.

    :param raw: the select kernel's native (nb, Kp, R) output buffers
        (idx, len, act, dsd[, w]) — free aliases of the forward outputs.
    :param g_t: transposed incoming cotangents; with a 4th element (gw_t)
        the erf-compositing weight fold runs in the kernel prologue.
    :param dst: inverse emission mapping for the gather scatter-back; pass
        ``None`` with ``pos_c`` set to fall back to the deterministic
        ``segment_sum`` scatter (same contract as
        :func:`fine_bwd_compact_pallas`).
    :param n_attr: >0 — ``table_c`` carries ``n_attr`` attribute columns
        after the FEAT feature columns and ``g_img_t`` (nb, Ca, R_pad) is
        the fused attribute image's cotangent: the attr VJP (d_attr rows +
        the d_w weight-cotangent fold) runs inside the kernel and the
        gauss-grads output grows to FEAT + n_attr rows (rows FEAT.. =
        d_attr).  Requires fold (a gw_t cotangent); the doubled-grid
        design is multi-chunk-safe (id-matched per chunk, accumulated
        across the candidate-chunk grid axis).
    :return: (gauss_grads (B, FEAT [+ n_attr], P_pad): rows 0..2 grad_mu,
        3..11 grad_Lambda;  ray_grads_t (nb, FEAT, R_pad) or None): same
        contract as :func:`fine_bwd_compact_pallas` modulo the transposed
        rays output.
    """
    from voge_tpu.ops.pallas_fine2 import (
        hit_visit_lists, prefix_visit_lists,
    )

    nb, M_max, featw = table_c.shape
    _, Kp, R_pad = raw[0].shape
    n_c = M_max // cand_chunk
    if hitmask is not None:
        # visit only chunks the forward marked as hit-producing (tuple:
        # (hm (nb, n_c_sel) int32, select cand_chunk)) — every selected
        # candidate's chunk is marked, so skipped chunks contribute zero
        hm, sel_cc = hitmask
        csel, counts = hit_visit_lists(hm, sel_cc, cand_chunk)
    else:
        csel, counts = prefix_visit_lists(counts_c, M_max, cand_chunk)
    fold = len(g_t) == 4
    want_rays = mode in ("both", "rays")
    assert featw == FEAT + int(n_attr), (table_c.shape, n_attr)
    if n_attr:
        assert fold and g_img_t is not None, (
            "fused attr backward needs the weight fold cotangent"
        )

    if fold:
        idx_t, l_t, a_t, d_t, w_t = raw
        gl_t, ga_t, gd_t, gw_t = g_t
    else:
        idx_t, l_t, a_t, d_t = raw[:4]
        w_t = None
        gl_t, ga_t, gd_t = g_t

    # candidate feature PLANES: one whole-array transpose (sym / A rows and
    # the gradient feature-combine are (1, C) row ops inside the kernel —
    # lane-dim stacks/slices of the ROW-major table in XLA cost ~3.4 ms at
    # the 10K benchmark)
    planes_c = jnp.swapaxes(table_c, 1, 2)                   # (nb, FEAT, M)

    kernel = functools.partial(
        _bwd_t_kernel, K=int(K), chunk=int(cand_chunk),
        want_rays=want_rays, fold=fold, ow=float(agg_ow),
        n_attr=int(n_attr),
    )
    if n_attr:
        # doubled chunk axis (d_w phase + gradient phase): both phases
        # stream the same visit list
        cmap = lambda b, c, cs, ct, _n=n_c: (b, cs[b, c % _n], 0)
        gmap = lambda b, c, cs, ct, _n=n_c: (b, 0, cs[b, c % _n])
    else:
        cmap = lambda b, c, cs, ct: (b, cs[b, c], 0)
        gmap = lambda b, c, cs, ct: (b, 0, cs[b, c])
    bmap = lambda b, c, cs, ct: (b, 0, 0)
    slot_t = pl.BlockSpec((1, Kp, R_pad), bmap, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, cand_chunk, 1), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, featw, cand_chunk), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, FEAT, R_pad), bmap, memory_space=pltpu.VMEM),
        slot_t, slot_t, slot_t, slot_t, slot_t, slot_t, slot_t,
    ]
    inputs = [ids_c, planes_c, rays_t, idx_t, l_t, a_t, d_t, gl_t, ga_t,
              gd_t]
    if fold:
        in_specs += [slot_t, slot_t]
        inputs += [w_t, gw_t]
    if n_attr:
        in_specs.append(
            pl.BlockSpec((1, n_attr, R_pad), bmap, memory_space=pltpu.VMEM)
        )
        inputs.append(g_img_t)
    og_spec = pl.BlockSpec((1, featw, M_max), bmap, memory_space=pltpu.VMEM)
    out_specs = [og_spec]
    out_shapes = [jax.ShapeDtypeStruct((nb, featw, M_max), jnp.float32)]
    if want_rays:
        out_specs.append(
            pl.BlockSpec((1, FEAT, R_pad), bmap, memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((nb, FEAT, R_pad), jnp.float32)
        )
    scratch = [pltpu.VMEM((Kp, R_pad), jnp.float32)] * 3
    if want_rays:
        scratch.append(pltpu.VMEM((FEAT, R_pad), jnp.float32))
    if n_attr:
        scratch.append(pltpu.VMEM((Kp, R_pad), jnp.float32))  # dw_s
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, (2 * n_c) if n_attr else n_c),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(csel, counts, *inputs)
    og = out[0]                                        # (nb, featw, M_max)
    rb_t = out[1] if want_rays else None
    rows = jnp.swapaxes(og, 1, 2).reshape(nb * M_max, featw)
    if dst is not None:
        gg = _gather_back(rows, dst, B, P_pad, nb * M_max)
        return jnp.swapaxes(gg, 1, 2), rb_t
    # segment_sum fallback (testing / no inverse-emission mapping)
    iota = jnp.arange(M_max, dtype=jnp.int32)[None]
    valid = iota < counts_c[:, None]
    img = jnp.arange(nb, dtype=jnp.int32)[:, None] // (nb // B)
    flat = jnp.where(valid, img * P_pad + pos_c, B * P_pad).reshape(-1)
    summed = jax.ops.segment_sum(rows, flat, num_segments=B * P_pad + 1)
    gg = summed[: B * P_pad].reshape(B, P_pad, featw)
    return jnp.swapaxes(gg, 1, 2), rb_t


def _common_specs(ray_chunk, cand_chunk, K, bh_bw, order, G=1):
    """BlockSpecs for (mask, gf, rf, sel, gl, ga, gd) under a grid index
    order: 'cbr' (c, b, r) or 'brc' (b, r, c)."""
    if order == "cbr":
        sel_map = lambda c, b, r: (b, r, 0)
        mask_map = lambda c, b, r: (b, 0, c)
        gf_map = lambda c, b, r, _bw=bh_bw: (b // _bw, 0, c)
        rf_map = lambda c, b, r: (b, r, 0)
    else:
        sel_map = lambda b, r, c: (b, r, 0)
        mask_map = lambda b, r, c: (b, 0, c)
        gf_map = lambda b, r, c, _bw=bh_bw: (b // _bw, 0, c)
        rf_map = lambda b, r, c: (b, r, 0)
    slot = pl.BlockSpec((1, ray_chunk, K), sel_map, memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec((1, G, cand_chunk), mask_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, FEAT, cand_chunk), gf_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cand_chunk), gf_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ray_chunk, FEAT), rf_map, memory_space=pltpu.VMEM),
        slot, slot, slot, slot,
    ]


def fine_bwd_gauss_pallas(
    rays_feat, gauss_feat, mask, ids, sel_b, gl_b, ga_b, gd_b,
    thr_act: float, K: int, bh_bw: int, n_gauss: int,
    ray_chunk: int, cand_chunk: int = 512, interpret: bool = False,
):
    """Per-Gaussian gradient planes (B, FEAT, P_pad): rows 0..2 = grad_mu,
    rows 3..11 = grad_Lambda."""
    nb, R_pad, _ = rays_feat.shape
    B, _, P_pad = gauss_feat.shape
    G = mask.shape[1]
    n_r = R_pad // ray_chunk
    n_c = P_pad // cand_chunk
    kernel = functools.partial(
        _bwd_gauss_kernel, thr_act=float(thr_act), K=int(K),
        chunk=int(cand_chunk), bh_bw=int(bh_bw), n_gauss=int(n_gauss),
    )
    return pl.pallas_call(
        kernel,
        grid=(n_c, nb, n_r),
        in_specs=_common_specs(ray_chunk, cand_chunk, K, bh_bw, "cbr", G=G),
        out_specs=pl.BlockSpec(
            (1, FEAT, cand_chunk),
            lambda c, b, r, _bw=int(bh_bw): (b // _bw, 0, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, FEAT, P_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mask, gauss_feat, ids, rays_feat, sel_b, gl_b, ga_b, gd_b)


def fine_bwd_rays_pallas(
    rays_feat, gauss_feat, mask, ids, sel_b, gl_b, ga_b, gd_b,
    thr_act: float, K: int, bh_bw: int, n_gauss: int,
    ray_chunk: int, cand_chunk: int = 512, interpret: bool = False,
):
    """Per-ray gradients (nb, R_pad, FEAT): cols 0..2 = grad_ray."""
    nb, R_pad, _ = rays_feat.shape
    B, _, P_pad = gauss_feat.shape
    G = mask.shape[1]
    n_r = R_pad // ray_chunk
    n_c = P_pad // cand_chunk
    kernel = functools.partial(
        _bwd_rays_kernel, thr_act=float(thr_act), K=int(K),
        chunk=int(cand_chunk), bh_bw=int(bh_bw), n_gauss=int(n_gauss),
    )
    return pl.pallas_call(
        kernel,
        grid=(nb, n_r, n_c),
        in_specs=_common_specs(ray_chunk, cand_chunk, K, bh_bw, "brc", G=G),
        out_specs=pl.BlockSpec(
            (1, ray_chunk, FEAT), lambda b, r, c: (b, r, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, R_pad, FEAT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ray_chunk, FEAT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mask, gauss_feat, ids, rays_feat, sel_b, gl_b, ga_b, gd_b)
