"""Fused attribute compositing (``interpolate_attr``) Pallas kernels.

Replaces the XLA gather/scatter pair in ``merge_final`` (reference
``Aggregation.py:111-141``): the per-pixel attribute image

    img[r] = sum_k w[r, k] * attr[sel[r, k]]

is computed by streaming the same (supertile, candidate-chunk) structure as
the fine ray-tracing kernels (:mod:`voge_tpu.ops.pallas_fine2`): for each
occupied step, match the tile's selected original ids against the chunk's
ids plane (K lane-compares), collapse to a per-candidate weight matrix
W[r, j] = sum_k (sel[r,k] == ids[j]) * w[r,k], and contract with the
chunk's attribute planes on the MXU.  Backward reuses the identical match:

    d_attr[j]  += sum_r W[r, j] * g_img[r]          (chunk-outermost grid)
    d_w[r, k]   = s[r, j(r,k)],  s = g_img @ attr   (chunk-innermost grid)

No gathers, no scatters, deterministic; empty steps are skipped like the
fine kernels.  At the 10K-Gaussian / 256^2 benchmark this replaces ~20 ms
of XLA gather + scatter-add with ~3 ms of kernels.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voge_tpu.ops.pallas_fine import _MAX_UNROLL_K


_PREC = jax.lax.Precision.HIGHEST


def _lane_extract(x, k, zero):
    """x[:, k:k+1] for traced k: one-hot lane reduction of an (R, K) block."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
    return jnp.sum(jnp.where(lane == k, x, zero), axis=1, keepdims=True)


def _match_weight(sel, w, ids, R, C, K):
    """W[r, j] = sum_k (sel[r, k] == ids[j]) * w[r, k] — the per-candidate
    collapsed weight matrix (R, C)."""
    if K <= _MAX_UNROLL_K:
        Wc = jnp.zeros((R, C), jnp.float32)
        for k in range(K):
            oh = sel[:, k : k + 1] == ids
            Wc = Wc + jnp.where(oh, w[:, k : k + 1], 0.0)
        return Wc

    def body(k, Wc):
        oh = _lane_extract(sel, k, 0) == ids
        return Wc + jnp.where(oh, _lane_extract(w, k, 0.0), 0.0)

    return jax.lax.fori_loop(
        0, K, body, jnp.zeros((R, C), jnp.float32), unroll=False
    )


def _fwd_kernel(csel_ref, cnt_ref, attr_ref, ids_ref, sel_ref, w_ref,
                out_ref, acc, *, K: int):
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(c < cnt_ref[b])
    def _():
        sel = sel_ref[0]
        R, C = sel.shape[0], ids_ref.shape[2]
        Wc = _match_weight(sel, w_ref[0], ids_ref[0], R, C, K)
        # (R, C) @ (Ca, C)^T on the MXU
        acc[:] = acc[:] + jax.lax.dot_general(
            Wc, attr_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )

    @pl.when(c == n_c - 1)
    def _():
        out_ref[0] = acc[:]


def _bwd_unified_kernel(csel_ref, cnt_ref, attr_ref, ids_ref, sel_ref, w_ref,
                        g_ref, oa_ref, ow_ref, acc_w, *, K: int, chunk: int,
                        bh_bw: int):
    """Both backward outputs in one pass: the K-compare id match (the
    dominant cost) is shared between d_attr and d_w."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when((b % bh_bw == 0) & (c == 0))
    def _():
        oa_ref[0] = jnp.zeros_like(oa_ref[0])

    @pl.when(c == 0)
    def _():
        acc_w[:] = jnp.zeros_like(acc_w)

    @pl.when(c < cnt_ref[b])
    def _():
        sel = sel_ref[0]
        ids = ids_ref[0]
        w = w_ref[0]
        g = g_ref[0]
        R, C = sel.shape[0], ids.shape[1]
        # s[r, j] = g_img[r] . attr[j]  — (R, Ca) @ (Ca, C).  Padding slots
        # (id == -1) can match invalid selections (also -1); in a compacted
        # candidate table they carry real gathered attribute rows, so gate
        # them out of the d_w extraction.
        s = jax.lax.dot_general(
            g, attr_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )
        s = jnp.where(ids >= 0, s, 0.0)
        Kpad = acc_w.shape[1]
        if K <= _MAX_UNROLL_K:
            Wc = jnp.zeros((R, C), jnp.float32)
            cols = []
            for k in range(K):
                oh = sel[:, k : k + 1] == ids
                Wc = Wc + jnp.where(oh, w[:, k : k + 1], 0.0)
                cols.append(
                    jnp.sum(jnp.where(oh, s, 0.0), axis=1, keepdims=True)
                )
            if Kpad > K:
                cols.append(jnp.zeros((R, Kpad - K), jnp.float32))
            acc_w[:] = acc_w[:] + jnp.concatenate(cols, axis=1)
        else:
            lanep = jax.lax.broadcasted_iota(jnp.int32, (1, Kpad), 1)

            def body(k, carry):
                Wc, dw = carry
                oh = _lane_extract(sel, k, 0) == ids
                Wc = Wc + jnp.where(oh, _lane_extract(w, k, 0.0), 0.0)
                colk = jnp.sum(jnp.where(oh, s, 0.0), axis=1, keepdims=True)
                return Wc, dw + jnp.where(lanep == k, colk, 0.0)

            Wc, dw = jax.lax.fori_loop(
                0, K, body,
                (jnp.zeros((R, C), jnp.float32),
                 jnp.zeros((R, Kpad), jnp.float32)),
                unroll=False,
            )
            acc_w[:] = acc_w[:] + dw
        # d_attr[j] += sum_r W[r, j] * g_img[r]: (Ca, R) @ (R, C)
        contrib = jax.lax.dot_general(
            g, Wc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )
        off = csel_ref[b, c] * chunk
        oa_ref[0, :, pl.ds(off, chunk)] = (
            oa_ref[0, :, pl.ds(off, chunk)] + contrib
        )

    @pl.when(c == n_c - 1)
    def _():
        ow_ref[0] = acc_w[:, :K]


def _bwd_attr_kernel(mask_ref, attr_ref, ids_ref, sel_ref, w_ref, g_ref,
                     out_ref, *, K: int, bh_bw: int):
    b = pl.program_id(1)

    @pl.when(b % bh_bw == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    m = mask_ref[0]

    @pl.when(jnp.max(m.astype(jnp.float32)) > 0.5)
    def _():
        sel = sel_ref[0]
        R, C = sel.shape[0], ids_ref.shape[2]
        Wc = _match_weight(sel, w_ref[0], ids_ref[0], R, C, K)
        # (Ca, R) @ (R, C): contract rays
        out_ref[0] = out_ref[0] + jax.lax.dot_general(
            g_ref[0], Wc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )


def _bwd_w_kernel(mask_ref, attr_ref, ids_ref, sel_ref, g_ref, out_ref, acc,
                  *, K: int):
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    m = mask_ref[0]

    @pl.when(jnp.max(m.astype(jnp.float32)) > 0.5)
    def _():
        sel = sel_ref[0]
        ids = ids_ref[0]
        R, C = sel.shape[0], ids.shape[1]
        # s[r, j] = g_img[r] . attr[j]  — (R, Ca) @ (Ca, C)
        s = jax.lax.dot_general(
            g_ref[0], attr_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )
        Kpad = acc.shape[1]
        if K <= _MAX_UNROLL_K:
            cols = []
            for k in range(K):
                oh = sel[:, k : k + 1] == ids
                cols.append(
                    jnp.sum(jnp.where(oh, s, 0.0), axis=1, keepdims=True)
                )
            if Kpad > K:
                cols.append(jnp.zeros((R, Kpad - K), jnp.float32))
            acc[:] = acc[:] + jnp.concatenate(cols, axis=1)
        else:
            lanep = jax.lax.broadcasted_iota(jnp.int32, (1, Kpad), 1)

            def body(k, dw):
                oh = _lane_extract(sel, k, 0) == ids
                colk = jnp.sum(jnp.where(oh, s, 0.0), axis=1, keepdims=True)
                return dw + jnp.where(lanep == k, colk, 0.0)

            acc[:] = acc[:] + jax.lax.fori_loop(
                0, K, body, jnp.zeros((R, Kpad), jnp.float32), unroll=False
            )

    @pl.when(c == n_c - 1)
    def _():
        out_ref[0] = acc[:, :K]


def gather_back_rows(rows, dst, B: int, P_pad: int, dump: int):
    """Per-Gaussian gradient rows via the inverse emission mapping.

    ``rows``: (nb*M_max, FEAT) per-slot gradient rows; ``dst`` =
    (dst_l (B, P, 9), dst_g (B, ng, nst), gpos (B, ng), g_valid (B, ng))
    from ``emit_supertile_candidates(return_dst=True)``.  Returns
    (B, P_pad, FEAT)."""
    dst_l, dst_g, gpos, g_valid = dst
    B_, P, nine = dst_l.shape
    Ca = rows.shape[1]
    rows = jnp.concatenate([rows, jnp.zeros((1, Ca), rows.dtype)], axis=0)
    src_l = jnp.where(dst_l >= 0, dst_l, dump).reshape(-1)
    gg = rows[src_l].reshape(B, P, nine, Ca).sum(axis=2)     # (B, P, Ca)
    ng = dst_g.shape[1]
    if ng:
        src_g = jnp.where(dst_g >= 0, dst_g, dump).reshape(-1)
        gst = rows[src_g].reshape(B, ng, -1, Ca).sum(axis=2)
        gst = jnp.where(g_valid[..., None], gst, 0.0)
        gg = gg.at[jnp.arange(B)[:, None], gpos].add(gst)
    if P_pad > P:
        gg = jnp.pad(gg, ((0, 0), (0, P_pad - P), (0, 0)))
    return gg


def _spec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def attr_merge_fwd_pallas(
    attr_planes: jax.Array,  # (B, Ca_pad, P_pad) f32 candidate-order planes
    w_b: jax.Array,          # (nb, R, K) f32 slot weights (invalid -> 0)
    sel_b: jax.Array,        # (nb, R, K) int32 original global ids (-1 pad)
    mask_k: jax.Array,       # (nb, G, P_pad) int8 membership
    ids_p: jax.Array,        # (B, 1, P_pad) int32
    bh_bw: int, cand_chunk: int, interpret: bool = False,
) -> jax.Array:
    from voge_tpu.ops.pallas_fine2 import chunk_visit_lists

    nb, R, K = w_b.shape
    P_pad = attr_planes.shape[2]
    n_c = P_pad // cand_chunk
    csel, counts = chunk_visit_lists(mask_k, n_c, cand_chunk)
    return _attr_fwd_call(
        attr_planes, ids_p, sel_b, w_b, csel, counts,
        cand_chunk=cand_chunk, per_bin_cand=False, bh_bw=bh_bw,
        interpret=interpret,
    )


def _attr_fwd_call(attr_planes, ids_p, sel_b, w_b, csel, counts,
                   cand_chunk, per_bin_cand, bh_bw, interpret):
    nb, R, K = w_b.shape
    NB, Ca, C_total = attr_planes.shape
    n_c = C_total // cand_chunk
    if per_bin_cand:
        cmap = lambda b, c, cs, ct: (b, 0, cs[b, c])
    else:
        cmap = lambda b, c, cs, ct, _w=int(bh_bw): (b // _w, 0, cs[b, c])
    kern = functools.partial(_fwd_kernel, K=int(K))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_c),
        in_specs=[
            _spec((1, Ca, cand_chunk), cmap),
            _spec((1, 1, cand_chunk), cmap),
            _spec((1, R, K), lambda b, c, cs, ct: (b, 0, 0)),
            _spec((1, R, K), lambda b, c, cs, ct: (b, 0, 0)),
        ],
        out_specs=_spec((1, R, Ca), lambda b, c, cs, ct: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((R, Ca), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, Ca), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(csel, counts, attr_planes, ids_p, sel_b, w_b)


def attr_merge_bwd_attr_pallas(
    attr_planes, w_b, sel_b, mask_k, ids_p, g_img,  # g_img (nb, R, Ca)
    bh_bw: int, cand_chunk: int, interpret: bool = False,
) -> jax.Array:
    nb, R, K = w_b.shape
    B, Ca, P_pad = attr_planes.shape
    G = mask_k.shape[1]
    n_c = P_pad // cand_chunk
    kern = functools.partial(_bwd_attr_kernel, K=int(K), bh_bw=int(bh_bw))
    return pl.pallas_call(
        kern,
        grid=(n_c, nb),
        in_specs=[
            _spec((1, G, cand_chunk), lambda c, b: (b, 0, c)),
            _spec((1, Ca, cand_chunk), lambda c, b, _w=bh_bw: (b // _w, 0, c)),
            _spec((1, 1, cand_chunk), lambda c, b, _w=bh_bw: (b // _w, 0, c)),
            _spec((1, R, K), lambda c, b: (b, 0, 0)),
            _spec((1, R, K), lambda c, b: (b, 0, 0)),
            _spec((1, R, Ca), lambda c, b: (b, 0, 0)),
        ],
        out_specs=_spec((1, Ca, cand_chunk),
                        lambda c, b, _w=bh_bw: (b // _w, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, Ca, P_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(mask_k, attr_planes, ids_p, sel_b, w_b, g_img)


def attr_merge_bwd_w_pallas(
    attr_planes, sel_b, mask_k, ids_p, g_img,
    K: int, bh_bw: int, cand_chunk: int, interpret: bool = False,
) -> jax.Array:
    nb, R, Ca = g_img.shape
    B, _, P_pad = attr_planes.shape
    G = mask_k.shape[1]
    n_c = P_pad // cand_chunk
    Kpad = max(8, -(-K // 8) * 8)
    kern = functools.partial(_bwd_w_kernel, K=int(K))
    return pl.pallas_call(
        kern,
        grid=(nb, n_c),
        in_specs=[
            _spec((1, G, cand_chunk), lambda b, c: (b, 0, c)),
            _spec((1, Ca, cand_chunk), lambda b, c, _w=bh_bw: (b // _w, 0, c)),
            _spec((1, 1, cand_chunk), lambda b, c, _w=bh_bw: (b // _w, 0, c)),
            _spec((1, R, K), lambda b, c: (b, 0, 0)),
            _spec((1, R, Ca), lambda b, c: (b, 0, 0)),
        ],
        out_specs=_spec((1, R, K), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, R, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, Kpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(mask_k, attr_planes, ids_p, sel_b, g_img)


def attr_merge_bwd_unified_pallas(
    attr_planes, w_b, sel_b, mask_k, ids_p, g_img,
    bh_bw: int, cand_chunk: int, interpret: bool = False,
):
    """(d_attr (B, Ca, P_pad), d_w (nb, R, K)) in one streaming pass.

    The K-compare id match is computed once and shared; d_attr accumulates
    into a full-width plane block at the visit list's dynamic chunk offset
    (cf. ``fine_bwd_unified_pallas``)."""
    from voge_tpu.ops.pallas_fine2 import chunk_visit_lists

    P_pad = attr_planes.shape[2]
    n_c = P_pad // cand_chunk
    csel, counts = chunk_visit_lists(mask_k, n_c, cand_chunk)
    return _attr_bwd_call(
        attr_planes, ids_p, sel_b, w_b, g_img, csel, counts,
        cand_chunk=cand_chunk, per_bin_cand=False, bh_bw=bh_bw,
        interpret=interpret,
    )


def _attr_bwd_call(attr_planes, ids_p, sel_b, w_b, g_img, csel, counts,
                   cand_chunk, per_bin_cand, bh_bw, interpret):
    nb, R, K = w_b.shape
    NB, Ca, C_total = attr_planes.shape
    n_c = C_total // cand_chunk
    Kpad = max(8, -(-K // 8) * 8)
    if per_bin_cand:
        cmap = lambda b, c, cs, ct: (b, 0, cs[b, c])
        omap = lambda b, c, cs, ct: (b, 0, 0)
        eff_bh_bw = 1
        out_bins = nb
    else:
        cmap = lambda b, c, cs, ct, _w=int(bh_bw): (b // _w, 0, cs[b, c])
        omap = lambda b, c, cs, ct, _w=int(bh_bw): (b // _w, 0, 0)
        eff_bh_bw = bh_bw
        out_bins = NB
    kern = functools.partial(
        _bwd_unified_kernel, K=int(K), chunk=int(cand_chunk),
        bh_bw=int(eff_bh_bw),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_c),
        in_specs=[
            _spec((1, Ca, cand_chunk), cmap),
            _spec((1, 1, cand_chunk), cmap),
            _spec((1, R, K), lambda b, c, cs, ct: (b, 0, 0)),
            _spec((1, R, K), lambda b, c, cs, ct: (b, 0, 0)),
            _spec((1, R, Ca), lambda b, c, cs, ct: (b, 0, 0)),
        ],
        out_specs=[
            _spec((1, Ca, C_total), omap),
            _spec((1, R, K), lambda b, c, cs, ct: (b, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((R, Kpad), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_bins, Ca, C_total), jnp.float32),
            jax.ShapeDtypeStruct((nb, R, K), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(csel, counts, attr_planes, ids_p, sel_b, w_b, g_img)


# ---------------------------------------------------------------------------
# compacted-candidate custom VJP (production path)
# ---------------------------------------------------------------------------

def _gather_attr_compact(attr_planes, pos_c, B, P_pad):
    """(B, Ca, P_pad) sorted-order planes -> (nb, Ca, M_max) per-supertile
    compacted planes via one flat row-gather."""
    nb, M_max = pos_c.shape
    Ca = attr_planes.shape[1]
    rows = jnp.swapaxes(attr_planes, 1, 2).reshape(B * P_pad, Ca)
    img = jnp.arange(nb, dtype=jnp.int32)[:, None] // (nb // B)
    flat = (img * P_pad + pos_c).reshape(-1)
    g = rows[flat].reshape(nb, M_max, Ca)
    return jnp.swapaxes(g, 1, 2)


def _attr_cc(M_max: int) -> int:
    opts = [c for c in (1024, 512, 256, 128) if M_max % c == 0]
    return max(opts) if opts else M_max


def scatter_back_rows(rows, pos_c, counts_c, B, P_pad, dst=None):
    """(nb*M_max, Ca) per-slot rows -> (B, P_pad, Ca) per-Gaussian rows.

    With ``dst`` (the inverse emission mapping from
    ``emit_supertile_candidates(return_dst=True)``) this is a <=9-wide row
    GATHER per Gaussian (:func:`gather_back_rows`); without it, the
    deterministic ``segment_sum`` scatter (~3x slower at the 10K
    benchmark's 86K rows)."""
    nb, M_max = pos_c.shape
    if dst is not None:
        return gather_back_rows(rows, dst, B, P_pad, nb * M_max)
    Ca = rows.shape[1]
    iota = jnp.arange(M_max, dtype=jnp.int32)[None]
    valid = iota < counts_c[:, None]
    img = jnp.arange(nb, dtype=jnp.int32)[:, None] // (nb // B)
    flat = jnp.where(valid, img * P_pad + pos_c, B * P_pad).reshape(-1)
    summed = jax.ops.segment_sum(rows, flat, num_segments=B * P_pad + 1)
    return summed[: B * P_pad].reshape(B, P_pad, Ca)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def attr_merge_compact(attr_planes, w_b, sel_b, ids_c, pos_c, counts_c,
                       dst, B, interpret=False):
    """img_b[r] = sum_k w_b[r, k] * attr[sel_b[r, k]] over the per-supertile
    COMPACTED candidate space.

    :param attr_planes: (B, Ca_pad, P_pad) attribute planes in sorted
        candidate order
    :param w_b / sel_b: (nb, R, K) weights / original global ids
    :param ids_c / pos_c / counts_c: compaction context from the fine stage
    :param dst: inverse emission mapping (or None) — see
        :func:`scatter_back_rows`; used by the backward only
    :return: (nb, R, Ca_pad)
    """
    return _attr_merge_compact_fwd(
        attr_planes, w_b, sel_b, ids_c, pos_c, counts_c, dst, B, interpret
    )[0]


def _attr_merge_compact_fwd(attr_planes, w_b, sel_b, ids_c, pos_c, counts_c,
                            dst, B, interpret):
    from voge_tpu.ops.pallas_fine2 import prefix_visit_lists

    P_pad = attr_planes.shape[2]
    M_max = pos_c.shape[1]
    cc = _attr_cc(M_max)
    csel, counts = prefix_visit_lists(counts_c, M_max, cc)
    attr_c = _gather_attr_compact(attr_planes, pos_c, B, P_pad)
    ids_row = jnp.swapaxes(ids_c, 1, 2)
    out = _attr_fwd_call(
        attr_c, ids_row, sel_b, w_b, csel, counts,
        cand_chunk=cc, per_bin_cand=True, bh_bw=1, interpret=interpret,
    )
    return out, (attr_c, w_b, sel_b, ids_c, pos_c, counts_c, dst, P_pad)


def _attr_merge_compact_bwd(B, interpret, res, g):
    from voge_tpu.ops.pallas_fine2 import prefix_visit_lists

    attr_c, w_b, sel_b, ids_c, pos_c, counts_c, dst, P_pad = res
    nb, M_max = pos_c.shape
    Ca = attr_c.shape[1]
    cc = _attr_cc(M_max)
    csel, counts = prefix_visit_lists(counts_c, M_max, cc)
    ids_row = jnp.swapaxes(ids_c, 1, 2)
    d_attr_c, d_w = _attr_bwd_call(
        attr_c, ids_row, sel_b, w_b, g, csel, counts,
        cand_chunk=cc, per_bin_cand=True, bh_bw=1, interpret=interpret,
    )
    rows = jnp.swapaxes(d_attr_c, 1, 2).reshape(nb * M_max, Ca)
    d_attr = jnp.swapaxes(
        scatter_back_rows(rows, pos_c, counts_c, B, P_pad, dst), 1, 2
    )
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    g_dst = None if dst is None else jax.tree.map(f0, dst)
    return (d_attr, d_w, f0(sel_b), f0(ids_c), f0(pos_c), f0(counts_c),
            g_dst)


attr_merge_compact.defvjp(_attr_merge_compact_fwd, _attr_merge_compact_bwd)


# ---------------------------------------------------------------------------
# custom-VJP wrapper (kernel layout)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def attr_merge_binned(attr_planes, w_b, sel_b, mask_k, ids_p,
                      bh_bw, cand_chunk, interpret=False):
    """img_b[r] = sum_k w_b[r, k] * attr[sel_b[r, k]] in kernel layout.

    :param attr_planes: (B, Ca_pad, P_pad) attribute planes in the SAME
        candidate order the ids plane describes (sorted space)
    :param w_b / sel_b: (nb, R, K) weights / original global ids
    :return: (nb, R, Ca_pad)
    """
    return attr_merge_fwd_pallas(
        attr_planes, w_b, sel_b, mask_k, ids_p, bh_bw, cand_chunk, interpret
    )


def _attr_merge_fwd(attr_planes, w_b, sel_b, mask_k, ids_p,
                    bh_bw, cand_chunk, interpret):
    out = attr_merge_fwd_pallas(
        attr_planes, w_b, sel_b, mask_k, ids_p, bh_bw, cand_chunk, interpret
    )
    return out, (attr_planes, w_b, sel_b, mask_k, ids_p)


def _attr_merge_bwd(bh_bw, cand_chunk, interpret, res, g):
    from voge_tpu.ops.pallas_fine import UNIFIED_BWD_MAX_PPAD

    attr_planes, w_b, sel_b, mask_k, ids_p = res
    K = w_b.shape[2]
    if attr_planes.shape[2] <= UNIFIED_BWD_MAX_PPAD:
        d_attr, d_w = attr_merge_bwd_unified_pallas(
            attr_planes, w_b, sel_b, mask_k, ids_p, g, bh_bw, cand_chunk,
            interpret,
        )
    else:
        d_attr = attr_merge_bwd_attr_pallas(
            attr_planes, w_b, sel_b, mask_k, ids_p, g, bh_bw, cand_chunk,
            interpret,
        )
        d_w = attr_merge_bwd_w_pallas(
            attr_planes, sel_b, mask_k, ids_p, g, K, bh_bw, cand_chunk,
            interpret,
        )
    g_sel = np.zeros(sel_b.shape, dtype=jax.dtypes.float0)
    g_mask = np.zeros(mask_k.shape, dtype=jax.dtypes.float0)
    g_ids = np.zeros(ids_p.shape, dtype=jax.dtypes.float0)
    return d_attr, d_w, g_sel, g_mask, g_ids


attr_merge_binned.defvjp(_attr_merge_fwd, _attr_merge_bwd)
