"""Inverse rendering: pull image attributes back onto Gaussian kernels.

TPU-native replacement for the reference's atomic-scatter CUDA sampler
(``VoGE/Sampler.py`` + ``sample_voge.cu``): the scatter becomes a
deterministic ``segment_sum`` over flattened (pixel, slot) entries, which
JAX differentiates to exactly the reference's backward (grad_image gathers
``w * grad_feature[idx]``; grad_weight is ``<grad_feature[idx], image> +
grad_sum_weight[idx]``; cf. ``sample_voge.cu:173-209``).

On TPU, fragments produced by :func:`voge_tpu.renderer.render_pipeline`
carry the fused-compositing context, and the scatter runs as the fused
attribute-merge Pallas kernels instead: ``sample_features`` is exactly the
ADJOINT of the linear map ``attr -> interpolate_attr(frag, attr)`` (with the
image as the cotangent), and appending a ones channel to the image yields
the per-kernel weight sums in the same pass.  The flat segment_sum over
B*H*W*K entries is the single most expensive op of the ExtractTexture
workload (256x672, K=80: ~14M scattered rows); the fused path replaces it
with the already-streaming id-match + MXU contraction kernels of
:mod:`voge_tpu.ops.pallas_attr`.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_vert",))
def _sample_features(
    image: jax.Array, vert_weight: jax.Array, vert_index: jax.Array,
    num_vert: int,
) -> Tuple[jax.Array, jax.Array]:
    B, H, W, C = image.shape
    K = vert_weight.shape[-1]
    idx = vert_index.reshape(-1)
    valid = idx >= 0
    idxc = jnp.where(valid, idx, 0)
    w = vert_weight.reshape(-1) * valid.astype(vert_weight.dtype)
    img = jnp.broadcast_to(
        image.reshape(B * H * W, 1, C), (B * H * W, K, C)
    ).reshape(-1, C)
    vert_feature = jax.ops.segment_sum(
        w[:, None] * img, idxc, num_segments=num_vert
    )
    vert_sum_weight = jax.ops.segment_sum(w, idxc, num_segments=num_vert)
    return vert_feature, vert_sum_weight


# ---------------------------------------------------------------------------
# fused path (TPU): the attribute-merge kernels run the scatter
# ---------------------------------------------------------------------------

def _rows_to_out(orig: jax.Array, B: int, P: int, C: int, n_vert: int):
    """(B, P, Ca) per-kernel rows -> (feat (n_vert, C), wsum (n_vert,))."""
    rows = orig.reshape(B * P, orig.shape[-1])
    if n_vert > B * P:
        rows = jnp.pad(rows, ((0, n_vert - B * P), (0, 0)))
    return rows[:, :C], rows[:, C]


def _unsort_rows(sorted_rows: jax.Array, perm) -> jax.Array:
    """(B, P, Ca) rows in sorted candidate order -> original order.

    ``perm[b, j]`` is the original row of sorted slot j; invert with argsort
    (a scatter whose indices/updates share a producer crashes the TPU fusion
    pass — see DESIGN_NOTES round-2 finding 3).  ``perm=None`` (the
    emission-compacted production path keeps candidates in original order)
    is the identity — no argsort, no gather."""
    if perm is None:
        return sorted_rows
    inv = jnp.argsort(perm, axis=1).astype(jnp.int32)
    return jnp.take_along_axis(sorted_rows, inv[:, :, None], axis=1)


def _sort_planes(g_aug: jax.Array, perm, B, P, P_pad):
    """(n_vert, Ca) cotangent rows -> (B, Ca, P_pad) planes in sorted
    candidate order (the layout the attr kernels stream).  ``perm=None``
    means candidates are already in original order."""
    Ca = g_aug.shape[-1]
    rows = g_aug[: B * P].reshape(B, P, Ca)
    if perm is not None:
        rows = jnp.take_along_axis(rows, perm[:, :, None], axis=1)
    planes = jnp.swapaxes(rows, 1, 2)
    return jnp.pad(planes, ((0, 0), (0, 0), (0, P_pad - P)))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sample_core_c(st, w_k, sel_k, ids_c, pos_c, counts_c, dst, perm,
                   aug_k):
    """Fused sampler over the per-supertile COMPACTED candidate space.

    ``aug_k``: the (image ++ ones) channels binned to kernel layout
    (nst, R_kern, Ca).  Forward = the d_attr side of the attr-merge VJP
    (``pallas_attr._attr_bwd_call``); backward = (the attr-merge forward
    kernel for d_image, the d_w side for d_weight) — the adjoint pair
    swapped.  ``dst`` (inverse emission mapping, or None) turns the
    per-Gaussian scatter-back into a row gather
    (``pallas_attr.scatter_back_rows``)."""
    return _sample_core_c_fwd(st, w_k, sel_k, ids_c, pos_c, counts_c, dst,
                              perm, aug_k)[0]


def _sample_core_c_fwd(st, w_k, sel_k, ids_c, pos_c, counts_c, dst, perm,
                       aug_k):
    from voge_tpu.ops.pallas_attr import (
        _attr_bwd_call, _attr_cc, scatter_back_rows,
    )
    from voge_tpu.ops.pallas_fine2 import prefix_visit_lists

    B, P, P_pad, C, n_vert, interpret = st
    nb, M_max = pos_c.shape
    Ca = aug_k.shape[-1]
    cc = _attr_cc(M_max)
    csel, counts = prefix_visit_lists(counts_c, M_max, cc)
    ids_row = jnp.swapaxes(ids_c, 1, 2)
    w_eff = jnp.where(sel_k >= 0, w_k, 0.0)
    attr_zero = jnp.zeros((nb, Ca, M_max), jnp.float32)
    d_attr_c, _ = _attr_bwd_call(
        attr_zero, ids_row, sel_k, w_eff, aug_k, csel, counts,
        cand_chunk=cc, per_bin_cand=True, bh_bw=1, interpret=interpret,
    )
    # back to the sorted global space, exactly as the attr-merge VJP does
    rows = jnp.swapaxes(d_attr_c, 1, 2).reshape(nb * M_max, Ca)
    sorted_rows = scatter_back_rows(rows, pos_c, counts_c, B, P_pad,
                                    dst)[:, :P]
    out = _rows_to_out(_unsort_rows(sorted_rows, perm), B, P, C, n_vert)
    return out, (w_k, sel_k, ids_c, pos_c, counts_c, dst, perm, aug_k)


def _sample_core_c_bwd(st, res, g):
    from voge_tpu.ops.pallas_attr import (
        _attr_bwd_call, _attr_cc, _attr_fwd_call, _gather_attr_compact,
    )
    from voge_tpu.ops.pallas_fine2 import prefix_visit_lists

    B, P, P_pad, C, n_vert, interpret = st
    g_feat, g_wsum = g
    w_k, sel_k, ids_c, pos_c, counts_c, dst, perm, aug_k = res
    nb, M_max = pos_c.shape
    Ca = aug_k.shape[-1]
    g_aug = jnp.concatenate([g_feat, g_wsum[:, None]], axis=-1)
    if Ca > C + 1:
        g_aug = jnp.pad(g_aug, ((0, 0), (0, Ca - C - 1)))
    planes = _sort_planes(g_aug, perm, B, P, P_pad)
    cc = _attr_cc(M_max)
    csel, counts = prefix_visit_lists(counts_c, M_max, cc)
    ids_row = jnp.swapaxes(ids_c, 1, 2)
    w_eff = jnp.where(sel_k >= 0, w_k, 0.0)
    gattr_c = _gather_attr_compact(planes, pos_c, B, P_pad)
    # d_image[r] = sum_k w[r,k] * g_aug[sel[r,k]]  (the attr-merge forward)
    d_aug_k = _attr_fwd_call(
        gattr_c, ids_row, sel_k, w_eff, csel, counts,
        cand_chunk=cc, per_bin_cand=True, bh_bw=1, interpret=interpret,
    )
    # d_w[r,k] = <g_feat[sel], image[r]> + g_wsum[sel]  (the d_w side with
    # the roles of attr and cotangent swapped)
    _, d_w = _attr_bwd_call(
        gattr_c, ids_row, sel_k, w_eff, aug_k, csel, counts,
        cand_chunk=cc, per_bin_cand=True, bh_bw=1, interpret=interpret,
    )
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    g_perm = None if perm is None else f0(perm)
    g_dst = None if dst is None else jax.tree.map(f0, dst)
    return (d_w, f0(sel_k), f0(ids_c), f0(pos_c), f0(counts_c), g_dst,
            g_perm, d_aug_k)


_sample_core_c.defvjp(_sample_core_c_fwd, _sample_core_c_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sample_core_g(st, w_k, sel_k, mask_k, ids_p, perm, aug_k):
    """Fused sampler over the GLOBAL (uncompacted) candidate space (small
    scenes / no-coarse: the fine stage skipped per-supertile compaction)."""
    return _sample_core_g_fwd(st, w_k, sel_k, mask_k, ids_p, perm, aug_k)[0]


def _sample_core_g_fwd(st, w_k, sel_k, mask_k, ids_p, perm, aug_k):
    from voge_tpu.ops.pallas_attr import (
        attr_merge_bwd_attr_pallas, attr_merge_bwd_unified_pallas,
    )
    from voge_tpu.ops.pallas_fine import UNIFIED_BWD_MAX_PPAD

    B, P, P_pad, C, n_vert, interpret, bh_bw, cand_chunk = st
    Ca = aug_k.shape[-1]
    w_eff = jnp.where(sel_k >= 0, w_k, 0.0)
    attr_zero = jnp.zeros((B, Ca, P_pad), jnp.float32)
    if P_pad <= UNIFIED_BWD_MAX_PPAD:
        d_attr, _ = attr_merge_bwd_unified_pallas(
            attr_zero, w_eff, sel_k, mask_k, ids_p, aug_k, bh_bw, cand_chunk,
            interpret,
        )
    else:
        d_attr = attr_merge_bwd_attr_pallas(
            attr_zero, w_eff, sel_k, mask_k, ids_p, aug_k, bh_bw, cand_chunk,
            interpret,
        )
    sorted_rows = jnp.swapaxes(d_attr, 1, 2)[:, :P]
    out = _rows_to_out(_unsort_rows(sorted_rows, perm), B, P, C, n_vert)
    return out, (w_k, sel_k, mask_k, ids_p, perm, aug_k)


def _sample_core_g_bwd(st, res, g):
    from voge_tpu.ops.pallas_attr import (
        attr_merge_bwd_w_pallas, attr_merge_fwd_pallas,
    )

    B, P, P_pad, C, n_vert, interpret, bh_bw, cand_chunk = st
    g_feat, g_wsum = g
    w_k, sel_k, mask_k, ids_p, perm, aug_k = res
    Ca = aug_k.shape[-1]
    K = sel_k.shape[-1]
    g_aug = jnp.concatenate([g_feat, g_wsum[:, None]], axis=-1)
    if Ca > C + 1:
        g_aug = jnp.pad(g_aug, ((0, 0), (0, Ca - C - 1)))
    planes = _sort_planes(g_aug, perm, B, P, P_pad)
    w_eff = jnp.where(sel_k >= 0, w_k, 0.0)
    d_aug_k = attr_merge_fwd_pallas(
        planes, w_eff, sel_k, mask_k, ids_p, bh_bw, cand_chunk, interpret,
    )
    d_w = attr_merge_bwd_w_pallas(
        planes, sel_k, mask_k, ids_p, aug_k, K, bh_bw, cand_chunk, interpret,
    )
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    g_perm = None if perm is None else f0(perm)
    return d_w, f0(sel_k), f0(mask_k), f0(ids_p), g_perm, d_aug_k


_sample_core_g.defvjp(_sample_core_g_fwd, _sample_core_g_bwd)


def _sample_features_fused(frag, image: jax.Array, n_vert: int,
                           interpret: bool = False):
    """Dispatch the fused sampler from a ctx-carrying Fragments.  Returns
    None when the fragment layout cannot serve the request (caller falls
    back to the segment_sum path)."""
    from voge_tpu.ops.fine import _bin_hwk, _ceil_to, _group_supertiles

    geom = frag.attr_geom
    (B, H, W, BH, BW, bsh, bsw, grouped, bh_bw, chunk_or_mmax, P, P_pad,
     mode) = geom
    if n_vert < B * P:
        return None
    C = image.shape[-1]
    Ca = max(8, -(-(C + 1) // 8) * 8)
    aug = jnp.concatenate(
        [image.astype(jnp.float32),
         jnp.ones(image.shape[:3] + (1,), jnp.float32)], axis=-1,
    )
    if Ca > C + 1:
        aug = jnp.pad(aug, ((0, 0), (0, 0), (0, 0), (0, Ca - C - 1)))
    R_pad = _ceil_to(bsh * bsw, 8)
    aug_k = _bin_hwk(aug, BH, BW, bsh, bsw, H, W, R_pad, 0.0)
    if grouped:
        aug_k = _group_supertiles(aug_k, B, BH, BW)[0]
    ctx = frag.attr_ctx
    st = (B, P, P_pad, C, int(n_vert), bool(interpret))
    if mode == "c":
        sel_k, w_k, ids_c, pos_c, counts_c, perm, dst = ctx
        out = _sample_core_c(st, w_k, sel_k, ids_c, pos_c, counts_c, dst,
                             perm, aug_k)
    else:
        sel_k, w_k, mask_k, ids_p, perm = ctx
        st = st + (int(bh_bw), int(chunk_or_mmax))
        out = _sample_core_g(st, w_k, sel_k, mask_k, ids_p, perm, aug_k)
    # the segment_sum fallback follows dtype promotion from (image, weights);
    # the fused kernels compute in f32 — cast back so TPU and CPU agree
    dt = jnp.result_type(image.dtype, frag.vert_weight.dtype)
    return out[0].astype(dt), out[1].astype(dt)


def sample_features(frag, image: jax.Array, n_vert: Optional[int] = None):
    """Scatter pixel features onto kernels (reference ``Sampler.py:5-29``).

    Equivalent to (reference docstring):
        weight = zeros(image.shape[:3] + (n_vert,)).at[..., idx].set(w)
        vert_sum_weight = weight.sum((0, 1, 2))
        vert_feature = weight.reshape(-1, n_vert).T @ image.reshape(-1, C)

    :param frag: :class:`voge_tpu.renderer.Fragments`
    :param image: (B, H, W, C)
    :param n_vert: number of kernels; must be a concrete int under ``jit``.
        Default: ``max(vert_index) + 1`` (forces a sync; pass it explicitly
        in hot loops).
    :return: (vert_feature (N, C), vert_sum_weight (N,))
    """
    vert_weight = frag.vert_weight
    vert_index = frag.vert_index
    if n_vert is None:
        if hasattr(frag, "num_vertices"):
            n_vert = frag.num_vertices
        else:
            n_vert = int(vert_index.max()) + 1
    assert (
        vert_weight.shape[0] == image.shape[0]
        and vert_weight.shape[1] == image.shape[1]
        and vert_weight.shape[2] == image.shape[2]
    )
    ctx = getattr(frag, "attr_ctx", None)
    if ctx is not None and jax.default_backend() == "tpu":
        from voge_tpu.ops.fine import _kern_k_ok

        if _kern_k_ok(vert_index.shape[-1]):
            out = _sample_features_fused(frag, image, int(n_vert))
            if out is not None:
                return out
    return _sample_features(image, vert_weight, vert_index, int(n_vert))


@partial(jax.jit, static_argnames=("num_vert",))
def _scatter_max(vert_weight, vert_index, num_vert: int):
    idx = vert_index.reshape(-1)
    valid = idx >= 0
    idxc = jnp.where(valid, idx, 0)
    w = jnp.where(valid, vert_weight.reshape(-1), -jnp.inf)
    out = jax.ops.segment_max(w, idxc, num_segments=num_vert)
    # kernels never hit keep the CUDA initializer value (0)
    return jnp.where(jnp.isneginf(out), 0.0, out)


def scatter_max_weight(frag, n_vert: Optional[int] = None):
    """Per-kernel max weight (reference ``Sampler.py:32-42``;
    non-differentiable, like the CUDA ``_ScatterMax``)."""
    vert_index = frag.vert_index
    if n_vert is None:
        if hasattr(frag, "num_vertices"):
            n_vert = frag.num_vertices
        else:
            n_vert = int(vert_index.max()) + 1
    return jax.lax.stop_gradient(
        _scatter_max(frag.vert_weight, vert_index, int(n_vert))
    )
