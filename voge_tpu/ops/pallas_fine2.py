"""Streaming mask-based Pallas fine kernel (v2).

Improves on :mod:`voge_tpu.ops.pallas_fine` by removing the per-bin
candidate *gather* and the coarse stage's per-Gaussian list *compaction*
entirely: Gaussian feature planes live once in HBM as a (16, P) matrix;
the kernel streams fixed-size candidate chunks through every bin, applies
the per-(bin, Gaussian) membership mask (the coarse culling, kept for
reference parity), and maintains a running top-K selection in VMEM scratch
across chunk grid steps — the flash-attention structure applied to top-K
selection.

Grid: (nb, n_ray_chunks, n_cand_chunks) — candidate chunks innermost so the
running state (scratch, persistent across grid steps) belongs to a fixed
(bin, ray-chunk) pair; initialized at c == 0, flushed to the outputs at
c == n_cand_chunks - 1.

Empty (bin, chunk) steps are skipped via a scalar-prefetched visit list:
per bin, the occupied chunk indices (in ascending order, preserving the
reference tie-break) are prefetched into SMEM and the block index maps
route step c to visit_list[b, c]; steps past the bin's occupied count
re-visit the previous chunk's blocks (no DMA re-fetch) and are predicated
off entirely.  With bin-coherent (Morton) candidate ordering upstream,
this removes the large majority of grid-step work for big scenes.

Tie-breaking matches the insertion order of the reference's per-pixel
insertion sort (``ray_trace_voge.cu:197-213``): the running state (earlier
chunks = lower Gaussian indices) is concatenated *before* the current
chunk, and argmin takes the first minimum.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voge_tpu.ops.pallas_fine import FEAT

_INF = 1e10
_RUNW = 128  # running-state lane width (>= K, lane-aligned)


def chunk_visit_lists(mask: jax.Array, n_c: int, cand_chunk: int):
    """Per-bin occupied-chunk visit lists for scalar prefetch.

    :param mask: (nb, G, P_pad) int8 membership
    :return: (csel (nb, n_c) int32, counts (nb,) int32).  ``csel[b, :cnt]``
        holds the occupied chunk indices in ascending order (preserving the
        reference's insertion-order tie-break); entries past ``cnt`` repeat
        the last occupied chunk so consecutive grid steps keep identical
        block indices (no DMA re-fetch).
    """
    nb = mask.shape[0]
    occ = (
        mask.reshape(nb, mask.shape[1], n_c, cand_chunk).max(axis=(1, 3)) > 0
    )                                                          # (nb, n_c)
    counts = occ.sum(axis=-1).astype(jnp.int32)
    iota = jnp.arange(n_c, dtype=jnp.int32)[None]
    # stable sort of (not occupied): occupied chunks first, ascending
    order = jnp.argsort(~occ, axis=1, stable=True).astype(jnp.int32)
    last = jnp.max(jnp.where(occ, iota, 0), axis=1)
    csel = jnp.where(iota < counts[:, None], order, last[:, None])
    return csel, counts


def _kernel_t(
    csel_ref,   # (nb, n_c) int32 SMEM: chunk visit list (scalar prefetch)
    cnt_ref,    # (nb,) int32 SMEM: occupied chunk count per bin
    mask_ref,   # (1, C, G) int8 membership (one column per sub-bin)
    gf_ref,     # (1, C, FEAT) f32 packed Gaussian feature table (batch b_img)
    ids_ref,    # (1, C, 1) int32 global flattened ORIGINAL candidate ids
    rf_ref,     # (1, FEAT, R) f32 ray feature planes (G sub-bins' rays)
    oi_ref, ol_ref, oa_ref, od_ref,   # (1, Kp, R) outputs
    run_len, run_act, run_dsd, run_idx,  # (Kp, R) scratch
    *, thr_act: float, K: int, chunk: int, bh_bw: int, n_gauss: int,
    sub_bins: int,
):
    """Transposed layout: candidates on SUBLANES, rays on LANES.

    Two wins over the lane-major variant: (a) the per-pass reductions of the
    K-extraction merge run along sublanes (3-step tails) instead of lanes
    (7-step cross-lane tails) -- the merge was reduction-tail-bound, ~2.3x;
    (b) the three quadratic forms become real MXU matmuls (C, 3) @ (3, R)
    and (C, 9) @ (9, R) instead of ~22 VPU outer-product passes.
    """
    c = pl.program_id(2)
    n_c = pl.num_programs(2)
    b = pl.program_id(0)

    rf = rf_ref[0]                      # (FEAT, R)
    tab = gf_ref[0]                     # (C, FEAT)
    m = mask_ref[0]                     # (C, G)
    R = rf.shape[1]
    C = tab.shape[0]
    G = m.shape[1]
    R_bin = R // G
    Kp = run_len.shape[0]

    @pl.when(c == 0)
    def _():
        run_len[:] = jnp.full((Kp, R), _INF, jnp.float32)
        run_act[:] = jnp.full((Kp, R), _INF, jnp.float32)
        run_dsd[:] = jnp.zeros((Kp, R), jnp.float32)
        run_idx[:] = jnp.full((Kp, R), -1, jnp.int32)

    # Only occupied chunks are visited (scalar-prefetched visit list); steps
    # past this bin's occupied count are repeats of the last occupied chunk
    # (same block indices => no DMA) and skipped entirely.
    @pl.when(c < cnt_ref[b])
    def _():
        # expand per-sub-bin membership columns to per-ray columns (ray lane
        # j belongs to sub-bin j // R_bin; lane-dim reshapes are unsupported
        # by Mosaic, so select by lane iota)
        lane_bin = jax.lax.broadcasted_iota(jnp.int32, (C, R), 1) // R_bin
        mexp = jnp.zeros((C, R), jnp.float32)
        for g in range(G):
            mexp = jnp.where(
                lane_bin == g, m[:, g : g + 1].astype(jnp.float32), mexp
            )
        msk = jax.lax.dot_general(
            tab[:, 0:3], rf[0:3, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # (C, R)
        ksk = jax.lax.dot_general(
            tab[:, 4:13], rf[3:12, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # (C, R)
        length = msk / ksk
        act = tab[:, 3:4] - msk * msk / ksk
        ok = (act < thr_act) & (mexp > 0.5)
        lm = jnp.where(ok, length, _INF)

        # global flattened ORIGINAL Gaussian ids come from the streamed ids
        # plane (supports bin-coherent candidate reordering upstream)
        gidx = jnp.broadcast_to(ids_ref[0], (C, R))

        # merge running state (first: earlier chunks win ties) with chunk
        cat_len = jnp.concatenate([run_len[:], lm], axis=0)
        cat_act = jnp.concatenate([run_act[:], act], axis=0)
        cat_dsd = jnp.concatenate([run_dsd[:], ksk], axis=0)
        cat_idx = jnp.concatenate([run_idx[:], gidx], axis=0)
        W = Kp + C
        sub_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)

        # K extraction passes.  jnp.argmin is ~10x slower than jnp.min on
        # Mosaic, so the first-minimum row is found with a second min over
        # the sublane iota (ties -> lowest row = the insertion-sort
        # tie-break).  Invalid slots extract junk payloads (mn == _INF
        # matches many rows); they are re-masked after the loop.
        new_len, new_act, new_dsd, new_idx = [], [], [], []
        for _ in range(K):
            mn = jnp.min(cat_len, axis=0, keepdims=True)
            oh0 = cat_len == mn
            am = jnp.min(jnp.where(oh0, sub_w, W), axis=0, keepdims=True)
            oh = sub_w == am
            new_len.append(mn)
            new_act.append(jnp.sum(jnp.where(oh, cat_act, 0.0), axis=0, keepdims=True))
            new_dsd.append(jnp.sum(jnp.where(oh, cat_dsd, 0.0), axis=0, keepdims=True))
            new_idx.append(jnp.sum(jnp.where(oh, cat_idx, 0), axis=0, keepdims=True))
            cat_len = jnp.where(oh, _INF, cat_len)

        k_len = jnp.concatenate(new_len, axis=0)               # (K, R)
        k_val = k_len < _INF
        k_act = jnp.where(k_val, jnp.concatenate(new_act, axis=0), _INF)
        k_dsd = jnp.where(k_val, jnp.concatenate(new_dsd, axis=0), 0.0)
        k_idx = jnp.where(k_val, jnp.concatenate(new_idx, axis=0), -1)

        pad = Kp - K
        run_len[:] = jnp.concatenate([k_len, jnp.full((pad, R), _INF, jnp.float32)], axis=0)
        run_act[:] = jnp.concatenate([k_act, jnp.full((pad, R), _INF, jnp.float32)], axis=0)
        run_dsd[:] = jnp.concatenate([k_dsd, jnp.zeros((pad, R), jnp.float32)], axis=0)
        run_idx[:] = jnp.concatenate([k_idx, jnp.full((pad, R), -1, jnp.int32)], axis=0)

    @pl.when(c == n_c - 1)
    def _():
        oi_ref[0] = run_idx[:]
        ol_ref[0] = run_len[:]
        oa_ref[0] = run_act[:]
        od_ref[0] = run_dsd[:]


def fine_select_mask_pallas(
    rays_feat: jax.Array,    # (nb, R_pad, FEAT) f32
    gauss_feat: jax.Array,   # (B, FEAT, P_pad) f32 per-camera feature planes
    mask: jax.Array,         # (nb, G, P_pad) int8 membership (0 beyond P)
    ids: jax.Array,          # (B, 1, P_pad) int32 global original ids
    thr_act: float,
    K: int,
    bh_bw: int,              # (super)bins per image; b_img = b // bh_bw
    n_gauss: int,            # P (unpadded), for global index offsets
    ray_chunk: int,
    cand_chunk: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    nb, R_pad, _ = rays_feat.shape
    P_pad = gauss_feat.shape[2]
    assert mask.ndim == 3
    assert ids.shape == (gauss_feat.shape[0], 1, P_pad)
    G = mask.shape[1]
    assert G == 1 or ray_chunk == R_pad, "sub-binned tiles need full-tile ray chunks"
    assert R_pad % ray_chunk == 0 and P_pad % cand_chunk == 0
    n_r = R_pad // ray_chunk
    n_c = P_pad // cand_chunk

    csel, counts = chunk_visit_lists(mask, n_c, cand_chunk)

    # transpose to candidate-major layout (candidates on sublanes)
    mask_t = jnp.swapaxes(mask, 1, 2)           # (nb, P_pad, G)
    table = jnp.swapaxes(gauss_feat, 1, 2)      # (B, P_pad, FEAT)
    ids_t = jnp.swapaxes(ids, 1, 2)             # (B, P_pad, 1)
    rays_t = jnp.swapaxes(rays_feat, 1, 2)      # (nb, FEAT, R_pad)

    Kp = max(8, -(-K // 8) * 8)
    grid = (nb, n_r, n_c)
    kernel = functools.partial(
        _kernel_t, thr_act=float(thr_act), K=int(K), chunk=int(cand_chunk),
        bh_bw=int(bh_bw), n_gauss=int(n_gauss), sub_bins=int(G),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nb, Kp, R_pad), jnp.int32),
        jax.ShapeDtypeStruct((nb, Kp, R_pad), jnp.float32),
        jax.ShapeDtypeStruct((nb, Kp, R_pad), jnp.float32),
        jax.ShapeDtypeStruct((nb, Kp, R_pad), jnp.float32),
    ]
    out_spec = pl.BlockSpec(
        (1, Kp, ray_chunk), lambda b, r, c, csel, cnt: (b, 0, r),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cand_chunk, G),
                         lambda b, r, c, csel, cnt: (b, csel[b, c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cand_chunk, FEAT),
                         lambda b, r, c, csel, cnt, _bw=int(bh_bw):
                             (b // _bw, csel[b, c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cand_chunk, 1),
                         lambda b, r, c, csel, cnt, _bw=int(bh_bw):
                             (b // _bw, csel[b, c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FEAT, ray_chunk),
                         lambda b, r, c, csel, cnt: (b, 0, r),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((Kp, ray_chunk), jnp.float32),
            pltpu.VMEM((Kp, ray_chunk), jnp.float32),
            pltpu.VMEM((Kp, ray_chunk), jnp.float32),
            pltpu.VMEM((Kp, ray_chunk), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * R_pad * P_pad * (15 + 6 * K),
            bytes_accessed=nb * P_pad * (17 * 4) // max(n_r, 1) + nb * R_pad * FEAT * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(csel, counts, mask_t, table, ids_t, rays_t)
    # back to ray-major (nb, R_pad, K) for downstream consumers
    return tuple(jnp.swapaxes(x, 1, 2)[:, :, :K] for x in out)
