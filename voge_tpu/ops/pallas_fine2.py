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


def _kernel(
    mask_ref,   # (1, G, C) int8 membership (one row per sub-bin)
    gf_ref,     # (1, FEAT, C) f32 Gaussian feature planes (batch b_img)
    ids_ref,    # (1, 1, C) int32 global flattened ORIGINAL candidate ids
    rf_ref,     # (1, R, FEAT) f32 ray features (G sub-bins' rays stacked)
    oi_ref, ol_ref, oa_ref, od_ref,   # (1, R, K) outputs
    run_len, run_act, run_dsd, run_idx,  # (R, _RUNW) scratch
    *, thr_act: float, K: int, chunk: int, bh_bw: int, n_gauss: int,
    sub_bins: int,
):
    c = pl.program_id(2)
    n_c = pl.num_programs(2)
    b = pl.program_id(0)

    rf = rf_ref[0]                      # (R, FEAT)
    gf = gf_ref[0]                      # (FEAT, C)
    m = mask_ref[0]                     # (G, C)
    R = rf.shape[0]
    C = gf.shape[1]
    G = m.shape[0]
    R_bin = R // G

    @pl.when(c == 0)
    def _():
        run_len[:] = jnp.full((R, _RUNW), _INF, jnp.float32)
        run_act[:] = jnp.full((R, _RUNW), _INF, jnp.float32)
        run_dsd[:] = jnp.zeros((R, _RUNW), jnp.float32)
        run_idx[:] = jnp.full((R, _RUNW), -1, jnp.int32)

    # Skip chunks with no bin members entirely — with the coarse mask's
    # typical density (<1%) the vast majority of (bin, chunk) steps are
    # empty and the K-pass merge below is by far the dominant cost.
    mf = m.astype(jnp.float32)
    # expand per-sub-bin rows to per-ray rows
    mexp = jnp.broadcast_to(mf[:, None, :], (G, R_bin, C)).reshape(R, C)

    @pl.when(jnp.max(mf) > 0.5)
    def _():
        msk = (
            rf[:, 0:1] * gf[0:1, :]
            + rf[:, 1:2] * gf[1:2, :]
            + rf[:, 2:3] * gf[2:3, :]
        )
        ksk = rf[:, 3:4] * gf[4:5, :]
        for q in range(1, 9):
            ksk = ksk + rf[:, 3 + q : 4 + q] * gf[4 + q : 5 + q, :]
        length = msk / ksk
        act = gf[3:4, :] - msk * msk / ksk
        ok = (act < thr_act) & (mexp > 0.5)
        lm = jnp.where(ok, length, _INF)

        # global flattened ORIGINAL Gaussian ids come from the streamed ids
        # plane (supports bin-coherent candidate reordering upstream)
        gidx = jnp.broadcast_to(ids_ref[0], (R, C))

        # merge running state (first: earlier chunks win ties) with chunk
        cat_len = jnp.concatenate([run_len[:], lm], axis=1)
        cat_act = jnp.concatenate([run_act[:], act], axis=1)
        cat_dsd = jnp.concatenate([run_dsd[:], ksk], axis=1)
        cat_idx = jnp.concatenate([run_idx[:], gidx], axis=1)
        W = _RUNW + C
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

        new_len, new_act, new_dsd, new_idx = [], [], [], []
        for _ in range(K):
            mn = jnp.min(cat_len, axis=1, keepdims=True)
            am = jnp.argmin(cat_len, axis=1)
            oh = lane_w == am[:, None]
            valid = mn < _INF
            new_len.append(jnp.where(valid, mn, _INF))
            new_act.append(
                jnp.where(valid, jnp.sum(jnp.where(oh, cat_act, 0.0), axis=1, keepdims=True), _INF)
            )
            new_dsd.append(
                jnp.where(valid, jnp.sum(jnp.where(oh, cat_dsd, 0.0), axis=1, keepdims=True), 0.0)
            )
            new_idx.append(
                jnp.where(valid, jnp.sum(jnp.where(oh, cat_idx, 0), axis=1, keepdims=True), -1)
            )
            cat_len = jnp.where(oh, _INF, cat_len)

        pad = _RUNW - K
        run_len[:] = jnp.concatenate(new_len + [jnp.full((R, pad), _INF, jnp.float32)], axis=1)
        run_act[:] = jnp.concatenate(new_act + [jnp.full((R, pad), _INF, jnp.float32)], axis=1)
        run_dsd[:] = jnp.concatenate(new_dsd + [jnp.zeros((R, pad), jnp.float32)], axis=1)
        run_idx[:] = jnp.concatenate(new_idx + [jnp.full((R, pad), -1, jnp.int32)], axis=1)

    @pl.when(c == n_c - 1)
    def _():
        oi_ref[0] = run_idx[:, :K]
        ol_ref[0] = run_len[:, :K]
        oa_ref[0] = run_act[:, :K]
        od_ref[0] = run_dsd[:, :K]


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

    grid = (nb, n_r, n_c)
    kernel = functools.partial(
        _kernel, thr_act=float(thr_act), K=int(K), chunk=int(cand_chunk),
        bh_bw=int(bh_bw), n_gauss=int(n_gauss), sub_bins=int(G),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.int32),
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.float32),
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.float32),
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.float32),
    ]
    out_spec = pl.BlockSpec(
        (1, ray_chunk, K), lambda b, r, c: (b, r, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, cand_chunk), lambda b, r, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FEAT, cand_chunk),
                         lambda b, r, c, _bw=int(bh_bw): (b // _bw, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cand_chunk),
                         lambda b, r, c, _bw=int(bh_bw): (b // _bw, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_chunk, FEAT), lambda b, r, c: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((ray_chunk, _RUNW), jnp.float32),
            pltpu.VMEM((ray_chunk, _RUNW), jnp.float32),
            pltpu.VMEM((ray_chunk, _RUNW), jnp.float32),
            pltpu.VMEM((ray_chunk, _RUNW), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * R_pad * P_pad * (15 + 6 * K),
            bytes_accessed=nb * P_pad * (17 * 4) // max(n_r, 1) + nb * R_pad * FEAT * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mask, gauss_feat, ids, rays_feat)
