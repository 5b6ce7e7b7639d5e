"""Fused Pallas TPU kernel for the fine ray-tracing stage.

Replaces the reference's hot CUDA kernel (``ray_trace_voge.cu:135-217``)
with a tile-resident design: for each bin (pixel tile), the kernel

  1. evaluates the three quadratic forms for every (ray, candidate) pair as
     pure VPU broadcast FMAs over a (R, M) block held in VMEM — candidate
     parameters arrive as *component planes* (a (16, M) feature block), ray
     features as a (R, 16) block, so no tiny-trailing-dim arrays ever touch
     the lane axis;
  2. selects the K nearest threshold-passing hits with K argmin-extraction
     passes over the (R, M) length block (the vectorized equivalent of the
     CUDA per-pixel insertion sort), emitting ascending hit lengths with the
     reference's fill values (idx=-1, len=1e10, act=1e10, dsd=0).

Nothing of size (R, M) is ever written to HBM: HBM traffic is candidates in,
(R, K) selections out.

Feature packing (see :mod:`voge_tpu.ops.fine` for the producers):

  ray features   rf[r, :]  = [r0, r1, r2, rr00, rr01, ..., rr22, 0, ...]
  cand features  cf[:, m]  = [A0, A1, A2, msm, L00, ..., L22, mu0, mu1, mu2]

with A = Lambda^T mu (so msk = mu^T Lambda r), msm = mu^T Lambda mu, and
L the rows of Lambda; then

  msk = sum_d rf[:, d]   * cf[d]          (3 FMAs)
  ksk = sum_q rf[:, 3+q] * cf[4+q]        (9 FMAs)
  len = msk / ksk;  dsd = ksk;
  act = d^T Lambda d with d = mu - len * r  (the compensated residual form
  of msm - msk^2/ksk; the msm row is kept for layout compatibility but the
  selection kernels no longer read it — see tools/debug_bunny.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEAT = 16
_SENTINEL = 1e10

# Largest K whose per-slot loops (top-K extraction passes, erf compositing
# sweeps, id-match loops) are python-unrolled inside the kernels.  Beyond
# it the loops run as ``lax.fori_loop``: Mosaic compile time and the live
# temporary set grow ~linearly with the unroll (K=80 pushed a single XLA
# compile of the ExtractTexture forward past the bench's 600 s subprocess
# budget), while the loop body compiles once.  Canonical definition —
# pallas_fine2 / pallas_attr / pallas_bwd import it from here.
_MAX_UNROLL_K = 32

# Largest padded candidate/Gaussian count for which the unified backward
# kernels (fine_bwd_unified_pallas, attr_merge_bwd_unified_pallas) may hold
# a full-width (FEAT x P_pad f32) per-Gaussian output block VMEM-resident;
# beyond it the two-kernel pair (block-revisit accumulation at chunk width)
# is used instead.  Shared by ops/fine.py and ops/pallas_attr.py.
UNIFIED_BWD_MAX_PPAD = 262144


def _kernel(rf_ref, cf_ref, ci_ref, oi_ref, ol_ref, oa_ref, od_ref, *,
            thr_act: float, K: int):
    rf = rf_ref[0]              # (R, 16) f32
    cf = cf_ref[0]              # (16, M) f32
    idx = ci_ref[0]             # (1, M) i32
    R, M = rf.shape[0], cf.shape[1]

    msk = (
        rf[:, 0:1] * cf[0:1, :]
        + rf[:, 1:2] * cf[1:2, :]
        + rf[:, 2:3] * cf[2:3, :]
    )
    ksk = rf[:, 3:4] * cf[4:5, :]
    for q in range(1, 9):
        ksk = ksk + rf[:, 3 + q : 4 + q] * cf[4 + q : 5 + q, :]

    length = msk / ksk
    # act in the COMPENSATED residual form a = d^T Lambda d, d = mu - len*r:
    # identical math to the reference's expanded msm - msk^2/ksk
    # (ray_trace_voge.cu:188-193) but immune to the eps*msm cancellation
    # (tools/debug_bunny.py: 1e-5 vs O(1) act error on outlier-msm kernels).
    d0 = cf[13:14, :] - length * rf[:, 0:1]
    d1 = cf[14:15, :] - length * rf[:, 1:2]
    d2 = cf[15:16, :] - length * rf[:, 2:3]
    e0 = d0 * cf[4:5, :] + d1 * cf[7:8, :] + d2 * cf[10:11, :]
    e1 = d0 * cf[5:6, :] + d1 * cf[8:9, :] + d2 * cf[11:12, :]
    e2 = d0 * cf[6:7, :] + d1 * cf[9:10, :] + d2 * cf[12:13, :]
    act = e0 * d0 + e1 * d1 + e2 * d2
    ok = (act < thr_act) & (idx >= 0)
    lm = jnp.where(ok, length, _SENTINEL)

    idx_b = jnp.broadcast_to(idx, (R, M))
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)

    def _extract(lm):
        lmin = jnp.min(lm, axis=1, keepdims=True)            # (R, 1)
        am = jnp.argmin(lm, axis=1)                           # (R,)
        oh = lane == am[:, None]                              # (R, M)
        valid = lmin < _SENTINEL
        a_sel = jnp.sum(jnp.where(oh, act, 0.0), axis=1, keepdims=True)
        d_sel = jnp.sum(jnp.where(oh, ksk, 0.0), axis=1, keepdims=True)
        i_sel = jnp.sum(jnp.where(oh, idx_b, 0), axis=1, keepdims=True)
        row = (jnp.where(valid, lmin, _SENTINEL),
               jnp.where(valid, a_sel, _SENTINEL),
               jnp.where(valid, d_sel, 0.0),
               jnp.where(valid, i_sel, -1))
        return row, jnp.where(oh, _SENTINEL, lm)

    if K <= _MAX_UNROLL_K:
        out_i, out_l, out_a, out_d = [], [], [], []
        for _ in range(K):
            (l_r, a_r, d_r, i_r), lm = _extract(lm)
            out_l.append(l_r)
            out_a.append(a_r)
            out_d.append(d_r)
            out_i.append(i_r)
        oi_ref[0] = jnp.concatenate(out_i, axis=1)
        ol_ref[0] = jnp.concatenate(out_l, axis=1)
        oa_ref[0] = jnp.concatenate(out_a, axis=1)
        od_ref[0] = jnp.concatenate(out_d, axis=1)
    else:
        # large K: one compiled body (unroll compile time grows ~linearly
        # in K — see ops/pallas_fine2.py); slot k placed with a one-hot
        # lane select
        laneK = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

        def body(k, carry):
            lm, oi, ol, oa, od = carry
            (l_r, a_r, d_r, i_r), lm = _extract(lm)
            put = laneK == k
            return (lm,
                    jnp.where(put, i_r, oi), jnp.where(put, l_r, ol),
                    jnp.where(put, a_r, oa), jnp.where(put, d_r, od))

        init = (lm,
                jnp.full((R, K), -1, jnp.int32),
                jnp.full((R, K), _SENTINEL, jnp.float32),
                jnp.full((R, K), _SENTINEL, jnp.float32),
                jnp.zeros((R, K), jnp.float32))
        _, oi, ol, oa, od = jax.lax.fori_loop(0, K, body, init,
                                              unroll=False)
        oi_ref[0] = oi
        ol_ref[0] = ol
        oa_ref[0] = oa
        od_ref[0] = od


def fine_select_pallas(
    rays_feat: jax.Array,   # (nb, R_pad, 16) f32
    cand_feat: jax.Array,   # (nb, 16, M_pad) f32
    cand_idx: jax.Array,    # (nb, 1, M_pad) i32 (-1 padded)
    thr_act: float,
    K: int,
    ray_chunk: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run the fused selection kernel.

    ``ray_chunk`` splits the ray axis so (ray_chunk x M_pad) blocks fit in
    VMEM (candidate blocks stay resident across chunks of the same bin).

    :return: (sel_idx, sel_len, sel_act, sel_dsd), each (nb, R_pad, K)
    """
    nb, R_pad, _ = rays_feat.shape
    M_pad = cand_feat.shape[2]
    assert R_pad % ray_chunk == 0
    n_r = R_pad // ray_chunk

    grid = (nb, n_r)
    kernel = functools.partial(_kernel, thr_act=float(thr_act), K=int(K))
    out_shapes = [
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.int32),
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.float32),
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.float32),
        jax.ShapeDtypeStruct((nb, R_pad, K), jnp.float32),
    ]
    out_spec = pl.BlockSpec(
        (1, ray_chunk, K), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM
    )
    flops_sel = nb * R_pad * M_pad * (15 + 6 * K)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ray_chunk, FEAT), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FEAT, M_pad), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M_pad), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_sel, bytes_accessed=nb * M_pad * 17 * 4, transcendentals=0
        ),
        interpret=interpret,
    )(rays_feat, cand_feat, cand_idx)


def pick_ray_chunk(R_pad: int, M_pad: int, budget_bytes: int = 6 * 2**20) -> int:
    """Largest ray chunk (multiple of 8, divides R_pad) such that the
    (chunk, M_pad) f32 working set stays within ~budget."""
    max_rows = max(8, budget_bytes // (5 * 4 * M_pad) // 8 * 8)
    c = min(R_pad, max_rows)
    while R_pad % c != 0:
        c -= 8
    return max(c, 8)
