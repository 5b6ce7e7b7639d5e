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

from voge_tpu.ops.pallas_fine import FEAT, _MAX_UNROLL_K

_INF = 1e10

_RUNW = 128  # running-state lane width (>= K, lane-aligned)


def _erf32(x):
    """f32 erf as the Eigen/XLA rational approximation x*P(x^2)/Q(x^2) on
    [-4, 4] (max abs error ~1e-7) — Mosaic has no erf lowering; this is the
    same polynomial XLA lowers ``lax.erf`` to on TPU, keeping the fused
    aggregation numerically aligned with the XLA path."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(-2.72614225801306e-10)
    for c in (2.77068142495902e-08, -2.10102402082508e-06,
              -5.69250639462346e-05, -7.34990630326855e-04,
              -2.95459980854025e-03, -1.60960333262415e-02):
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(-1.45660718464996e-05)
    for c in (-2.13374055278905e-04, -1.68282697438203e-03,
              -7.37332916720468e-03, -1.42647390514189e-02):
        q = q * x2 + jnp.float32(c)
    return (x * p) / q


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


def _kernel_tc(
    csel_ref,   # (nb, n_c) int32 SMEM: chunk visit list (scalar prefetch)
    cnt_ref,    # (nb,) int32 SMEM: occupied chunk count per bin
    bits_ref,   # (1, C, 1) int32 per-sub-bin membership bitfield
    gf_ref,     # (1, C, FEAT) f32 packed Gaussian feature table
    ids_ref,    # (1, C, 1) int32 global flattened ORIGINAL candidate ids
    rf_ref,     # (1, FEAT, R) f32 ray feature planes (G sub-bins' rays)
    *refs,      # (1, Kp, R) outputs oi/ol/oa/od (+ow if agg_ow)
                # (+oimg (1, Ca, R) if n_attr) (+ohm (1, n_cp, 128) if
                # hitmask), then (Kp, R) scratch run_len/.../run_idx
    thr_act: float, K: int, chunk: int, sub_bins: int,
    agg_ow=None, hit_eval: str = "vpu", n_attr: int = 0,
    hitmask: bool = False,
):
    """Transposed layout: candidates on SUBLANES, rays on LANES.

    Two wins over the lane-major variant: (a) the per-pass reductions of the
    K-extraction merge run along sublanes (3-step tails) instead of lanes
    (7-step cross-lane tails) -- the merge was reduction-tail-bound, ~2.3x;
    (b) the three quadratic forms become real MXU matmuls (C, 3) @ (3, R)
    and (C, 9) @ (9, R) instead of ~22 VPU outer-product passes.

    Membership of candidate c in sub-bin g is bit g of ``bits_ref`` --
    packed so one streamed int32 column serves any sub-bin count (and, in
    the compacted-candidate path, one gather instead of G).

    With ``agg_ow`` set, the erf transmittance compositing (reference
    ``Aggregation.py:54-79``; see :mod:`voge_tpu.aggregation`) runs on the
    final (Kp, R) selection while it sits in VMEM scratch, emitting the
    per-slot weights as a fifth output -- the O(K^2) pairwise pass is K
    sublane-broadcast sweeps, fused here instead of a separate XLA pass
    over the HBM round-tripped selection.
    """
    oimg_ref = img_acc = ohm_ref = None
    if hitmask:
        # the per-chunk hit bitmap is the LAST output; scratch count is 5
        # with fused attrs (img_acc) and 4 otherwise
        n_scr = 5 if n_attr else 4
        ohm_ref = refs[-n_scr - 1]
        refs = refs[:-n_scr - 1] + refs[-n_scr:]
    if n_attr:
        # fused attribute compositing rides the fused aggregation; the
        # grid's chunk axis is DOUBLED (select phase, then an attr phase
        # re-streaming the same chunks against the final selection)
        (oi_ref, ol_ref, oa_ref, od_ref, ow_ref, oimg_ref,
         run_len, run_act, run_dsd, run_idx, img_acc) = refs
    elif agg_ow is None:
        (oi_ref, ol_ref, oa_ref, od_ref,
         run_len, run_act, run_dsd, run_idx) = refs
        ow_ref = None
    else:
        (oi_ref, ol_ref, oa_ref, od_ref, ow_ref,
         run_len, run_act, run_dsd, run_idx) = refs
    c = pl.program_id(2)
    n_c = pl.num_programs(2)
    if n_attr:
        # chunk axis is n_c select steps + (n_c - 1) attr re-visits: the
        # LAST occupied chunk's attr contribution runs inside the flush
        # step (it is the resident block there), so only cnt-1 chunks need
        # re-visiting
        n_c = (n_c + 1) // 2
    b = pl.program_id(0)

    rf = rf_ref[0]                      # (FEAT, R)
    tab = gf_ref[0]                     # (C, FEAT)
    R = rf.shape[1]
    C = tab.shape[0]
    G = sub_bins
    R_bin = R // G
    Kp = run_len.shape[0]

    @pl.when(c == 0)
    def _():
        run_len[:] = jnp.full((Kp, R), _INF, jnp.float32)
        run_act[:] = jnp.full((Kp, R), _INF, jnp.float32)
        run_dsd[:] = jnp.zeros((Kp, R), jnp.float32)
        run_idx[:] = jnp.full((Kp, R), -1, jnp.int32)
        if ohm_ref is not None:
            ohm_ref[0] = jnp.zeros_like(ohm_ref[0])
        if img_acc is not None:
            # must precede the flush: with a single-chunk axis the flush
            # (and its fused attr accumulation) runs in this same step
            img_acc[:] = jnp.zeros_like(img_acc)

    def _merge_chunk(lm, act, ksk):
        # global flattened ORIGINAL Gaussian ids come from the streamed ids
        # plane (supports candidate reordering/compaction upstream)
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
        # matches many rows); they are re-masked per pass.
        def _extract(cat_len):
            mn = jnp.min(cat_len, axis=0, keepdims=True)
            oh0 = cat_len == mn
            am = jnp.min(jnp.where(oh0, sub_w, W), axis=0, keepdims=True)
            oh = sub_w == am
            val = mn < _INF
            a = jnp.sum(jnp.where(oh, cat_act, 0.0), axis=0, keepdims=True)
            d = jnp.sum(jnp.where(oh, cat_dsd, 0.0), axis=0, keepdims=True)
            i = jnp.sum(jnp.where(oh, cat_idx, 0), axis=0, keepdims=True)
            row = (mn, jnp.where(val, a, _INF), jnp.where(val, d, 0.0),
                   jnp.where(val, i, -1))
            return row, jnp.where(oh, _INF, cat_len)

        if K <= _MAX_UNROLL_K:
            new_len, new_act, new_dsd, new_idx = [], [], [], []
            for _ in range(K):
                (mn, a, d, i), cat_len = _extract(cat_len)
                new_len.append(mn)
                new_act.append(a)
                new_dsd.append(d)
                new_idx.append(i)
            pad = Kp - K
            padrow = lambda rows, v, dt: jnp.concatenate(
                rows + ([jnp.full((pad, R), v, dt)] if pad else []), axis=0
            )
            run_len[:] = padrow(new_len, _INF, jnp.float32)
            run_act[:] = padrow(new_act, _INF, jnp.float32)
            run_dsd[:] = padrow(new_dsd, 0.0, jnp.float32)
            run_idx[:] = padrow(new_idx, -1, jnp.int32)
        else:
            # large K: one compiled OCT body — 8 slots extracted per trip
            # and written with ONE dynamic (8, R) sublane store per plane
            # (Mosaic requires dynamic sublane offsets provably 8-aligned,
            # so the batch is 8, i*8).  Mosaic's per-iteration overhead
            # (loop boundary + dynamic store pipeline stall) dominated the
            # K=60/80 workloads (flat across chunk widths — round 5).
            # Padding rows K..Kp keep their c==0 init (never written); a
            # K % 8 tail runs as statically-unrolled single extractions.
            U = 8
            n_full = K // U

            def qbody(i, cat_len):
                rows = []
                for _ in range(U):
                    row, cat_len = _extract(cat_len)
                    rows.append(row)
                off = i * U
                run_len[pl.ds(off, U), :] = jnp.concatenate(
                    [r[0] for r in rows], axis=0)
                run_act[pl.ds(off, U), :] = jnp.concatenate(
                    [r[1] for r in rows], axis=0)
                run_dsd[pl.ds(off, U), :] = jnp.concatenate(
                    [r[2] for r in rows], axis=0)
                run_idx[pl.ds(off, U), :] = jnp.concatenate(
                    [r[3] for r in rows], axis=0)
                return cat_len

            cat_len = jax.lax.fori_loop(0, n_full, qbody, cat_len,
                                        unroll=False)
            for k in range(n_full * U, K):   # static tail, K % 4 slots
                (mn, a, d, i), cat_len = _extract(cat_len)
                run_len[pl.ds(k, 1), :] = mn
                run_act[pl.ds(k, 1), :] = a
                run_dsd[pl.ds(k, 1), :] = d
                run_idx[pl.ds(k, 1), :] = i

    # Only occupied chunks are visited (scalar-prefetched visit list); steps
    # past this bin's occupied count are repeats of the last occupied chunk
    # (same block indices => no DMA) and skipped entirely.
    @pl.when(c < cnt_ref[b])
    def _():
        # membership of ray lane j (sub-bin j // R_bin): bit j//R_bin of the
        # candidate's bitfield (lane-dim reshapes are unsupported by Mosaic)
        bits = jnp.broadcast_to(bits_ref[0], (C, R))
        lane_bin = jax.lax.broadcasted_iota(jnp.int32, (C, R), 1) // R_bin
        member = jax.lax.shift_right_logical(bits, lane_bin) & 1
        if hit_eval == "vpu":
            # 3- and 9-deep contractions: the MXU pads the contraction to
            # 128 and precision HIGHEST multiplies that by 6 (bf16x6) —
            # measured ~2/3 of this kernel's time at the 10K benchmark.
            # Broadcast FMAs on the VPU compute the same sums in exact f32
            # (no bf16 splitting at all) in 12 passes over (C, R).
            msk = sum(
                tab[:, d : d + 1] * rf[d : d + 1, :] for d in range(3)
            )                                                    # (C, R)
            ksk = sum(
                tab[:, 4 + q : 5 + q] * rf[3 + q : 4 + q, :]
                for q in range(9)
            )                                                    # (C, R)
        else:
            prec = (jax.lax.Precision.HIGHEST if hit_eval == "mxu6"
                    else jax.lax.Precision.DEFAULT)
            msk = jax.lax.dot_general(
                tab[:, 0:3], rf[0:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )                                                    # (C, R)
            ksk = jax.lax.dot_general(
                tab[:, 4:13], rf[3:12, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )                                                    # (C, R)
        length = msk / ksk
        # act = d^T Lambda d with d = mu - len * r: the compensated residual
        # form of msm - msk^2/ksk — immune to the eps*msm cancellation that
        # dominates the f32 error on outlier-msm kernels (bunny config; see
        # tools/debug_bunny.py and ops/pallas_fine.py).  ~15 extra VPU FMAs
        # per (C, R) chunk vs the 3-op expanded form.
        d0 = tab[:, 13:14] - length * rf[0:1, :]
        d1 = tab[:, 14:15] - length * rf[1:2, :]
        d2 = tab[:, 15:16] - length * rf[2:3, :]
        e0 = d0 * tab[:, 4:5] + d1 * tab[:, 7:8] + d2 * tab[:, 10:11]
        e1 = d0 * tab[:, 5:6] + d1 * tab[:, 8:9] + d2 * tab[:, 11:12]
        e2 = d0 * tab[:, 6:7] + d1 * tab[:, 9:10] + d2 * tab[:, 12:13]
        act = e0 * d0 + e1 * d1 + e2 * d2
        ok = (act < thr_act) & (member > 0)
        lm = jnp.where(ok, length, _INF)

        # Dynamic extraction skip: a chunk whose candidates ALL fail the
        # threshold/membership test cannot change the running selection
        # (every lm is _INF; the merge below provably returns the running
        # state unchanged — running rows come first and win ties).  The
        # K extraction passes are ~80% of this step's compute, so skipping
        # them on contribution-free chunks is a large win on workloads
        # whose candidate stream is mostly misses (no-coarse fitting
        # configs stream EVERY Gaussian past every supertile; spatial
        # locality makes most (chunk, supertile) pairs all-miss).  The
        # hit evaluation above still runs — it is ~6x cheaper.
        any_hit = jnp.max(jnp.where(ok, 1.0, 0.0)) > 0.0

        @pl.when(any_hit)
        def _():
            if ohm_ref is not None:
                # record "this chunk produced at least one passing hit":
                # every finally-selected candidate's chunk is marked, so
                # downstream match loops (this kernel's attr phase, the
                # transposed backward, the lazy attr kernels) can restrict
                # their visits to marked chunks — exact by superset.
                ohm_ref[0, pl.ds(csel_ref[b, c], 1), :] = jnp.ones(
                    (1, ohm_ref.shape[2]), jnp.int32
                )
            _merge_chunk(lm, act, ksk)

    def _attr_chunk(ids_col):
        attr_t = gf_ref[0][:, FEAT:FEAT + n_attr]    # (C, Ca)
        if K <= _MAX_UNROLL_K:
            Wc = jnp.zeros((C, R), jnp.float32)
            for k in range(K):
                oh = ids_col == run_idx[k:k + 1, :]
                Wc = Wc + jnp.where(oh, ow_ref[0, k:k + 1, :], 0.0)
        else:
            def wc_body(k, Wc):
                oh = ids_col == run_idx[pl.ds(k, 1), :]
                return Wc + jnp.where(
                    oh, ow_ref[0, pl.ds(k, 1), :], 0.0
                )
            Wc = jax.lax.fori_loop(
                0, K, wc_body, jnp.zeros((C, R), jnp.float32),
                unroll=False,
            )
        img_acc[:] = img_acc[:] + jax.lax.dot_general(
            attr_t, Wc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def _attr_gated(chunk_slot):
        """Attr contribution of the currently-resident chunk, skipped via
        the id-range and fwd-hitmask gates (see the attr phase below);
        ``chunk_slot`` is the visit-list column of the resident block."""
        ids_col = ids_ref[0]                         # (C, 1)
        sel_ids = run_idx[:]
        mn_id = ids_col[0, 0]
        mx_id = jnp.max(ids_col)
        overlap = jnp.max(jnp.where(
            (sel_ids >= mn_id) & (sel_ids <= mx_id), 1.0, 0.0)) > 0.0
        if ohm_ref is not None:
            overlap = overlap & (
                ohm_ref[0, pl.ds(csel_ref[b, chunk_slot], 1), :][0, 0] > 0
            )

        @pl.when(overlap & (cnt_ref[b] > 0))
        def _():
            _attr_chunk(ids_col)

    @pl.when(c == n_c - 1)
    def _():
        oi_ref[0] = run_idx[:]
        ol_ref[0] = run_len[:]
        oa_ref[0] = run_act[:]
        od_ref[0] = run_dsd[:]
        if agg_ow is not None:
            # Fused erf compositing (identical math to aggregation.py:36-64,
            # incl. the self term, the 1e-10 sqrt stabilizer and the
            # exp(0.5) normalization).  Invalid slots carry act = _INF so
            # exp(-act) = 0 kills both their weight and their occlusion
            # contribution; padding rows K..Kp likewise.
            l = run_len[:]
            ea = jnp.exp(-run_act[:])                       # (Kp, R)
            sq = jnp.sqrt(run_dsd[:] + 1e-10)
            if K <= _MAX_UNROLL_K:
                occ = jnp.zeros_like(l)
                for k in range(K):
                    ca = (l - l[k:k + 1, :]) * sq[k:k + 1, :]
                    occ = occ + ea[k:k + 1, :] * (
                        0.5 * (_erf32(ca) + 1.0)
                    )
            else:
                def occ_body(k, occ):
                    lk = run_len[pl.ds(k, 1), :]
                    ak = run_act[pl.ds(k, 1), :]
                    dk = run_dsd[pl.ds(k, 1), :]
                    ca = (l - lk) * jnp.sqrt(dk + 1e-10)
                    return occ + jnp.exp(-ak) * (0.5 * (_erf32(ca) + 1.0))
                occ = jax.lax.fori_loop(
                    0, K, occ_body, jnp.zeros_like(l), unroll=False
                )
            ow_ref[0] = jnp.exp(-float(agg_ow) * occ) * ea * 1.6487212707001282
        if n_attr:
            # the LAST occupied chunk is resident right here — run its
            # fused attr contribution (``interpolate_attr`` math:
            # img[ca, r] = sum_k w[k, r] * attr[sel_k(r), ca], per chunk
            # as attr^T @ Wc with Wc[c, r] = sum_k [ids_c == sel_k] w_k —
            # pallas_attr._match_weight) inside the flush, so the attr
            # phase below only re-visits the OTHER cnt-1 chunks and the
            # grid's chunk axis shrinks to 2*n_c - 1 (1-chunk supertiles,
            # the common case at the headline config, never re-visit)
            _attr_gated(n_c - 1)

    if n_attr:
        # ---- attr phase (grid steps n_c .. 2*n_c-2): visits 0..cnt-2
        # (the last occupied chunk ran at flush).  Gates as in
        # ``_attr_gated``: id-range (compacted ids ascend per supertile;
        # padding -1 rows trail) and the fwd hit bitmap — a chunk with no
        # passing hit / no selected id in range contributes nothing, so
        # the K match passes are skipped.
        @pl.when((c >= n_c) & (c - n_c < cnt_ref[b] - 1))
        def _():
            _attr_gated(c % n_c)

        @pl.when(c == 2 * n_c - 2)
        def _():
            oimg_ref[0] = img_acc[:]


def fine_select_compact_pallas(
    rays_t: jax.Array,      # (nb, FEAT, R_pad) f32 transposed ray features
    table: jax.Array,       # (NB, C_total, FEAT) f32 candidate feature rows
    bits: jax.Array,        # (NB, C_total, 1) int32 membership bitfields
    ids_c: jax.Array,       # (NB, C_total, 1) int32 original ids (-1 pad)
    csel: jax.Array,        # (nb, n_c) int32 chunk visit list
    counts: jax.Array,      # (nb,) int32 occupied chunk count
    thr_act: float,
    K: int,
    sub_bins: int,
    ray_chunk: int,
    cand_chunk: int,
    per_bin_cand: bool,     # candidate arrays per bin (NB == nb) or per
                            # image (NB == B, bin b reads row b // bh_bw)
    bh_bw: int = 1,
    interpret: bool = False,
    agg_ow=None,            # float: fuse erf compositing, emit weights as a
                            # 5th output; None: selection only
    return_raw: bool = False,
    hit_eval: str = "vpu",  # "vpu" (exact f32 FMAs), "mxu6", "mxu1"
    n_attr: int = 0,        # >0: table carries n_attr attribute columns
                            # after the FEAT feature columns and the fused
                            # attribute image (nb, n_attr, R_pad) is
                            # returned as a 6th output (requires agg_ow and
                            # a single-chunk candidate space)
    return_hitmask: bool = False,
) -> Tuple[jax.Array, ...]:
    """Streaming top-K selection over a (possibly per-supertile-compacted)
    candidate table; returns ray-major (nb, R_pad, K) selections (plus
    fused aggregation weights when ``agg_ow`` is set, plus the transposed
    attribute image when ``n_attr``).  With ``return_raw``
    also returns the kernel-native (nb, Kp, R_pad) (len, act, dsd[, w])
    buffers for the transposed fold backward.  With ``return_hitmask``
    additionally returns an (nb, n_c) int32 bitmap of chunks that produced
    at least one passing hit — every finally-selected candidate's chunk is
    marked, so backward/attribute match kernels can restrict their chunk
    visits to marked chunks (``hit_visit_lists``)."""
    nb, _, R_pad = rays_t.shape
    C_total = table.shape[1]
    featw = FEAT + int(n_attr)
    assert table.shape[2] == featw, (table.shape, featw)
    assert R_pad % ray_chunk == 0 and C_total % cand_chunk == 0
    if n_attr:
        assert agg_ow is not None, "fused attributes need fused aggregation"
    # _kernel_tc derives each ray's sub-bin from its lane index within the
    # current ray chunk; partial-tile chunks would misattribute membership
    assert sub_bins == 1 or ray_chunk == R_pad, (
        "sub-binned tiles need full-tile ray chunks"
    )
    n_r = R_pad // ray_chunk
    n_c = C_total // cand_chunk
    assert csel.shape == (nb, n_c)

    # the membership bits are always per bin; the feature table / ids are
    # per bin when compacted, per image otherwise.  With fused attrs the
    # chunk axis is doubled (select phase then attr phase) and both phases
    # stream the same visit list.
    if n_attr:
        bmap = lambda b, r, c, cs, ct, _n=n_c: (b, cs[b, c % _n], 0)
    else:
        bmap = lambda b, r, c, cs, ct: (b, cs[b, c], 0)
    if per_bin_cand:
        cmap = bmap
    elif n_attr:
        cmap = lambda b, r, c, cs, ct, _bw=int(bh_bw), _n=n_c: (
            b // _bw, cs[b, c % _n], 0)
    else:
        cmap = lambda b, r, c, cs, ct, _bw=int(bh_bw): (b // _bw, cs[b, c], 0)

    Kp = max(8, -(-K // 8) * 8)
    kernel = functools.partial(
        _kernel_tc, thr_act=float(thr_act), K=int(K), chunk=int(cand_chunk),
        sub_bins=int(sub_bins),
        agg_ow=None if agg_ow is None else float(agg_ow),
        hit_eval=hit_eval, n_attr=int(n_attr), hitmask=bool(return_hitmask),
    )
    n_out = 4 if agg_ow is None else 5
    out_shapes = [jax.ShapeDtypeStruct((nb, Kp, R_pad), jnp.int32)] + [
        jax.ShapeDtypeStruct((nb, Kp, R_pad), jnp.float32)
    ] * (n_out - 1)
    out_spec = pl.BlockSpec(
        (1, Kp, ray_chunk), lambda b, r, c, cs, ct: (b, 0, r),
        memory_space=pltpu.VMEM,
    )
    out_specs = [out_spec] * n_out
    if n_attr:
        out_shapes.append(
            jax.ShapeDtypeStruct((nb, n_attr, R_pad), jnp.float32)
        )
        out_specs.append(pl.BlockSpec(
            (1, n_attr, ray_chunk), lambda b, r, c, cs, ct: (b, 0, r),
            memory_space=pltpu.VMEM,
        ))
    n_cp = max(8, n_c)
    if return_hitmask:
        # per-(supertile, chunk) hit bitmap — lane dim 128 because dynamic
        # indexing is only available on sublanes; consumers read [..., 0]
        out_shapes.append(
            jax.ShapeDtypeStruct((nb, n_cp, 128), jnp.int32)
        )
        out_specs.append(pl.BlockSpec(
            (1, n_cp, 128), lambda b, r, c, cs, ct: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    scratch_shapes = [
        pltpu.VMEM((Kp, ray_chunk), jnp.float32),
        pltpu.VMEM((Kp, ray_chunk), jnp.float32),
        pltpu.VMEM((Kp, ray_chunk), jnp.float32),
        pltpu.VMEM((Kp, ray_chunk), jnp.int32),
    ]
    if n_attr:
        scratch_shapes.append(pltpu.VMEM((n_attr, ray_chunk), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_r, (2 * n_c - 1) if n_attr else n_c),
        in_specs=[
            pl.BlockSpec((1, cand_chunk, 1), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cand_chunk, featw), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cand_chunk, 1), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FEAT, ray_chunk),
                         lambda b, r, c, cs, ct: (b, 0, r),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(csel, counts, bits, table, ids_c, rays_t)
    img_t = hm = None
    if return_hitmask:
        out, hm = out[:-1], out[-1][:, :n_c, 0]    # (nb, n_c) int32
    if n_attr:
        out, img_t = out[:-1], out[-1]
    # back to ray-major (nb, R_pad, K) for downstream consumers
    swapped = tuple(jnp.swapaxes(x, 1, 2)[:, :, :K] for x in out)
    if n_attr:
        swapped = swapped + (img_t,)
    if return_raw:
        # the kernel-native (nb, Kp, R_pad) buffers (idx, len, act, dsd
        # [, weight]), free aliases of the outputs above — consumed by the
        # transposed backward kernels (fine_bwd_compact_t_pallas /
        # fold_weights_pallas)
        if return_hitmask:
            return swapped, tuple(out), hm
        return swapped, tuple(out)
    if return_hitmask:
        return swapped, hm
    return swapped


def fold_weights_pallas(
    l_t: jax.Array,    # (nb, Kp, R_pad) f32 selection hit lengths (raw)
    a_t: jax.Array,    # (nb, Kp, R_pad) f32 activations
    d_t: jax.Array,    # (nb, Kp, R_pad) f32 dsd
    w_t: jax.Array,    # (nb, Kp, R_pad) f32 fused compositing weights
    gw_t: jax.Array,   # (nb, Kp, R_pad) f32 weight cotangent (transposed)
    ow: float,
    K: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Analytic backward of the fused erf compositing
    (``aggregation.weights_from_sel``) in the select kernel's native
    transposed layout — slots on sublanes, rays on lanes, so the K
    occluder sweeps run at full 128-lane utilization and nothing
    materializes a [..., K, K] tensor (the ``jax.vjp`` XLA formulation
    builds ~140 MB erf/exp pairwise tensors at 256^2, K=20; measured ~2.9
    ms of the 1K workload's 10.2 ms).

      w_m  = e_m * exp(-ow * occ_m) * e^0.5,   e_m = exp(-a_m)
      occ_m = sum_k e_k * Phi(ca_mk),  ca_mk = (l_m - l_k) * s_k
      s_k = sqrt(d_k + 1e-10),  Phi = (erf+1)/2,  phi = exp(-x^2)/sqrt(pi)

      da_m = -G_m + ow * e_m * A_m          A_m = sum_m' G_m' Phi(ca_m'm)
      dl_m = -ow * (G_m B_m - e_m s_m C_m)  B_m = sum_k e_k phi(ca_mk) s_k
      dd_m = -ow * e_m * D_m / (2 s_m)      C_m = sum_m' G_m' phi(ca_m'm)
      with G_m = g_w_m * w_m                D_m = sum_m' G_m' phi(ca_m'm)
                                                        * (l_m' - l_m)

    Invalid / padding slots carry a = 1e10 (e = w = G = 0), which zeroes
    every contribution, matching the XLA vjp to f32 epsilon.
    """
    nb, Kp, R_pad = l_t.shape
    rc = R_pad if R_pad <= 512 else _largest_div(R_pad, 512)
    n_r = R_pad // rc
    inv_sqrt_pi = 0.5641895835477563

    def _kernel(l_ref, a_ref, d_ref, w_ref, gw_ref, dl_ref, da_ref, dd_ref,
                A_s, C_s, D_s):
        l = l_ref[0]
        s = jnp.sqrt(d_ref[0] + 1e-10)
        e = jnp.exp(-a_ref[0])
        G = gw_ref[0] * w_ref[0]

        def _sweep(lk, sk, ek, B):
            diff = l - lk
            ca = diff * sk
            phi = jnp.exp(-ca * ca) * inv_sqrt_pi
            Phi = (_erf32(ca) + 1.0) * 0.5
            rows = (
                jnp.sum(G * Phi, axis=0, keepdims=True),
                jnp.sum(G * phi, axis=0, keepdims=True),
                jnp.sum(G * phi * diff, axis=0, keepdims=True),
            )
            return rows, B + (ek * sk) * phi

        if K <= _MAX_UNROLL_K:
            B = jnp.zeros_like(l)
            A_rows, C_rows, D_rows = [], [], []
            for k in range(K):
                rows, B = _sweep(l[k:k + 1, :], s[k:k + 1, :], e[k:k + 1, :], B)
                A_rows.append(rows[0])
                C_rows.append(rows[1])
                D_rows.append(rows[2])
            pad = [jnp.zeros((Kp - K, l.shape[1]), jnp.float32)] if Kp > K else []
            A = jnp.concatenate(A_rows + pad, axis=0)
            C = jnp.concatenate(C_rows + pad, axis=0)
            D = jnp.concatenate(D_rows + pad, axis=0)
        else:
            # large K: one compiled sweep body; per-slot rows land in
            # scratch via dynamic sublane stores (cf. _kernel_tc)
            A_s[:] = jnp.zeros_like(A_s)
            C_s[:] = jnp.zeros_like(C_s)
            D_s[:] = jnp.zeros_like(D_s)

            def body(k, B):
                rows, B = _sweep(
                    l_ref[0, pl.ds(k, 1), :],
                    jnp.sqrt(d_ref[0, pl.ds(k, 1), :] + 1e-10),
                    jnp.exp(-a_ref[0, pl.ds(k, 1), :]), B,
                )
                A_s[pl.ds(k, 1), :] = rows[0]
                C_s[pl.ds(k, 1), :] = rows[1]
                D_s[pl.ds(k, 1), :] = rows[2]
                return B
            B = jax.lax.fori_loop(
                0, K, body, jnp.zeros_like(l), unroll=False
            )
            A, C, D = A_s[:], C_s[:], D_s[:]
        f_ow = jnp.float32(ow)
        da_ref[0] = -G + f_ow * e * A
        dl_ref[0] = -f_ow * (G * B - e * s * C)
        dd_ref[0] = -f_ow * e * D * (0.5 / s)

    spec = pl.BlockSpec((1, Kp, rc), lambda b, r: (b, 0, r),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(nb, n_r),
        in_specs=[spec] * 5,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nb, Kp, R_pad), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((Kp, rc), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(l_t, a_t, d_t, w_t, gw_t)
    return tuple(out)


def _largest_div(n: int, cap: int) -> int:
    for c in range(cap, 7, -8):
        if n % c == 0:
            return c
    return n


def pack_membership_bits(mask: jax.Array) -> jax.Array:
    """(nb, G, P_pad) int8 membership -> (nb, P_pad) int32 bitfields."""
    G = mask.shape[1]
    m = mask.astype(jnp.int32)
    return sum(m[:, g, :] << g for g in range(G))


def compact_candidates(
    mask: jax.Array,        # (nb, G, P_pad) int8 membership
    gauss_feat: jax.Array,  # (B, FEAT, P_pad) f32 feature planes
    ids: jax.Array,         # (B, 1, P_pad) int32 original ids
    M_max: int,             # static per-bin candidate capacity
    bh_bw: int,             # bins per image (bin b -> image b // bh_bw)
):
    """Per-bin candidate compaction: gather each bin's members (ascending
    position, preserving the insertion-order tie-break) into fixed-capacity
    rows.  Members beyond ``M_max`` are deterministically dropped (the
    reference truncates at max_points_per_bin the same way,
    rasterize_coarse.cu:153-170); the drop count is returned.

    :return: (table_c (nb, M_max, FEAT), bits_c (nb, M_max, 1),
        ids_c (nb, M_max, 1), pos (nb, M_max) source positions,
        counts (nb,) member counts clamped to M_max,
        overflow (nb,) dropped members per bin)
    """
    nb, G, P_pad = mask.shape
    B = gauss_feat.shape[0]
    bits = pack_membership_bits(mask)                      # (nb, P_pad)
    member = bits > 0
    n_members = member.sum(axis=1).astype(jnp.int32)
    counts = jnp.minimum(n_members, M_max)
    overflow = n_members - counts
    # member positions first (ascending; argsort of ~member is stable)
    pos = jnp.argsort(~member, axis=1, stable=True)[:, :M_max].astype(jnp.int32)
    iota = jnp.arange(M_max, dtype=jnp.int32)[None]
    valid = iota < counts[:, None]
    bits_c = jnp.where(valid, jnp.take_along_axis(bits, pos, axis=1), 0)
    ids_img = jnp.broadcast_to(
        ids[:, 0, :][:, None, :], (B, nb // B, P_pad)
    ).reshape(nb, P_pad)
    ids_c = jnp.where(valid, jnp.take_along_axis(ids_img, pos, axis=1), -1)
    # feature rows: one flat row-gather from the packed per-image table
    table = jnp.swapaxes(gauss_feat, 1, 2).reshape(B * P_pad, FEAT)
    img_of_bin = (
        jnp.arange(nb, dtype=jnp.int32)[:, None] // (nb // B)
    )                                                      # (nb, 1)
    flat = (img_of_bin * P_pad + pos).reshape(-1)
    table_c = table[flat].reshape(nb, M_max, FEAT)
    return table_c, bits_c[:, :, None], ids_c[:, :, None], pos, counts, overflow


def prefix_visit_lists(counts: jax.Array, M_max: int, cand_chunk: int):
    """Visit lists for a compacted candidate space: occupied chunks are the
    prefix [0, ceil(count / cand_chunk))."""
    n_c = M_max // cand_chunk
    cnt_c = -(-counts // cand_chunk)                       # ceil div
    iota = jnp.arange(n_c, dtype=jnp.int32)[None]
    last = jnp.maximum(cnt_c - 1, 0)
    csel = jnp.minimum(iota, last[:, None]).astype(jnp.int32)
    return csel, cnt_c.astype(jnp.int32)


def hit_visit_lists(hm: jax.Array, sel_chunk: int, cand_chunk: int):
    """Visit lists restricted to the select hitmask's marked chunks.

    ``hm`` (nb, n_c_sel) int32 is ``fine_select_compact_pallas``'s
    ``return_hitmask`` output at select-chunk granularity; the consumer's
    ``cand_chunk`` may be a different (multiple/divisor) width.  Every
    finally-selected candidate lives in a marked chunk, so match-loop
    kernels (transposed backward, attribute compositing) visiting only
    these chunks compute identical results — unmarked chunks build
    all-zero coefficient matrices.

    :return: (csel (nb, n_c) int32 ascending marked chunk ids, padded by
        repeating the last marked chunk; counts (nb,) int32)
    """
    nb, n_s = hm.shape
    if cand_chunk == sel_chunk:
        hit = hm > 0
    elif cand_chunk > sel_chunk:
        f = cand_chunk // sel_chunk
        assert n_s % f == 0, (n_s, f)
        hit = (hm.reshape(nb, n_s // f, f).max(axis=-1)) > 0
    else:
        f = sel_chunk // cand_chunk
        hit = jnp.repeat(hm > 0, f, axis=1)
    n_c = hit.shape[1]
    counts = hit.sum(axis=-1).astype(jnp.int32)
    iota = jnp.arange(n_c, dtype=jnp.int32)[None]
    order = jnp.argsort(~hit, axis=1, stable=True).astype(jnp.int32)
    last = jnp.max(jnp.where(hit, iota, 0), axis=1)
    csel = jnp.where(iota < counts[:, None], order, last[:, None])
    return csel, counts


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
    agg_ow=None,
    return_raw: bool = False,
    return_hitmask: bool = False,
) -> Tuple[jax.Array, ...]:
    nb, R_pad, _ = rays_feat.shape
    P_pad = gauss_feat.shape[2]
    assert mask.ndim == 3
    assert ids.shape == (gauss_feat.shape[0], 1, P_pad)
    G = mask.shape[1]
    assert G == 1 or ray_chunk == R_pad, "sub-binned tiles need full-tile ray chunks"
    assert R_pad % ray_chunk == 0 and P_pad % cand_chunk == 0
    n_c = P_pad // cand_chunk

    csel, counts = chunk_visit_lists(mask, n_c, cand_chunk)
    bits = pack_membership_bits(mask)[:, :, None]   # (nb, P_pad, 1)
    table = jnp.swapaxes(gauss_feat, 1, 2)          # (B, P_pad, FEAT)
    ids_t = jnp.swapaxes(ids, 1, 2)                 # (B, P_pad, 1)
    rays_t = jnp.swapaxes(rays_feat, 1, 2)          # (nb, FEAT, R_pad)
    out = fine_select_compact_pallas(
        rays_t, table, bits, ids_t, csel, counts, thr_act, K,
        sub_bins=G, ray_chunk=ray_chunk, cand_chunk=cand_chunk,
        per_bin_cand=False, bh_bw=bh_bw, interpret=interpret,
        agg_ow=agg_ow, return_raw=return_raw,
        return_hitmask=return_hitmask,
    )
    # IMPORTANT: the hitmask marks chunks whose candidates produced hits
    # on the VISIT LIST above.  Visit-list slots are the occupied chunk
    # ids themselves (the kernel writes at csel[b, c]), so the returned
    # (nb, n_c) bitmap indexes GLOBAL chunk ids — directly consumable by
    # hit_visit_lists.
    return out
