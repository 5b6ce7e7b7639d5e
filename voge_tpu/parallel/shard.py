"""Multi-chip sharding over a ``jax.sharding.Mesh``.

The reference's only distributed component is a thread-based multi-GPU
data-parallel batchifier (``Utils.py:179-333``: replicate the function,
shard the batch dim over local CUDA devices, gather to the source device).
The TPU-native equivalents here use SPMD collectives over ICI instead:

  - **camera-axis data parallelism** (``data`` mesh axis): each chip renders
    its slice of the camera batch — the NeMo render-and-compare axis;
  - **Gaussian-axis sharding** (``model`` mesh axis, the context-parallel
    analog): each chip owns P/D Gaussians, runs coarse+fine selection against
    its local shard, then the per-pixel K-lists are ``all_gather``-ed along
    the axis and re-reduced to the global top-K.  Selection is exact: the
    global K nearest survive the two-stage reduction because each shard
    keeps its own K nearest.
  - **ring variant** (``ring=True``): instead of widening the per-pixel
    lists to (shards * K) with an all-gather, the Gaussian *blocks*
    (verts + sigmas) rotate around the model axis with ``ppermute`` (ICI
    neighbor traffic); each chip folds one visiting block per step into its
    running per-pixel top-K — the ring-attention structure applied to top-K
    selection.  Per-pixel state stays K wide regardless of shard count, and
    block transfer overlaps with the local selection work.  Exact: after
    ``m`` steps every chip has reduced over every Gaussian.

Both compose: ``render_pipeline_sharded`` runs under ``shard_map`` on a
('data', 'model') mesh and is differentiable end-to-end (shard_map
transposes all_gather / ppermute to their adjoints automatically).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voge_tpu.aggregation import aggregation
from voge_tpu.cameras import camera_centers
from voge_tpu.ops.fine import ray_tracing, _SENTINEL_LEN, _SENTINEL_ACT
from voge_tpu.rays import camera_rays
from voge_tpu.renderer import Fragments, render_pipeline
from voge_tpu.aggregation import expend_sigma


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    With ``shape=None`` all devices go to the first axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def _merge_topk(sel_idx, sel_len, sel_act, sel_dsd, K: int, axis_name: str):
    """all_gather per-shard K-lists along ``axis_name`` and keep the global
    K nearest (ascending hit length, invalid slots filled like the fine op)."""
    gathered = [
        jax.lax.all_gather(x, axis_name, axis=x.ndim - 1, tiled=True)
        for x in (sel_idx, sel_len, sel_act, sel_dsd)
    ]
    g_idx, g_len, g_act, g_dsd = gathered
    valid = g_idx >= 0
    len_masked = jnp.where(valid, g_len, _SENTINEL_LEN)
    kk = min(K, g_len.shape[-1])
    neg_vals, args = jax.lax.top_k(-len_masked, kk)
    sel_ok = jnp.take_along_axis(valid, args, axis=-1)
    out_idx = jnp.where(sel_ok, jnp.take_along_axis(g_idx, args, axis=-1), -1)
    out_len = jnp.where(sel_ok, -neg_vals, _SENTINEL_LEN)
    out_act = jnp.where(
        sel_ok, jnp.take_along_axis(g_act, args, axis=-1), _SENTINEL_ACT
    )
    out_dsd = jnp.where(sel_ok, jnp.take_along_axis(g_dsd, args, axis=-1), 0.0)
    return out_idx, out_len, out_act, out_dsd


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "image_size", "max_assign", "thr_activation", "absorptivity",
        "inverse_sigma", "bin_size", "max_point_per_bin", "data_axis",
        "model_axis", "ring",
    ),
)
def render_pipeline_sharded(
    verts: jax.Array,      # (N, 3) world-space means (unbatched scene)
    sigmas: jax.Array,     # (N,) / (N,3) / (N,3,3)
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    *,
    mesh: Mesh,
    image_size: Tuple[int, int],
    max_assign: int = 20,
    thr_activation: float = 0.01,
    absorptivity: float = 1.0,
    inverse_sigma: bool = False,
    bin_size: Optional[int] = None,
    max_point_per_bin: Optional[int] = None,
    data_axis: str = "data",
    model_axis: Optional[str] = "model",
    ring: bool = False,
) -> Fragments:
    """Multi-chip forward render: cameras sharded over ``data_axis``,
    Gaussians sharded over ``model_axis`` (set ``model_axis=None`` to
    replicate the scene).  With ``ring=True`` the model axis uses the
    ppermute ring (Gaussian blocks rotate; per-pixel state stays K wide)
    instead of the all-gather K-list merge — prefer it when
    ``model_size * K`` per pixel is large.

    Constraints: B divisible by the data axis size, N by the model axis
    size.  Returned fragment indices are *global* (b * N + n), identical to
    the single-chip renderer.

    Jitted with the mesh/config static: calling eagerly would dispatch every
    ``shard_map`` primitive separately (orders of magnitude slower).
    """
    sigmas = expend_sigma(sigmas)
    B = R.shape[0]
    N = verts.shape[0]
    d_size = mesh.shape[data_axis]
    m_size = mesh.shape[model_axis] if model_axis is not None else 1
    assert B % d_size == 0, f"camera batch {B} not divisible by {d_size}"
    assert N % m_size == 0, f"num Gaussians {N} not divisible by {m_size}"
    axes = ([model_axis] if model_axis else [])

    if model_axis is None:
        # Scene replicated (pure camera DP): each shard's local render IS
        # final, so the full single-device pipeline runs per shard and the
        # fused-compositing context survives the shard_map boundary —
        # `interpolate_attr_sharded` / `sample_features_sharded` re-enter
        # the mesh and hit the fused Pallas paths (round-2 weakness: the DP
        # path used to silently lose them).
        return _replicated_dp_render(
            verts, sigmas, R, T, focal, principal, mesh=mesh,
            data_axis=data_axis, image_size=image_size,
            max_assign=max_assign, thr_activation=thr_activation,
            absorptivity=absorptivity, inverse_sigma=inverse_sigma,
            bin_size=bin_size, max_point_per_bin=max_point_per_bin,
        )

    def _select_block(verts_l, sigmas_l, R_l, T_l, f_l, p_l, src_shard,
                      size=None):
        """Selection of one Gaussian block for the local cameras; returns
        K-lists with indices mapped to the global (b * N + n) space using
        the block's origin shard.  Compositing runs on the MERGED selection
        (weights are not mergeable across shards)."""
        size = image_size if size is None else size
        B_l = R_l.shape[0]
        N_l = verts_l.shape[0]
        rays, origins = camera_rays(R_l, T_l, f_l, p_l, size)
        verts_t = verts_l[None] - origins[:, None, :]
        verts_t = jnp.broadcast_to(verts_t, (B_l, N_l, 3))
        sig = jnp.broadcast_to(sigmas_l[None], (B_l, N_l, 3, 3))
        from voge_tpu.utils import inv3x3

        isig = 2.0 * inv3x3(sig) if inverse_sigma else 2.0 * sig
        sel, ovf = ray_tracing(
            (R_l, T_l, f_l, p_l), verts_t, isig, rays, size,
            thr=thr_activation, n_assign=max_assign,
            bin_size=bin_size, max_points_per_bin=max_point_per_bin,
            return_overflow=True,
        )
        sel_idx, sel_len, sel_act, sel_dsd = sel[:4]
        if src_shard is not None:
            # local (b * N_l + p) -> global (b * N + src_shard * N_l + p)
            valid = sel_idx >= 0
            b_of = sel_idx // N_l
            p_of = sel_idx % N_l
            g_idx = b_of * N + src_shard * N_l + p_of
            sel_idx = jnp.where(valid, g_idx, -1)
        return (sel_idx, sel_len, sel_act, sel_dsd), ovf

    def _merge2(a, b, K):
        """Keep the K nearest of two per-pixel K-lists (ring-step fold)."""
        cat = [jnp.concatenate([x, y], axis=-1) for x, y in zip(a, b)]
        g_idx, g_len, g_act, g_dsd = cat
        valid = g_idx >= 0
        len_masked = jnp.where(valid, g_len, _SENTINEL_LEN)
        neg_vals, args = jax.lax.top_k(-len_masked, K)
        ok = jnp.take_along_axis(valid, args, axis=-1)
        return (
            jnp.where(ok, jnp.take_along_axis(g_idx, args, axis=-1), -1),
            jnp.where(ok, -neg_vals, _SENTINEL_LEN),
            jnp.where(ok, jnp.take_along_axis(g_act, args, -1), _SENTINEL_ACT),
            jnp.where(ok, jnp.take_along_axis(g_dsd, args, -1), 0.0),
        )

    def local_render(verts_l, sigmas_l, R_l, T_l, f_l, p_l):
        if ring:
            # Ring decomposition (the ring-attention structure): the model
            # axis shards the PIXEL ROWS (queries) — this chip renders rows
            # [my*H_l, (my+1)*H_l), realized by shifting the principal
            # point — while Gaussian BLOCKS (the KV analog) rotate around
            # the axis with ppermute.  Per-pixel state stays K wide, block
            # transfer is ICI neighbor traffic, and after m steps this
            # chip's rows have been reduced over every Gaussian.
            my = jax.lax.axis_index(model_axis)
            H_l = image_size[0] // m_size
            shift = jnp.stack(
                [jnp.zeros_like(p_l[:, 0]),
                 jnp.full_like(p_l[:, 1], 1.0) * (my * H_l)], axis=-1,
            )
            p_rows = p_l - shift
            sub_size = (H_l, image_size[1])
            blk_v, blk_s = verts_l, sigmas_l
            run, ovf = None, jnp.int32(0)
            perm = [(i, (i + 1) % m_size) for i in range(m_size)]
            for s in range(m_size):
                src = (my - s) % m_size
                sel, ovf_s = _select_block(
                    blk_v, blk_s, R_l, T_l, f_l, p_rows, src,
                    size=sub_size,
                )
                ovf = ovf + ovf_s
                run = sel if run is None else _merge2(run, sel, max_assign)
                if s < m_size - 1:
                    blk_v = jax.lax.ppermute(blk_v, model_axis, perm)
                    blk_s = jax.lax.ppermute(blk_s, model_axis, perm)
            sel_idx, sel_len, sel_act, sel_dsd = run
        else:
            shard = jax.lax.axis_index(model_axis)
            (sel_idx, sel_len, sel_act, sel_dsd), ovf = _select_block(
                verts_l, sigmas_l, R_l, T_l, f_l, p_l, shard
            )
            sel_idx, sel_len, sel_act, sel_dsd = _merge_topk(
                sel_idx, sel_len, sel_act, sel_dsd, max_assign, model_axis
            )
        # Fix batch offset to the *global* camera index so fragment indices
        # match the single-chip renderer.
        if d_size > 1:
            dshard = jax.lax.axis_index(data_axis)
            valid = sel_idx >= 0
            sel_idx = jnp.where(
                valid, sel_idx + dshard * R_l.shape[0] * N, -1
            )
        vert_weight, _, _, _ = aggregation(
            sel_idx=sel_idx, sel_act=sel_act, sel_len=sel_len,
            sel_dsd=sel_dsd, occupation_weight=absorptivity,
        )
        valid_num = jnp.sum(sel_idx >= 0, axis=-1)
        # total dropped candidates across every shard (replicated scalar)
        ovf_tot = jax.lax.psum(
            jax.lax.psum(ovf, model_axis), data_axis
        )
        return vert_weight, sel_idx, valid_num, sel_len, ovf_tot

    model_spec = P(model_axis) if model_axis else P()
    model_spec33 = P(model_axis, None, None) if model_axis else P()
    if ring and model_axis is not None:
        # pixel rows sharded over the model axis (dim 1 of (B, H, W, ...))
        assert image_size[0] % m_size == 0, (
            f"image height {image_size[0]} not divisible by model axis "
            f"size {m_size} (required for ring=True)"
        )
        out_spec = P(data_axis, model_axis)
    else:
        out_spec = P(data_axis)
    out = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(
            model_spec,
            model_spec33,
            P(data_axis), P(data_axis), P(data_axis), P(data_axis),
        ),
        out_specs=(out_spec, out_spec, out_spec, out_spec, P()),
        check_vma=False,
    )(verts, sigmas, R, T, focal, principal)
    vert_weight, sel_idx, valid_num, sel_len, ovf = out
    return Fragments(
        vert_weight=vert_weight, vert_index=sel_idx, valid_num=valid_num,
        vert_hit_length=sel_len, overflow_points=ovf,
    )


def _replicated_dp_render(
    verts, sigmas, R, T, focal, principal, *, mesh, data_axis, **rp_kwargs
):
    """Camera-DP render with the scene replicated: the full single-device
    :func:`voge_tpu.renderer.render_pipeline` runs per shard under
    ``shard_map``, so the returned :class:`Fragments` keeps the
    fused-compositing context (``attr_ctx``) — shard-local, self-consistent.
    ``vert_index`` is re-offset to the *global* camera index outside the
    shard_map (the ctx stays local; :func:`interpolate_attr_sharded` /
    :func:`sample_features_sharded` restore local indices on re-entry)."""
    d_size = mesh.shape[data_axis]
    B = R.shape[0]
    N = verts.shape[0]
    geom_box = {}

    def body(verts_r, sigmas_r, R_l, T_l, f_l, p_l):
        frag = render_pipeline(verts_r, sigmas_r, R_l, T_l, f_l, p_l,
                               **rp_kwargs)
        geom_box["geom"] = frag.attr_geom
        ovf = frag.overflow_points
        if ovf is None:
            ovf = jnp.zeros((), jnp.int32)
        ovf = jax.lax.psum(ovf, data_axis)
        return (
            (frag.vert_weight, frag.vert_index, frag.valid_num,
             frag.vert_hit_length, frag.attr_ctx),
            ovf,
        )

    data, ovf = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P(data_axis), P(data_axis),
                  P(data_axis)),
        out_specs=(P(data_axis), P()),
        check_vma=False,
    )(verts, sigmas, R, T, focal, principal)
    vw, vi, vn, vl, ctx = data
    B_l = B // d_size
    off = (jnp.arange(B, dtype=vi.dtype) // B_l) * (B_l * N)
    vi = jnp.where(vi >= 0, vi + off[:, None, None, None], -1)
    return Fragments(
        vert_weight=vw, vert_index=vi, valid_num=vn, vert_hit_length=vl,
        attr_ctx=ctx, overflow_points=ovf, attr_geom=geom_box.get("geom"),
    )


def _local_fragments(data, geom):
    """Rebuild the shard-local Fragments inside a helper's shard_map body:
    restore shard-local flattened indices (the producing shard_map offset
    them to global camera indices) and re-attach the static geometry."""
    vw, vi, vn, vl, ctx = data
    B_l = vw.shape[0]
    N = geom[10]
    vi = jnp.where(vi >= 0, vi % (B_l * N), -1)
    return Fragments(vert_weight=vw, vert_index=vi, valid_num=vn,
                     vert_hit_length=vl, attr_ctx=ctx, attr_geom=geom)


def _frag_data(frag):
    return (frag.vert_weight, frag.vert_index, frag.valid_num,
            frag.vert_hit_length, frag.attr_ctx)


def interpolate_attr_sharded(frag, vert_attr, mesh, data_axis: str = "data"):
    """Attribute compositing on a data-sharded ctx-carrying Fragments (from
    :func:`render_pipeline_sharded` with ``model_axis=None``): re-enters the
    mesh with ``shard_map`` so the fused Pallas compositing kernels run per
    shard (on TPU) instead of the XLA gather fallback.

    ``vert_attr``: (N, C) scene attributes (replicated) or (B*N, C)
    per-camera attributes (sharded with the batch).
    """
    from voge_tpu.renderer import interpolate_attr

    geom = getattr(frag, "attr_geom", None)
    if geom is None:
        return interpolate_attr(frag, vert_attr)
    Np = geom[10]
    attr_spec = P() if vert_attr.shape[0] == Np else P(data_axis)

    def body(data, attr):
        return interpolate_attr(_local_fragments(data, geom), attr)

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(data_axis), attr_spec),
        out_specs=P(data_axis), check_vma=False,
    ))(_frag_data(frag), vert_attr)


def sample_features_sharded(frag, image, n_vert: int, mesh,
                            data_axis: str = "data"):
    """Inverse rendering on a data-sharded ctx-carrying Fragments: each
    shard scatters its own cameras' pixels onto its (b, n) rows — disjoint
    row ranges, so the global (n_vert, C) result is the concatenation (no
    collective needed).  Requires ``n_vert == B * N`` (the flattened-index
    convention of batched fragments).
    """
    from voge_tpu.sampler import sample_features

    geom = getattr(frag, "attr_geom", None)
    if geom is None:
        return sample_features(frag, image, n_vert=n_vert)
    d_size = mesh.shape[data_axis]
    B = frag.vert_weight.shape[0]
    Np = geom[10]
    assert n_vert == B * Np, (
        f"sample_features_sharded needs n_vert == B * N ({B} * {Np}); "
        f"got {n_vert}"
    )
    n_local = n_vert // d_size

    def body(data, img):
        fr = _local_fragments(data, geom)
        return sample_features(fr, img, n_vert=n_local)

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)), check_vma=False,
    ))(_frag_data(frag), image)


class DataParallelBatchifier:
    """API-parity replacement for the reference's thread-based multi-GPU
    batchifier (``Utils.py:179-333``): shards designated kwargs' batch axis
    over a 1-D device mesh and lets XLA/SPMD partition the (jitted) function.

    Unlike the reference there are no per-device threads, no host copies and
    no replication bugs to worry about: sharding is declarative.
    """

    def __init__(
        self,
        batch_size: int,
        batch_args,
        target_dims=None,
        remain_dims=None,
        device=None,
        mesh: Optional[Mesh] = None,
    ):
        from voge_tpu.parallel.batchify import batchify

        self.mesh = mesh if mesh is not None else make_mesh(("dp",))
        self.axis = self.mesh.axis_names[0]
        self.batch_size = batch_size
        self.batch_args = (batch_args,) if isinstance(batch_args, str) else tuple(batch_args)
        self.target_dims = target_dims
        self.remain_dims = remain_dims
        self._batchify = batchify

    def __call__(self, func):
        mesh, axis, batch_args = self.mesh, self.axis, self.batch_args

        def sharded_fn(*args, **kwargs):
            n_dev = mesh.devices.size
            orig_len = None
            for k in batch_args:
                x = kwargs[k]
                # shard the leading (raveled) axis, padding it up to a device
                # multiple first (edge mode: replicated rows stay valid
                # inputs); outputs are cropped back below.
                orig_len = x.shape[0]
                if orig_len % n_dev:
                    pad = [(0, 0)] * x.ndim
                    pad[0] = (0, n_dev - orig_len % n_dev)
                    x = jnp.pad(x, pad, mode="edge")
                spec = P(*([axis] + [None] * (x.ndim - 1)))
                kwargs[k] = jax.device_put(x, NamedSharding(mesh, spec))
            out = func(*args, **kwargs)
            if orig_len is not None and orig_len % n_dev:
                crop = lambda y: (
                    y[:orig_len]
                    if hasattr(y, "ndim") and y.ndim > 0
                    and y.shape[0] > orig_len else y
                )
                out = jax.tree_util.tree_map(crop, out)
            return out

        return self._batchify(
            sharded_fn, self.batch_size, self.batch_args,
            self.target_dims, self.remain_dims,
        )
