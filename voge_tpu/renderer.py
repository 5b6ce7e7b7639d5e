"""Renderer API: ``GaussianRenderer`` / ``GaussianRenderSettings`` /
``Fragments`` and compositing helpers.

Same surface as the reference ``VoGE/Renderer.py`` so downstream code ports
with import changes only; internally a pure functional pipeline
(:func:`render_pipeline`) that is jit-compiled once per static configuration
and reused across calls.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from voge_tpu.aggregation import aggregation, expend_sigma, merge_final
from voge_tpu.cameras import PerspectiveCameras
from voge_tpu.ops.fine import ray_tracing
from voge_tpu.rays import camera_rays


@jax.tree_util.register_pytree_node_class
class Fragments:
    """Per-pixel render result (registered pytree).

    - ``vert_weight`` (B, H, W, M) float: occlusion-aware contribution
    - ``vert_index``  (B, H, W, M) int32: flattened kernel index (-1 invalid)
    - ``valid_num``   (B, H, W) int: number of valid slots
    - ``vert_hit_length`` (B, H, W, M) float: ray parameter of density peak

    Mirrors reference ``Renderer.py:13-50``.

    ``attr_ctx`` / ``attr_geom`` are an optional private fused-compositing
    context produced by :func:`render_pipeline` on TPU: the kernel-layout
    selections/weights plus the candidate-order metadata that let
    :func:`interpolate_attr` run as fused Pallas kernels instead of an XLA
    gather/scatter.  They are dropped by indexing/squeezing (the fallback
    path remains correct).  Assigning any data field after construction
    (e.g. ``frag.vert_weight = frag.vert_weight * m`` — a pattern the
    reference API supports) also drops the context: the ctx caches
    kernel-layout copies of the weights/indices, so the fused paths would
    otherwise silently read the stale originals while the segment_sum
    fallback honors the new arrays.

    ``overflow_points`` (scalar int32, or None when unavailable) counts
    candidate(bin, Gaussian) memberships the coarse stage DROPPED because a
    bin/supertile exceeded its static candidate capacity.  Zero means the
    render is exact; nonzero means a denser scene than the capacity
    heuristic planned for — raise ``max_point_per_bin`` to grow it.  (The
    reference silently truncates with only a device-side printf,
    ``rasterize_coarse.cu:154-170``.)  See :func:`get_overflow_points`.
    """

    def __init__(self, vert_weight, vert_index, valid_num, vert_hit_length,
                 attr_ctx=None, overflow_points=None, attr_img=None,
                 attr_geom=None):
        self.vert_weight = vert_weight
        self.vert_index = vert_index
        self.valid_num = valid_num
        self.vert_hit_length = vert_hit_length
        self.attr_ctx = attr_ctx
        self.overflow_points = overflow_points
        # (B, H, W, d) fused-compositing attribute image — populated when
        # the producing render was given ``attrs=`` (see render_pipeline);
        # equals interpolate_attr(self, attrs) with one fused kernel fewer
        self.attr_img = attr_img
        self.attr_geom = attr_geom

    _DATA_FIELDS = frozenset(
        ("vert_weight", "vert_index", "valid_num", "vert_hit_length")
    )

    def __setattr__(self, name, value):
        # Mutating a data field invalidates the fused-compositing context
        # (see the class docstring).  During __init__ the data fields are
        # assigned before attr_ctx exists, so construction never clears it.
        if name in Fragments._DATA_FIELDS and (
            getattr(self, "attr_ctx", None) is not None
        ):
            object.__setattr__(self, "attr_ctx", None)
            object.__setattr__(self, "attr_geom", None)
            object.__setattr__(self, "attr_img", None)
        object.__setattr__(self, name, value)

    def __getitem__(self, item):
        assert self.valid_num.ndim == 3, "Index access is only available when batched."
        return Fragments(
            vert_weight=self.vert_weight[item],
            vert_index=self.vert_index[item],
            valid_num=self.valid_num[item],
            vert_hit_length=self.vert_hit_length[item],
        )

    def __len__(self):
        return self.valid_num.shape[0]

    @property
    def shape(self):
        return (
            self.vert_weight.shape,
            self.vert_index.shape,
            self.valid_num.shape,
            self.vert_hit_length.shape,
        )

    def squeeze(self):
        assert self.valid_num.shape[0] == 1
        return self[0]

    def unsqueeze(self):
        assert self.valid_num.ndim == 2
        return Fragments(
            vert_weight=self.vert_weight[None],
            vert_index=self.vert_index[None],
            valid_num=self.valid_num[None],
            vert_hit_length=self.vert_hit_length[None],
        )

    def to_dict(self):
        return dict(
            vert_weight=self.vert_weight,
            vert_index=self.vert_index,
            valid_num=self.valid_num,
            vert_hit_length=self.vert_hit_length,
        )

    def copy(self):
        return Fragments(**self.to_dict())

    # pytree protocol
    def tree_flatten(self):
        return (
            (self.vert_weight, self.vert_index, self.valid_num,
             self.vert_hit_length, self.attr_ctx, self.overflow_points,
             self.attr_img),
            self.attr_geom,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, attr_geom=aux)


class GaussianRenderSettings:
    """Render configuration (reference ``Renderer.py:53-84``).

    Unknown keyword arguments are accepted and ignored for compatibility with
    reference demo scripts (which pass e.g. ``batch_size=-1``).
    """

    __slots__ = [
        "image_size",
        "max_assign",
        "thr_activation",
        "absorptivity",
        "inverse_sigma",
        "principal",
        "max_point_per_bin",
        "bin_size",
    ]

    def __init__(
        self,
        image_size: Union[int, Tuple[int, int]] = 256,
        max_assign: int = 20,
        thr_activation: float = 0.01,
        absorptivity: float = 1,
        inverse_sigma: bool = False,
        principal: Union[None, Tuple[int, int], Tuple[float, float]] = None,
        max_point_per_bin: Union[None, int] = None,
        bin_size: Union[None, int] = None,
        **kwargs,
    ):
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        self.image_size = tuple(int(v) for v in image_size)
        self.max_assign = int(max_assign)
        self.thr_activation = float(thr_activation)
        self.absorptivity = float(absorptivity)
        self.inverse_sigma = bool(inverse_sigma)
        self.principal = principal
        self.max_point_per_bin = max_point_per_bin
        self.bin_size = bin_size

    def __getitem__(self, item):
        return getattr(self, item)


# ---------------------------------------------------------------------------
# functional pipeline
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class CameraCtx:
    """Precomputed camera-static tensors for :func:`render_pipeline`.

    Ray directions/origins and the kernel-layout ray-feature planes depend
    only on (R, T, focal, principal, image geometry).  In a fitting loop
    they are identical every step, but XLA cannot hoist their ~1 ms
    construction out of the jitted step (the camera arrays are embedded
    constants, too large to constant-fold).  Build once with
    :func:`precompute_camera_ctx` and pass via ``cam_ctx=``;
    :class:`GaussianRenderer` does this caching automatically.  The context
    must match the camera parameters actually passed — it is an
    optimization cache, not an override (gradients w.r.t. cameras flow
    through the live ``R/T/focal/principal`` arguments; contexts built
    from them are treated as constants)."""

    def __init__(self, rays, origins, rf_k, geom):
        self.rays = rays
        self.origins = origins
        self.rf_k = rf_k
        self.geom = geom  # (H, W, bin_size) the rf_k planes were built for

    def tree_flatten(self):
        return (self.rays, self.origins, self.rf_k), self.geom

    @classmethod
    def tree_unflatten(cls, geom, leaves):
        return cls(leaves[0], leaves[1], leaves[2], geom)


def precompute_camera_ctx(
    R, T, focal, principal, image_size, n_gauss: int,
    max_assign: int = 20, bin_size=None, max_point_per_bin=None,
    device=None,
) -> "CameraCtx":
    """Build the camera-static context for :func:`render_pipeline` (see
    :class:`CameraCtx`).  ``n_gauss``/``max_assign``/``bin_size``/
    ``max_point_per_bin`` must match the render call — they determine the
    bin geometry (``voge_tpu.ops.fine.production_bin_geometry``).

    When the camera inputs are host values, the context math runs on the
    CPU backend (``host_setup_context``): under a remote accelerator
    attachment, running this one-time eager setup on the device costs a
    cold compile per distinct op, and the results — typically captured by
    an outer ``jax.jit`` as closure constants — force pathologically slow
    device->host readbacks at lowering time (the round-4 bench blowup;
    DESIGN_NOTES round-5).  The finished leaves are then placed once onto
    ``device`` (default: the default backend's first device) so the
    per-step render pays no host->device transfer.  Pass the context to
    jitted steps **as an argument**, not a closure, if you jit around
    :func:`render_pipeline` yourself."""
    from voge_tpu.ops import fine as F
    from voge_tpu.utils import host_setup_context

    H, W = int(image_size[0]), int(image_size[1])
    bs, _mppb = F.production_bin_geometry(
        (H, W), max_assign, n_gauss, bin_size, max_point_per_bin
    )
    BH = (H - 1) // bs + 1
    BW = (W - 1) // bs + 1

    def _build(R, T, focal, principal):
        rays, origins = camera_rays(R, T, focal, principal, (H, W))
        B = R.shape[0]
        rays_feat, _R, _Rp = F._rays_features(rays, BH, BW, bs, bs)
        rf_k, _, _ = F._group_supertiles(rays_feat, B, BH, BW)
        return rays, origins, rf_k

    with host_setup_context(R, T, focal, principal):
        R = jnp.asarray(R)
        T = jnp.asarray(T)
        focal = jnp.asarray(focal)
        principal = jnp.asarray(principal)
        # ONE jitted program instead of ~30 eager ops: a cold compilation
        # cache otherwise pays ~30 separate XLA-CPU compiles here
        # (measured ~100 s of the 1K workload's cold build — round 5)
        rays, origins, rf_k = jax.jit(_build)(R, T, focal, principal)
    ctx = CameraCtx(rays, origins, rf_k, (H, W, bs))
    if device is None and jax.default_backend() != "cpu":
        device = jax.devices()[0]
    if device is not None:
        ctx = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, device), ctx
        )
    return ctx


@partial(
    jax.jit,
    static_argnames=(
        "image_size", "max_assign", "thr_activation", "absorptivity",
        "inverse_sigma", "bin_size", "max_point_per_bin", "camera_grad",
    ),
)
def render_pipeline(
    verts: jax.Array,      # (B, N, 3) or (N, 3) world-space means
    sigmas: jax.Array,     # (N,), (N,3) or (N,3,3) (or batched (B,...))
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    *,
    image_size: Tuple[int, int],
    max_assign: int = 20,
    thr_activation: float = 0.01,
    absorptivity: float = 1.0,
    inverse_sigma: bool = False,
    bin_size: Optional[int] = None,
    max_point_per_bin: Optional[int] = None,
    cam_ctx: Optional["CameraCtx"] = None,
    camera_grad: bool = True,
    attrs: Optional[jax.Array] = None,
) -> Fragments:
    """Pure functional forward render (the body of reference
    ``Renderer.py:102-150``): generate rays, center verts on the camera,
    scale/invert sigmas, run coarse+fine ray tracing, composite weights.

    ``cam_ctx`` (optional): camera-static tensors from
    :func:`precompute_camera_ctx` — skips the per-step ray/feature
    construction in fitting loops.  Must have been built from the same
    camera parameters and geometry settings (the bin-geometry tag is
    checked; the camera arrays are trusted).

    ``camera_grad=False`` declares the camera pose non-differentiated (a
    fitting loop over fixed cameras): the fine backward skips the per-ray
    gradient pass entirely and returns zero ray gradients.  Leave True
    when optimizing R/T/focal through the renderer (pose estimation).

    ``attrs`` ((N, d) or (B, N, d), optional): per-kernel attributes to
    composite during the render — the returned Fragments carry
    ``attr_img = interpolate_attr(frag, attrs)`` with the whole attribute
    chain fused into the selection kernels on TPU (the reference's own
    renderer composites in the same forward, ``Renderer.py:130-150``).
    Differentiable w.r.t. ``attrs`` like ``interpolate_attr``."""
    # bf16/f16 geometry is accepted (the reference runs its renderer under
    # torch.cuda.amp.autocast, Utils.py:218-228) but the selection math is
    # accuracy-critical — promote to f32 at the boundary; Fragments are
    # always f32.
    if verts.dtype != jnp.float32:
        verts = verts.astype(jnp.float32)
    sigmas = jnp.asarray(sigmas)
    if sigmas.dtype != jnp.float32:
        sigmas = sigmas.astype(jnp.float32)
    sigmas = expend_sigma(sigmas)
    if verts.ndim == 2:
        verts = verts[None]
    B = R.shape[0]
    if verts.shape[0] == 1 and B > 1:
        verts = jnp.broadcast_to(verts, (B,) + verts.shape[1:])

    if cam_ctx is not None:
        rays, ray_origins = cam_ctx.rays, cam_ctx.origins
    else:
        rays, ray_origins = camera_rays(R, T, focal, principal, image_size)

    verts_transformed = verts - ray_origins[:, None, :]
    attrs_b = None
    if attrs is not None:
        attrs_b = jnp.asarray(attrs, jnp.float32)
        if attrs_b.ndim == 2:
            attrs_b = attrs_b[None]
        attrs_b = jnp.broadcast_to(
            attrs_b,
            (verts_transformed.shape[0],) + attrs_b.shape[1:],
        )
    if sigmas.ndim == 3:
        sigmas = jnp.broadcast_to(sigmas[None], (verts_transformed.shape[0],) + sigmas.shape)

    if inverse_sigma:
        from voge_tpu.utils import inv3x3

        isigma = 2.0 * inv3x3(sigmas)
    else:
        isigma = 2.0 * sigmas

    sel, ctx = ray_tracing(
        (R, T, focal, principal), verts_transformed, isigma, rays,
        image_size, thr=thr_activation, n_assign=max_assign,
        bin_size=bin_size, max_points_per_bin=max_point_per_bin,
        return_ctx=True, agg_ow=float(absorptivity),
        rf_cache=None if cam_ctx is None else {
            "rf_k": cam_ctx.rf_k, "geom": cam_ctx.geom,
        },
        camera_grad=camera_grad,
        attrs=attrs_b,
    )
    if len(sel) == 5:
        # O(K^2) erf compositing fused into the selection kernel (TPU) or
        # the selection custom-VJP (fallback); backward rematerializes the
        # cross matrix from the selection primals either way.  With a ctx,
        # ``sel`` is in KERNEL layout, so the fused attribute kernels get
        # the bin-layout weights for free and the fine VJP receives its
        # cotangents without re-binning shuffles.
        sel_idx, sel_len, sel_act, sel_dsd, vert_weight = sel
    else:
        sel_idx, sel_len, sel_act, sel_dsd = sel
        agg = jax.checkpoint(
            lambda i, a, l, d: aggregation(
                sel_idx=i, sel_act=a, sel_len=l, sel_dsd=d,
                occupation_weight=absorptivity,
            )[0]
        )
        vert_weight = agg(sel_idx, sel_act, sel_len, sel_dsd)

    if ctx is None or "geom" not in ctx:
        # image-layout selections (no-ctx paths); overflow from the coarse
        # counts when the culling path provided it, else exact (zero)
        ovf = (
            jnp.sum(ctx["overflow"]).astype(jnp.int32)
            if ctx is not None else jnp.zeros((), jnp.int32)
        )
        valid_num = jnp.sum(sel_idx >= 0, axis=-1)
        frag = Fragments(
            vert_weight=vert_weight,
            vert_index=sel_idx,
            valid_num=valid_num,
            vert_hit_length=sel_len,
            overflow_points=ovf,
        )
        if attrs is not None:
            frag.attr_img = interpolate_attr(frag, attrs)
        return frag

    from voge_tpu.ops.fine import unbin_kern

    geom = ctx["geom"]
    B_, H_, W_, BH, BW, bsh, bsw, grouped = geom[:8]
    mode = geom[12]
    ub = lambda x: unbin_kern(x, B_, BH, BW, H_, W_, bsh, bsw, grouped)
    vert_index = ub(sel_idx)
    if mode == "c":
        attr_ctx = (sel_idx, vert_weight, ctx["ids_c"], ctx["pos_c"],
                    ctx["counts_c"], ctx["perm"], ctx.get("dst"))
    else:
        attr_ctx = (sel_idx, vert_weight, ctx["mask_k"], ctx["ids_p"],
                    ctx["perm"])
    frag = Fragments(
        vert_weight=ub(vert_weight),
        vert_index=vert_index,
        valid_num=jnp.sum(vert_index >= 0, axis=-1),
        vert_hit_length=ub(sel_len),
        attr_ctx=attr_ctx,
        overflow_points=jnp.sum(ctx["overflow"]).astype(jnp.int32),
        attr_geom=geom,
    )
    if attrs is not None:
        if "img_t" in ctx:
            # fused in-kernel attribute image: (nb, Ca, R_pad) transposed
            # kernel layout -> (B, H, W, d)
            img_k = jnp.swapaxes(ctx["img_t"], 1, 2)
            d = attrs.shape[-1]
            frag.attr_img = ub(img_k)[..., :d]
        else:
            frag.attr_img = interpolate_attr(frag, attrs)
    return frag


class GaussianRenderer:
    """Stateful convenience wrapper (reference ``Renderer.py:87-150``).

    Holds a camera batch and settings; per-call kwargs ``R``, ``T``,
    ``focal``, ``principal`` update the cameras (reference
    ``Renderer.py:104-109``).  The functional core is jitted; repeated calls
    with the same static configuration reuse the compiled executable.
    """

    to_set_args = ["R", "T", "focal", "principal"]

    def __init__(self, cameras: PerspectiveCameras, render_settings):
        if isinstance(render_settings, dict):
            render_settings = GaussianRenderSettings(**render_settings)
        self.cameras = cameras
        self.render_settings = render_settings

    def to(self, device=None):
        return self

    @property
    def device(self):
        return None

    def forward(self, gmeshes, **kwargs) -> Fragments:
        assert not self.cameras.in_ndc(), (
            "Got NDC camera. Cameras.in_ndc must be set to false."
        )
        for k_arg in kwargs:
            if k_arg in self.to_set_args:
                setattr(self.cameras, k_arg, jnp.asarray(kwargs[k_arg]))

        verts, sigmas, _radians = gmeshes()
        s = self.render_settings
        B = max(self.cameras.R.shape[0], 1 if verts.ndim == 2 else verts.shape[0])
        R, T, focal, principal = self.cameras.batched_params(B)
        n_gauss = verts.shape[-2]
        return render_pipeline(
            verts, sigmas, R, T, focal, principal,
            image_size=tuple(s.image_size),
            max_assign=s.max_assign,
            thr_activation=s.thr_activation,
            absorptivity=s.absorptivity,
            inverse_sigma=s.inverse_sigma,
            bin_size=s.bin_size,
            max_point_per_bin=s.max_point_per_bin,
            cam_ctx=self._cached_camera_ctx(R, T, focal, principal, s,
                                            n_gauss),
        )

    def _cached_camera_ctx(self, R, T, focal, principal, s, n_gauss):
        """Camera-static context, memoized on the concrete camera bytes —
        fitting loops that re-render with unchanged cameras skip the ~1 ms
        per-step ray-feature construction.  Traced cameras (this call is
        inside a user jit/grad) skip the cache: tracers have no stable
        bytes and gradients must flow through the live arrays."""
        import numpy as _np

        arrs = (R, T, focal, principal)
        if any(isinstance(a, jax.core.Tracer) for a in arrs):
            return None
        key = (
            tuple(_np.asarray(a).tobytes() for a in arrs),
            tuple(s.image_size), int(s.max_assign), s.bin_size,
            s.max_point_per_bin, int(n_gauss),
        )
        if getattr(self, "_cam_ctx_key", None) == key:
            return self._cam_ctx_val
        ctx = precompute_camera_ctx(
            R, T, focal, principal, tuple(s.image_size), int(n_gauss),
            max_assign=int(s.max_assign), bin_size=s.bin_size,
            max_point_per_bin=s.max_point_per_bin,
        )
        self._cam_ctx_key, self._cam_ctx_val = key, ctx
        return ctx

    __call__ = forward


# ---------------------------------------------------------------------------
# compositing helpers (reference ``Renderer.py:153-176``)
# ---------------------------------------------------------------------------

def interpolate_attr(fragments: Fragments, vert_attr: jax.Array) -> jax.Array:
    """Composite per-kernel attributes into an attribute map.

    ``fragments.vert_index`` stores *flattened* (b * N + n) indices; when the
    camera batch is > 1 and ``vert_attr`` has only N rows it is tiled over the
    batch (the reference requires callers to do this themselves).

    On TPU, fragments produced by :func:`render_pipeline` carry a fused
    compositing context and this runs as Pallas kernels (no gather/scatter);
    otherwise it falls back to the XLA ``merge_final``."""
    ctx = getattr(fragments, "attr_ctx", None)
    if ctx is not None and jax.default_backend() == "tpu":
        from voge_tpu.ops.fine import _kern_k_ok

        if _kern_k_ok(fragments.vert_index.shape[-1]):
            out = _interpolate_attr_fused(fragments, vert_attr)
            # fused kernels compute in f32; return per promotion rules so
            # bf16 attrs against f32 weights match the XLA fallback
            dt = jnp.result_type(vert_attr.dtype, fragments.vert_weight.dtype)
            return out.astype(dt)
    n_needed = int(fragments.vert_index.shape[0])
    idx = fragments.vert_index
    if (
        fragments.valid_num.ndim == 3
        and n_needed > 1
        and vert_attr.ndim == 2
    ):
        vert_attr = jnp.tile(vert_attr, (n_needed, 1))
    return merge_final(
        vert_attr=vert_attr,
        weight=fragments.vert_weight,
        valid_num=fragments.valid_num,
        vert_assign=idx,
    )


def _interpolate_attr_fused(fragments: Fragments, vert_attr: jax.Array):
    """Fused Pallas path: attribute planes in candidate order are contracted
    against the kernel-layout selections over the compacted candidate space
    (voge_tpu/ops/pallas_attr.py)."""
    from voge_tpu.ops.fine import unbin_kern
    from voge_tpu.ops.pallas_attr import attr_merge_binned, attr_merge_compact

    geom = fragments.attr_geom
    B, H, W, BH, BW, bsh, bsw, grouped, bh_bw, chunk_or_mmax, P, P_pad, mode = (
        geom
    )
    d = vert_attr.shape[-1]
    attr = vert_attr.astype(jnp.float32)
    if attr.ndim == 2 and attr.shape[0] == P and B > 1:
        attr = jnp.broadcast_to(attr[None], (B, P, d))
    else:
        attr = attr.reshape(B, P, d)
    if mode == "c":
        perm = fragments.attr_ctx[-2]
    else:
        perm = fragments.attr_ctx[-1]
    if perm is not None:
        attr = jnp.take_along_axis(attr, perm[:, :, None], axis=1)
    # planes layout (B, Ca_pad, P_pad), sorted candidate order
    Ca = -(-d // 8) * 8
    planes = jnp.swapaxes(attr, 1, 2)
    planes = jnp.pad(planes, ((0, 0), (0, Ca - d), (0, P_pad - P)))
    if mode == "c":
        sel_k, w_k, ids_c, pos_c, counts_c, _, dst = fragments.attr_ctx
        w_eff = jnp.where(sel_k >= 0, w_k, 0.0)
        img_k = attr_merge_compact(
            planes, w_eff, sel_k, ids_c, pos_c, counts_c, dst, B, False
        )
    else:
        sel_k, w_k, mask_k, ids_p, _ = fragments.attr_ctx
        w_eff = jnp.where(sel_k >= 0, w_k, 0.0)
        img_k = attr_merge_binned(
            planes, w_eff, sel_k, mask_k, ids_p, bh_bw, chunk_or_mmax, False
        )
    img = unbin_kern(img_k, B, BH, BW, H, W, bsh, bsw, grouped)
    return img[..., :d]


def get_overflow_points(fragments: Fragments) -> int:
    """Total candidate memberships dropped by the coarse stage's capacity
    caps for this render (0 = exact).  Nonzero means the scene is denser
    than the per-bin candidate capacity; raise
    ``GaussianRenderSettings.max_point_per_bin`` to grow it.  Returns 0 when
    the producing path did not track overflow (e.g. fragments rebuilt by
    indexing/squeezing).

    Reference behavior being improved on: the CUDA coarse stage printf's a
    warning device-side and silently truncates (rasterize_coarse.cu:154-170).
    """
    ovf = getattr(fragments, "overflow_points", None)
    if ovf is None:
        return 0
    return int(ovf)


def get_silhouette(fragments: Fragments) -> jax.Array:
    """Per-pixel silhouette = min(sum_k w_k, 1) (reference
    ``Renderer.py:168-171``).

    On ctx-carrying fragments the sum runs in KERNEL layout and only the
    (B, H, W) result is unbinned: a loss that composites through
    ``interpolate_attr`` and this silhouette then never reads the unbinned
    per-slot fields at all, so XLA dead-codes the whole Fragments
    unbin/re-bin round trip (fwd transposes + their backward re-binning of
    the weight cotangents).  Same values either way — unbinning is a
    permutation and the K-sum order is unchanged."""
    ctx = getattr(fragments, "attr_ctx", None)
    geom = getattr(fragments, "attr_geom", None)
    if ctx is not None and geom is not None:
        from voge_tpu.ops.fine import unbin_kern

        B, H, W, BH, BW, bsh, bsw, grouped = geom[:8]
        sel_k, w_k = ctx[0], ctx[1]
        w = jnp.sum(jnp.where(sel_k >= 0, w_k, 0.0), axis=-1,
                    keepdims=True)                           # (nb, R, 1)
        img = unbin_kern(w, B, BH, BW, H, W, bsh, bsw, grouped)[..., 0]
        return jnp.minimum(img, jnp.ones_like(img))
    merged_weight = fragments.vert_weight.sum(-1)
    return jnp.minimum(merged_weight, jnp.ones_like(merged_weight))


def to_colored_background(
    fragments: Fragments, colors: jax.Array,
    background_color=(1.0, 1.0, 1.0), thr: float = -1,
) -> jax.Array:
    masks = get_silhouette(fragments)[..., None]
    background_color = jnp.asarray(background_color, dtype=colors.dtype)
    if thr > 0:
        masks = (masks > thr).astype(masks.dtype)
    rgb = interpolate_attr(fragments, colors)
    return jnp.minimum(
        rgb + jnp.ones_like(rgb) * (1 - masks) * background_color,
        jnp.ones_like(rgb),
    )


def to_white_background(fragments: Fragments, colors: jax.Array, thr: float = -1):
    return to_colored_background(
        fragments=fragments, colors=colors, background_color=(1.0, 1.0, 1.0),
        thr=thr,
    )
