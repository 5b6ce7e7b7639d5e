"""End-to-end parity gate vs the literal full-chain reference oracle.

The BASELINE.md north star: <1e-4 max pixel error (and gradient error,
relative to the gradient's max magnitude) against the reference chain, per
config.  The oracle (:mod:`tests.oracle_full`) transcribes the full
reference pipeline — pytorch3d raysampler, NDC coarse binning, the CUDA
fine hot loop — into torch float64 and runs the REFERENCE's own torch
``Aggregation`` module for compositing, so everything downstream of ray
generation is independent of the voge_tpu implementation.

Fast subset: small frames of each path class (binned, no-coarse,
non-square, sample_features).  The full six BASELINE.md configs run in
``tools/parity_gate.py`` (slow; results recorded in PARITY.json) and as
``@slow`` tests here.

Truncation note: gate configs pass ``max_point_per_bin >= P`` so neither
side truncates (the reference's overflow drop order is nondeterministic —
``rasterize_coarse.cu:153-170`` — so bit-parity under overflow is undefined
even between two reference runs).  Truncation-rule parity (deterministic
ascending) is covered separately by the coarse-op tests.

Gate methodology (two claims, both necessary):

1. **Exactness (float64)**: running OUR pipeline in float64 must match the
   float64 oracle to ~1e-9 — proving the voge_tpu chain computes the *same
   mathematical function* as the reference chain (conventions, culling,
   selection, compositing), with no tolerance hiding a convention error.

2. **float32 envelope (production dtype)**: the f32 pipeline drifts from
   the f64 function by an amount *inherent to any f32 implementation of
   this chain* — measured decomposition (tools/parity_gate.py): the fine
   stage rounds hit lengths to a few f32 ulp (~2.5e-6 abs), which the erf
   compositing amplifies by sqrt(dsd) (up to ~1e2 at the benchmark sigma
   scales) into ~3e-4 weight error; the CUDA reference's own f32 outputs
   carry the same envelope (its float atomics are not even
   run-deterministic).  The f32 gate therefore:

   - requires the selection to match exactly except knife-edge candidates
     whose activation sits within f32 epsilon of the threshold — flipped
     pixels must be a vanishing fraction (< 0.1%),
   - gates |pixel error| on agreeing pixels at the amplification envelope
     (1.5e-3, ~2.5x margin over the worst measured config),
   - bounds flipped pixels by the physical weight ceiling of a
     threshold-grazing kernel (w <= e^0.5 * thr ~ 0.017, |d pixel| < 3e-2
     through unit-range attributes).

   On small frames / moderate dsd the measured f32 error is well under
   1e-4 (the north-star figure); the per-config numbers are recorded in
   PARITY.json by ``tools/parity_gate.py``.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voge_tpu.aggregation import expend_sigma
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import (
    get_silhouette,
    render_pipeline,
    to_white_background,
)

from oracle_full import (
    reference_render,
    reference_sample_features,
    reference_silhouette,
    reference_white_background,
)

EXACT_TOL = 1e-9       # ours-f64 vs oracle-f64 (same mathematical function)
PIXEL_TOL = 1.5e-3     # f32 amplification envelope (module docstring)
GRAD_TOL = 1e-4        # max|dg| / max|g_oracle|
FLIP_FRAC_TOL = 1e-3   # fraction of pixels with knife-edge selection flips
FLIP_PIXEL_TOL = 3e-2  # e^0.5 * thr weight ceiling through unit attributes


def _torch():
    import torch

    return torch


def _flip_mask(frag, fd):
    """(B, H, W) bool: pixels whose selected index lists differ (knife-edge
    threshold flips; see module docstring)."""
    i1 = np.asarray(frag.vert_index)
    i2 = fd["vert_index"].numpy()
    return (i1 != i2).any(axis=-1)


def _gate_images(frag, fd, pairs, tol=PIXEL_TOL):
    """Assert parity for (ours, oracle) image pairs under the knife-edge
    methodology; returns the flip mask."""
    flips = _flip_mask(frag, fd)
    assert flips.mean() < FLIP_FRAC_TOL, flips.mean()
    for ours, oracle in pairs:
        d = np.abs(np.asarray(ours) - oracle.numpy())
        d2 = d.reshape(flips.shape + (-1,))
        assert d2[~flips].max() < tol, d2[~flips].max()
        if flips.any():
            assert d2[flips].max() < FLIP_PIXEL_TOL, d2[flips].max()
    return flips


def _run_pair(ref, verts, sigmas, colors, R, T, focal, principal, H, W, K,
              mppb, dtype_oracle=None):
    """Run our pipeline (f32) and the oracle (f64); return both sides'
    (img, sil, frag/fragdict)."""
    torch = _torch()
    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float64)
    sig33 = np.asarray(expend_sigma(jnp.asarray(sigmas)))

    frag = render_pipeline(
        jnp.asarray(verts), jnp.asarray(sigmas), R, T,
        jnp.asarray(focal), jnp.asarray(principal),
        image_size=(H, W), max_assign=K, max_point_per_bin=mppb,
    )
    img = to_white_background(frag, jnp.asarray(colors))
    sil = get_silhouette(frag)

    fd = reference_render(
        ref, t(verts), t(sig33), t(np.asarray(R)), t(np.asarray(T)),
        t(focal), t(principal), (H, W), max_assign=K, max_point_per_bin=mppb,
    )
    img_o = reference_white_background(ref, fd, t(colors))
    sil_o = reference_silhouette(fd)
    return (img, sil, frag), (img_o, sil_o, fd)


def _cuboid_scene(n, seed_colors=True):
    g = Cuboid.cuboid_gauss(
        (-1, 1), (-1, 1), (-1, 1), n, percentage=0.6, as_obj=True
    )
    verts = np.asarray(g.verts).astype(np.float32)
    sigmas = np.asarray(g.sigmas).astype(np.float32)
    colors = ((verts + 1) / 3).astype(np.float32)
    return verts, sigmas, colors


def _run_pair_f64(ref, verts, sigmas, colors, R, T, focal, principal, H, W,
                  K, mppb):
    """Run OUR pipeline in float64 (x64 mode) and the f64 oracle."""
    torch = _torch()
    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float64)
    sig33 = np.asarray(expend_sigma(jnp.asarray(sigmas))).astype(np.float64)
    with jax.enable_x64(True):
        frag = render_pipeline(
            jnp.asarray(verts, jnp.float64), jnp.asarray(sig33, jnp.float64),
            jnp.asarray(np.asarray(R), jnp.float64),
            jnp.asarray(np.asarray(T), jnp.float64),
            jnp.asarray(focal, jnp.float64),
            jnp.asarray(principal, jnp.float64),
            image_size=(H, W), max_assign=K, max_point_per_bin=mppb,
        )
        img = to_white_background(frag, jnp.asarray(colors, jnp.float64))
        sil = get_silhouette(frag)
        img, sil = np.asarray(img), np.asarray(sil)
        idx = np.asarray(frag.vert_index)
    fd = reference_render(
        ref, t(verts), t(sig33), t(np.asarray(R)), t(np.asarray(T)),
        t(focal), t(principal), (H, W), max_assign=K, max_point_per_bin=mppb,
    )
    img_o = reference_white_background(ref, fd, t(colors)).numpy()
    sil_o = reference_silhouette(fd).numpy()
    return (img, sil, idx), (img_o, sil_o, fd)


def test_full_chain_exact_f64_binned(ref):
    """EXACTNESS: our chain in float64 equals the float64 oracle to 1e-9 —
    same mathematical function, no convention error hidden by tolerance."""
    H = W = 64
    verts, sigmas, colors = _cuboid_scene(300)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    focal = np.array([[300.0, 300.0]])
    pp = np.array([[W / 2, H / 2]])
    (img, sil, idx), (img_o, sil_o, fd) = _run_pair_f64(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=10,
        mppb=verts.shape[0],
    )
    assert (idx == fd["vert_index"].numpy()).all()
    assert np.abs(img - img_o).max() < EXACT_TOL
    assert np.abs(sil - sil_o).max() < EXACT_TOL


def test_full_chain_exact_f64_no_coarse_non_square(ref):
    """EXACTNESS on the no-coarse path with a non-square frame."""
    H, W = 48, 112
    verts, sigmas, colors = _cuboid_scene(250)
    R, T = look_at_view_transform(dist=6, elev=-15, azim=120)
    focal = np.array([[150.0, 150.0]])
    pp = np.array([[W / 2, H / 2]])
    (img, sil, idx), (img_o, sil_o, fd) = _run_pair_f64(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=8, mppb=-1,
    )
    assert (idx == fd["vert_index"].numpy()).all()
    assert np.abs(img - img_o).max() < EXACT_TOL
    assert np.abs(sil - sil_o).max() < EXACT_TOL


def test_full_chain_pixels_small_binned(ref):
    """64x64 cuboid through the binned (coarse-culled) path."""
    H = W = 64
    verts, sigmas, colors = _cuboid_scene(300)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    focal = np.array([[300.0, 300.0]], np.float32)
    pp = np.array([[W / 2, H / 2]], np.float32)
    (img, sil, frag), (img_o, sil_o, fd) = _run_pair(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=10,
        mppb=verts.shape[0],
    )
    _gate_images(frag, fd, [(img, img_o), (sil, sil_o)], tol=1e-4)


def test_full_chain_pixels_no_coarse(ref):
    """48x48 no-coarse path (max_point_per_bin=-1, the ShapeFitting mode)."""
    H = W = 48
    verts, sigmas, colors = _cuboid_scene(200)
    R, T = look_at_view_transform(dist=5, elev=25, azim=-30)
    focal = np.array([[60.0, 60.0]], np.float32)
    pp = np.array([[W / 2, H / 2]], np.float32)
    (img, sil, frag), (img_o, sil_o, fd) = _run_pair(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=8, mppb=-1,
    )
    _gate_images(frag, fd, [(img, img_o), (sil, sil_o)])


def test_full_chain_pixels_non_square(ref):
    """48x112 non-square frame (non-square NDC ranges on both axes)."""
    H, W = 48, 112
    verts, sigmas, colors = _cuboid_scene(250)
    R, T = look_at_view_transform(dist=6, elev=-15, azim=120)
    focal = np.array([[150.0, 150.0]], np.float32)
    pp = np.array([[W / 2, H / 2]], np.float32)
    (img, sil, frag), (img_o, sil_o, fd) = _run_pair(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=8,
        mppb=verts.shape[0],
    )
    _gate_images(frag, fd, [(img, img_o), (sil, sil_o)])


def test_full_chain_gradients(ref):
    """Gradient parity of the full chain (verts + expanded sigmas)."""
    torch = _torch()
    H = W = 64
    verts, sigmas, colors = _cuboid_scene(300)
    sig33 = np.asarray(expend_sigma(jnp.asarray(sigmas))).astype(np.float32)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    focal = np.array([[300.0, 300.0]], np.float32)
    pp = np.array([[W / 2, H / 2]], np.float32)
    rng = np.random.RandomState(0)
    Wp = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    Ws = rng.uniform(size=(1, H, W)).astype(np.float32)
    mppb = verts.shape[0]

    def loss_j(v, s33):
        frag = render_pipeline(
            v, s33, R, T, jnp.asarray(focal), jnp.asarray(pp),
            image_size=(H, W), max_assign=10, max_point_per_bin=mppb,
        )
        img = to_white_background(frag, jnp.asarray(colors))
        sil = get_silhouette(frag)
        return jnp.mean(img * jnp.asarray(Wp)) + jnp.mean(sil * jnp.asarray(Ws))

    gv, gs = jax.grad(loss_j, argnums=(0, 1))(
        jnp.asarray(verts), jnp.asarray(sig33)
    )

    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float64)
    vt = t(verts).requires_grad_(True)
    st = t(sig33).requires_grad_(True)
    fd = reference_render(
        ref, vt, st, t(np.asarray(R)), t(np.asarray(T)), t(focal), t(pp),
        (H, W), max_assign=10, max_point_per_bin=mppb,
    )
    img_o = reference_white_background(ref, fd, t(colors))
    sil_o = reference_silhouette(fd)
    L = (img_o * t(Wp)).mean() + (sil_o * t(Ws)).mean()
    L.backward()

    # exclude Gaussians selected by knife-edge pixels (their gradient paths
    # legitimately differ when the selection flips)
    frag = render_pipeline(
        jnp.asarray(verts), jnp.asarray(sig33), R, T, jnp.asarray(focal),
        jnp.asarray(pp), image_size=(H, W), max_assign=10,
        max_point_per_bin=mppb,
    )
    flips = _flip_mask(frag, fd)
    assert flips.mean() < FLIP_FRAC_TOL
    touched = set()
    i1 = np.asarray(frag.vert_index)
    i2 = fd["vert_index"].numpy()
    for b, yy, xx in np.argwhere(flips):
        for v in list(i1[b, yy, xx]) + list(i2[b, yy, xx]):
            if v >= 0:
                touched.add(int(v) % verts.shape[0])
    keep = np.array([i not in touched for i in range(verts.shape[0])])

    for a, b in [(gv, vt.grad), (gs, st.grad)]:
        a = np.asarray(a)[keep]
        b = b.numpy()[keep]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert rel < GRAD_TOL, rel


def test_sample_features_full_chain(ref):
    """sample_features (inverse rendering) against the oracle's documented
    scatter equivalence, through a full render."""
    from voge_tpu.sampler import sample_features

    torch = _torch()
    H, W = 48, 64
    verts, sigmas, colors = _cuboid_scene(200)
    R, T = look_at_view_transform(dist=5, elev=10, azim=40)
    focal = np.array([[100.0, 100.0]], np.float32)
    pp = np.array([[W / 2, H / 2]], np.float32)
    rng = np.random.RandomState(1)
    image = rng.uniform(size=(1, H, W, 3)).astype(np.float32)

    (img, sil, frag), (img_o, sil_o, fd) = _run_pair(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=8,
        mppb=verts.shape[0],
    )
    flips = _gate_images(frag, fd, [(img, img_o)])
    feat, wsum = sample_features(frag, jnp.asarray(image))
    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float64)
    feat_o, wsum_o = reference_sample_features(fd, t(image), verts.shape[0])
    # gate the NORMALIZED texture (the quantity demos consume,
    # ExtractTexture.py:48): raw sums accumulate ~H*W f32 terms whose
    # rounding scales with the sum, not with the texture value
    tex = np.asarray(feat) / (1e-8 + np.asarray(wsum)[:, None])
    tex_o = (feat_o / (1e-8 + wsum_o[:, None])).numpy()
    # exclude kernels touched by knife-edge pixels
    touched = set()
    i1 = np.asarray(frag.vert_index)
    i2 = fd["vert_index"].numpy()
    for b, yy, xx in np.argwhere(flips):
        for v in list(i1[b, yy, xx]) + list(i2[b, yy, xx]):
            if v >= 0:
                touched.add(int(v) % verts.shape[0])
    keep = np.array([i not in touched for i in range(verts.shape[0])])
    # kernels with near-zero weight sums have meaningless textures
    keep &= np.asarray(wsum_o) > 1e-3
    assert np.abs(tex - tex_o)[keep].max() < 1e-3


@pytest.mark.slow
def test_full_chain_quickstart_256(ref):
    """BASELINE.md config 1: the README quickstart cuboid, 1000 Gaussians,
    256x256, K=20 (Readme.md:70-101)."""
    H = W = 256
    verts, sigmas, colors = _cuboid_scene(1000)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    focal = np.array([[300.0, 300.0]], np.float32)
    pp = np.array([[128.0, 128.0]], np.float32)
    (img, sil, frag), (img_o, sil_o, fd) = _run_pair(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=20,
        mppb=verts.shape[0],
    )
    _gate_images(frag, fd, [(img, img_o), (sil, sil_o)])


@pytest.mark.slow
def test_full_chain_shapefitting_128(ref):
    """BASELINE.md config 4: ico_sphere(4) Gaussians, 128x128, K=25,
    no-coarse (demo/ShapeFitting.py:219-296)."""
    from voge_tpu.converter.converters import naive_vertices_converter
    from voge_tpu.converter.shapes import ico_sphere

    H = W = 128
    v, f = ico_sphere(4)
    verts, isig, _ = naive_vertices_converter(v, f, percentage=0.5)
    verts = np.asarray(verts).astype(np.float32)
    sigmas = np.asarray(isig).astype(np.float32)
    colors = np.ones((verts.shape[0], 3), np.float32) * 0.5
    R, T = look_at_view_transform(dist=2.7, elev=10, azim=60)
    focal = np.array([[126.0, 126.0]], np.float32)
    pp = np.array([[64.0, 64.0]], np.float32)
    (img, sil, frag), (img_o, sil_o, fd) = _run_pair(
        ref, verts, sigmas, colors, R, T, focal, pp, H, W, K=25, mppb=-1,
    )
    _gate_images(frag, fd, [(img, img_o), (sil, sil_o)])
