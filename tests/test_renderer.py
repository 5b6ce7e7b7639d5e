"""End-to-end renderer tests: quickstart scene, compositing vs the torch
reference, batching, and gradient flow."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voge_tpu.cameras import PerspectiveCameras, look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import (
    Fragments,
    GaussianRenderer,
    GaussianRenderSettings,
    get_silhouette,
    interpolate_attr,
    render_pipeline,
    to_white_background,
)


@pytest.fixture(scope="module")
def quickstart():
    """The README quickstart cuboid scene (Readme.md:70-101)."""
    gaussians = Cuboid.cuboid_gauss(
        (-1, 1), (-1, 1), (-1, 1), 1000, percentage=0.6, as_obj=True
    )
    camera = PerspectiveCameras(
        focal_length=300, image_size=((256, 256),), principal_point=((128, 128),)
    )
    rs = GaussianRenderSettings(image_size=(256, 256), principal=(128, 128))
    renderer = GaussianRenderer(cameras=camera, render_settings=rs)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    frag = renderer(gaussians, R=R, T=T)
    return gaussians, renderer, frag, (R, T)


def test_quickstart_stats(quickstart):
    gaussians, renderer, frag, _ = quickstart
    assert frag.vert_weight.shape == (1, 256, 256, 20)
    assert frag.vert_index.shape == (1, 256, 256, 20)
    assert frag.valid_num.shape == (1, 256, 256)
    w = np.asarray(frag.vert_weight)
    assert 0.85 < w.max() <= 1.2          # near-opaque front kernels
    assert (np.asarray(frag.valid_num) > 0).mean() > 0.2  # object coverage
    idx = np.asarray(frag.vert_index)
    assert idx.max() < gaussians.verts.shape[0]
    img = np.asarray(to_white_background(frag, (gaussians.verts + 1) / 3))
    assert img.shape == (1, 256, 256, 3)
    # corners are background (white)
    assert img[0, 0, 0].min() > 0.999 and img[0, -1, -1].min() > 0.999
    # object interior is not white
    assert img[0, 128, 128].mean() < 0.99


def test_quickstart_golden_snapshot(quickstart):
    """Pin scene statistics within tight bounds as a regression tripwire
    (values produced by this implementation, verified visually against the
    reference's published renders; update deliberately if the math changes)."""
    _, _, frag, _ = quickstart
    sil = np.asarray(get_silhouette(frag))
    assert 0.25 < sil.mean() < 0.45
    w = np.asarray(frag.vert_weight)
    assert 25000 < w.sum() < 31000


def test_silhouette_ctx_path_matches_fallback(quickstart):
    """get_silhouette's kernel-layout path (ctx-carrying Fragments) is a
    permutation of the same K-sum — exact match with the unbinned
    vert_weight fallback.  On CPU only the no-coarse path produces a ctx
    (culled configs reserve it for the TPU kernels), so render one."""
    gaussians, _, _, (R, T) = quickstart
    focal = jnp.asarray([[300.0, 300.0]])
    principal = jnp.asarray([[32.0, 32.0]])
    frag = render_pipeline(
        gaussians.verts, gaussians.sigmas, R, T, focal, principal,
        image_size=(64, 64), max_assign=10, max_point_per_bin=-1,
    )
    assert frag.attr_ctx is not None
    sil_ctx = np.asarray(get_silhouette(frag))
    bare = Fragments(frag.vert_weight, frag.vert_index, frag.valid_num,
                     frag.vert_hit_length)
    sil_fb = np.asarray(get_silhouette(bare))
    assert sil_fb.max() > 0.1  # scene actually renders
    np.testing.assert_array_equal(sil_ctx, sil_fb)


def test_interpolate_attr_matches_reference_merge(ref, quickstart):
    """Compositing through our merge_final must equal the reference torch
    merge_final on identical fragments."""
    import torch

    gaussians, _, frag, _ = quickstart
    colors = (np.asarray(gaussians.verts) + 1) / 3
    out_jax = np.asarray(interpolate_attr(frag, jnp.asarray(colors)))
    out_ref = ref.Aggregation.merge_final(
        torch.from_numpy(colors.astype(np.float32)),
        torch.from_numpy(np.asarray(frag.vert_weight)),
        torch.from_numpy(np.asarray(frag.vert_index).astype(np.int64)),
        torch.from_numpy(np.asarray(frag.valid_num).astype(np.int64)),
    ).numpy()
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-5, atol=1e-6)


def test_batched_render_matches_single(quickstart):
    """Rendering B views at once must equal rendering them one by one,
    with fragment indices offset by b * N."""
    gaussians, renderer, _, _ = quickstart
    R1, T1 = look_at_view_transform(dist=6, elev=10, azim=70)
    R2, T2 = look_at_view_transform(dist=6, elev=25, azim=-30)
    Rb = jnp.concatenate([R1, R2]); Tb = jnp.concatenate([T1, T2])

    frag_b = renderer(gaussians, R=Rb, T=Tb)
    frag_1 = renderer(gaussians, R=R1, T=T1)
    frag_2 = renderer(gaussians, R=R2, T=T2)

    N = gaussians.verts.shape[0]
    np.testing.assert_allclose(
        np.asarray(frag_b.vert_weight[0]), np.asarray(frag_1.vert_weight[0]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(frag_b.vert_weight[1]), np.asarray(frag_2.vert_weight[0]),
        rtol=1e-5, atol=1e-6,
    )
    i2 = np.asarray(frag_b.vert_index[1])
    i2_single = np.asarray(frag_2.vert_index[0])
    np.testing.assert_array_equal(
        np.where(i2 >= 0, i2 - N, -1), i2_single
    )
    # batched interpolate with (N, 3) colors tiles them over views
    colors = jnp.asarray((np.asarray(gaussians.verts) + 1) / 3)
    img_b = np.asarray(to_white_background(frag_b, colors))
    img_2 = np.asarray(to_white_background(frag_2, colors))
    np.testing.assert_allclose(img_b[1], img_2[0], rtol=1e-5, atol=1e-6)


def test_gradients_flow_and_are_finite(quickstart):
    gaussians, _, _, (R, T) = quickstart
    colors = jnp.asarray((np.asarray(gaussians.verts) + 1) / 3)
    focal = jnp.asarray([[75.0, 75.0]])
    principal = jnp.asarray([[32.0, 32.0]])

    def loss_fn(verts, sigmas):
        frag = render_pipeline(
            verts, sigmas, R, T, focal, principal,
            image_size=(64, 64), max_assign=10,
        )
        img = to_white_background(frag, colors)
        sil = get_silhouette(frag)
        return jnp.mean(img ** 2) + jnp.mean(sil)

    g_v, g_s = jax.grad(loss_fn, argnums=(0, 1))(
        gaussians.verts, gaussians.sigmas
    )
    assert np.isfinite(np.asarray(g_v)).all()
    assert np.isfinite(np.asarray(g_s)).all()
    assert float(jnp.abs(g_v).max()) > 0
    assert float(jnp.abs(g_s).max()) > 0
    assert g_v.shape == gaussians.verts.shape
    assert g_s.shape == gaussians.sigmas.shape


def test_fragments_pytree_and_api():
    w = jnp.ones((2, 4, 4, 3))
    i = jnp.zeros((2, 4, 4, 3), dtype=jnp.int32)
    v = jnp.ones((2, 4, 4), dtype=jnp.int32)
    f = Fragments(w, i, v, w)
    assert len(f) == 2
    f0 = f[0]
    assert f0.vert_weight.shape == (4, 4, 3)
    f0u = f0.unsqueeze()
    assert f0u.vert_weight.shape == (1, 4, 4, 3)
    leaves = jax.tree_util.tree_leaves(f)
    assert len(leaves) == 4
    d = f.to_dict()
    assert set(d) == {"vert_weight", "vert_index", "valid_num", "vert_hit_length"}


def test_render_settings_kwargs_swallowing():
    rs = GaussianRenderSettings(batch_size=-1, image_size=128, principal=(64, 64))
    assert rs.image_size == (128, 128)
    assert rs["max_assign"] == 20


def test_non_square_render():
    """Non-square image (the ExtractTexture 256x672 shape class) with
    asymmetric principal point renders and differentiates."""
    g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 300, percentage=0.6,
                            as_obj=True)
    R, T = look_at_view_transform(dist=5, elev=15, azim=30)
    focal = jnp.asarray([[150.0, 150.0]])
    principal = jnp.asarray([[84.0, 32.0]])  # (px, py) for W=168, H=64
    frag = render_pipeline(
        g.verts, g.sigmas, R, T, focal, principal,
        image_size=(64, 168), max_assign=8,
    )
    assert frag.vert_weight.shape == (1, 64, 168, 8)
    assert int(frag.valid_num.sum()) > 0
    # differentiable
    loss = lambda v: jnp.sum(
        render_pipeline(v, g.sigmas, R, T, focal, principal,
                        image_size=(64, 168), max_assign=8).vert_weight ** 2
    )
    gv = jax.grad(loss)(g.verts)
    assert np.isfinite(np.asarray(gv)).all() and float(jnp.abs(gv).max()) > 0


def test_inverse_sigma_setting():
    """inverse_sigma=True: sigmas are covariances, inverted in-pipeline."""
    g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 200, percentage=0.6,
                            as_obj=True)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    focal = jnp.asarray([[75.0, 75.0]])
    principal = jnp.asarray([[32.0, 32.0]])
    isig = np.asarray(g.sigmas)
    frag_a = render_pipeline(
        g.verts, g.sigmas, R, T, focal, principal,
        image_size=(64, 64), max_assign=8,
    )
    # passing covariances (1/isig) with inverse_sigma=True must agree
    frag_b = render_pipeline(
        g.verts, jnp.asarray(1.0 / isig), R, T, focal, principal,
        image_size=(64, 64), max_assign=8, inverse_sigma=True,
    )
    # 1/(1/x) round-trips only to fp precision: allow rare knife-edge
    # selection flips, compare aggregate weights loosely
    ia, ib = np.asarray(frag_a.vert_index), np.asarray(frag_b.vert_index)
    assert (ia != ib).mean() < 1e-3
    np.testing.assert_allclose(
        np.asarray(frag_a.vert_weight).sum(-1),
        np.asarray(frag_b.vert_weight).sum(-1),
        rtol=1e-3, atol=0.02,
    )


def test_camera_ctx_matches_plain_render(rng):
    """render_pipeline(cam_ctx=...) must reproduce the plain call — same
    math on the same cameras.  Exact bit-identity is NOT promised: the ctx
    builds its rays eagerly while the plain path builds them inside the jit
    program, so ray components can differ by 1 ulp, which the exp(-act)
    chain amplifies (act scales with 1/sigma^2).  Selections must agree on
    all but knife-edge pixels and weights/gradients to fp tolerance."""
    import jax
    from voge_tpu.renderer import precompute_camera_ctx, render_pipeline
    from voge_tpu.cameras import look_at_view_transform

    P, H, W, K = 120, 40, 48, 8
    verts = jnp.asarray(rng.uniform(-1, 1, size=(P, 3)).astype(np.float32))
    sig = jnp.asarray(
        (rng.uniform(0.5, 1.5, size=(P,)) * 4e-3).astype(np.float32)
    )
    R, T = look_at_view_transform(dist=4, elev=15, azim=30)
    focal = jnp.asarray([[60.0, 60.0]])
    principal = jnp.asarray([[W / 2, H / 2]])
    kwargs = dict(image_size=(H, W), max_assign=K)
    ctx = precompute_camera_ctx(R, T, focal, principal, (H, W), P,
                                max_assign=K)

    f0 = render_pipeline(verts, sig, R, T, focal, principal, **kwargs)
    f1 = render_pipeline(verts, sig, R, T, focal, principal,
                         cam_ctx=ctx, **kwargs)
    i0, i1 = np.asarray(f0.vert_index), np.asarray(f1.vert_index)
    agree = (i0 == i1).all(-1)
    assert agree.mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(f1.vert_weight)[agree], np.asarray(f0.vert_weight)[agree],
        rtol=1e-2, atol=1e-4,
    )

    def loss(v, s, ctx_arg):
        frag = render_pipeline(v, s, R, T, focal, principal,
                               cam_ctx=ctx_arg, **kwargs)
        return jnp.sum(frag.vert_weight ** 2)

    g0 = jax.grad(lambda v, s: loss(v, s, None), argnums=(0, 1))(verts, sig)
    g1 = jax.grad(lambda v, s: loss(v, s, ctx), argnums=(0, 1))(verts, sig)
    for a, b in zip(g1, g0):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert rel < 5e-3, rel
