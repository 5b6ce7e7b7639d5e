"""bf16 input story: every public entry point accepts bfloat16 inputs,
computes f32 internally, and returns dtypes following JAX promotion rules
(the reference runs its renderer under torch.cuda.amp.autocast,
``VoGE/Utils.py:218-228``; the TPU-native contract is promote-at-the-
boundary instead of per-op autocast)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import (
    get_silhouette,
    interpolate_attr,
    render_pipeline,
    to_white_background,
)
from voge_tpu.sampler import sample_features


@pytest.fixture(scope="module")
def scene():
    g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 200,
                            percentage=0.6, as_obj=True)
    verts = jnp.asarray(g.verts, jnp.float32)
    sigmas = jnp.asarray(g.sigmas, jnp.float32)
    colors = jnp.asarray((np.asarray(g.verts) + 1) / 3, jnp.float32)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    kw = dict(image_size=(32, 32), max_assign=6)
    focal = jnp.asarray([[40.0, 40.0]])
    principal = jnp.asarray([[16.0, 16.0]])
    frag32 = render_pipeline(verts, sigmas, R, T, focal, principal, **kw)
    return verts, sigmas, colors, (R, T, focal, principal), kw, frag32


def test_render_pipeline_accepts_bf16_geometry(scene):
    verts, sigmas, colors, cam, kw, frag32 = scene
    frag = render_pipeline(
        verts.astype(jnp.bfloat16), sigmas.astype(jnp.bfloat16), *cam, **kw
    )
    assert frag.vert_weight.dtype == jnp.float32
    # bf16 geometry quantization moves the weights, but the render stands
    assert np.allclose(
        np.asarray(frag.vert_weight.sum()),
        np.asarray(frag32.vert_weight.sum()),
        rtol=0.05,
    )


@pytest.mark.parametrize("dt", [jnp.bfloat16, jnp.float32])
def test_interpolate_attr_promotion(scene, dt):
    _, _, colors, _, _, frag32 = scene
    img = interpolate_attr(frag32, colors.astype(dt))
    # bf16 attrs x f32 weights promote to f32; values match the f32 run to
    # bf16 resolution
    assert img.dtype == jnp.result_type(dt, jnp.float32)
    ref = interpolate_attr(frag32, colors)
    assert np.max(np.abs(np.asarray(img, np.float32) - np.asarray(ref))) < 2e-2


def test_get_silhouette_bf16_frag_weights(scene):
    # silhouette is a weight-only reduction; frags are f32 by contract,
    # output is f32
    *_, frag32 = scene
    sil = get_silhouette(frag32)
    assert sil.dtype == jnp.float32


@pytest.mark.parametrize("dt", [jnp.bfloat16, jnp.float32])
def test_sample_features_promotion(scene, dt):
    *_, frag32 = scene
    image = jnp.ones((1, 32, 32, 3), dt) * 0.5
    feat, wsum = sample_features(frag32, image, n_vert=200)
    want = jnp.result_type(dt, jnp.float32)
    assert feat.dtype == want and wsum.dtype == want
    f32, _ = sample_features(frag32, image.astype(jnp.float32), n_vert=200)
    assert np.max(np.abs(np.asarray(feat, np.float32) - np.asarray(f32))) < 2e-2


@pytest.mark.parametrize("dt", [jnp.bfloat16, jnp.float32])
def test_to_white_background_promotion(scene, dt):
    _, _, colors, _, _, frag32 = scene
    img = to_white_background(frag32, colors.astype(dt))
    assert img.dtype == jnp.result_type(dt, jnp.float32)
