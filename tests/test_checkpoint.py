"""Scene / train-state persistence tests."""
import numpy as np
import pytest

import jax.numpy as jnp
import optax

from voge_tpu.checkpoint import (
    load_scene,
    load_train_state,
    save_scene,
    save_train_state,
)
from voge_tpu.meshes import GaussianMeshes


def test_scene_roundtrip(rng, tmp_path):
    verts = rng.rand(20, 3).astype(np.float32)
    sigmas = rng.rand(20, 3, 3).astype(np.float32)
    colors = rng.rand(20, 3).astype(np.float32)
    g = GaussianMeshes(verts, sigmas, gradianted_args=[True, False, False])
    p = str(tmp_path / "scene.npz")
    save_scene(p, g, colors=colors)
    g2, extras = load_scene(p)
    np.testing.assert_array_equal(np.asarray(g2.verts), verts)
    np.testing.assert_array_equal(np.asarray(g2.sigmas), sigmas)
    assert g2.gradianted_args == [True, False, False]
    np.testing.assert_array_equal(extras["colors"], colors)


def test_train_state_roundtrip(rng, tmp_path):
    params = {"verts": jnp.asarray(rng.rand(5, 3).astype(np.float32))}
    opt = optax.adam(1e-2)
    state = (params, opt.init(params), 7)
    p = str(tmp_path / "state.npz")
    save_train_state(p, state)
    restored = load_train_state(p, state)
    np.testing.assert_array_equal(
        np.asarray(restored[0]["verts"]), np.asarray(params["verts"])
    )
    assert int(restored[2]) == 7


def test_train_state_structure_mismatch(rng, tmp_path):
    p = str(tmp_path / "s.npz")
    save_train_state(p, {"a": jnp.ones(3)})
    with pytest.raises(ValueError):
        load_train_state(p, {"b": jnp.ones(3)})
