"""ind_sel / ind_fill / rotation_theta parity vs the reference torch Utils."""
import numpy as np

import jax.numpy as jnp

from voge_tpu import utils


def test_ind_sel_matches_reference(ref, rng):
    import torch

    target = rng.uniform(size=(1, 9, 4)).astype(np.float32)
    ind = rng.randint(0, 9, size=(5, 3)).astype(np.int64)
    out_ref = ref.Utils.ind_sel(torch.from_numpy(target), torch.from_numpy(ind), dim=1)
    out_jax = utils.ind_sel(jnp.asarray(target), jnp.asarray(ind), dim=1)
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy())


def test_ind_sel_batched(ref, rng):
    import torch

    target = rng.uniform(size=(5, 9, 4, 2)).astype(np.float32)
    ind = rng.randint(0, 9, size=(5, 3)).astype(np.int64)
    out_ref = ref.Utils.ind_sel(torch.from_numpy(target), torch.from_numpy(ind), dim=1)
    out_jax = utils.ind_sel(jnp.asarray(target), jnp.asarray(ind), dim=1)
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy())


def test_ind_fill_matches_reference(ref, rng):
    import torch

    target = np.zeros((4, 9, 3), dtype=np.float32)
    ind = rng.randint(0, 9, size=(4, 5)).astype(np.int64)
    src = rng.uniform(size=(4, 5, 3)).astype(np.float32)
    out_ref = ref.Utils.ind_fill(
        torch.from_numpy(target.copy()), torch.from_numpy(ind),
        src=torch.from_numpy(src), dim=1,
    )
    out_jax = utils.ind_fill(jnp.asarray(target), jnp.asarray(ind), src=jnp.asarray(src), dim=1)
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy())


def test_ind_fill_scalar_src(ref, rng):
    import torch

    target = np.zeros((2, 7), dtype=np.float32)
    ind = rng.randint(0, 7, size=(2, 3)).astype(np.int64)
    out_ref = ref.Utils.ind_fill(
        torch.from_numpy(target.copy()), torch.from_numpy(ind), src=1, dim=1
    )
    out_jax = utils.ind_fill(jnp.asarray(target), jnp.asarray(ind), src=1, dim=1)
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy())


def test_rotation_theta_matches_reference(ref, rng):
    import torch

    theta = rng.uniform(-np.pi, np.pi, size=(6,)).astype(np.float32)
    out_ref = ref.Utils.rotation_theta(torch.from_numpy(theta))
    out_jax = utils.rotation_theta(jnp.asarray(theta))
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_eye_like(ref, rng):
    import torch

    x = rng.uniform(size=(5, 3, 3)).astype(np.float32)
    out_ref = ref.Utils.eye_like(torch.from_numpy(x))
    out_jax = utils.eye_like(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy())
