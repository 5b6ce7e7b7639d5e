"""Aggregation parity vs the reference's pure-torch implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

from voge_tpu import aggregation as agg


def _random_fragments(rng, shape=(2, 6, 5, 8), invalid_frac=0.3):
    """Random (idx, act, len, dsd) with reference sentinel conventions."""
    B, H, W, M = shape
    idx = rng.randint(0, 50, size=shape).astype(np.int32)
    act = rng.uniform(0.0, 4.0, size=shape).astype(np.float32)
    length = rng.uniform(1.0, 9.0, size=shape).astype(np.float32)
    dsd = rng.uniform(0.5, 30.0, size=shape).astype(np.float32)
    # invalid tail slots per pixel (reference semantics: valid slots first)
    n_valid = rng.randint(0, M + 1, size=(B, H, W))
    slot = np.arange(M)
    invalid = slot[None, None, None, :] >= n_valid[..., None]
    idx[invalid] = -1
    act[invalid] = 1e10
    length[invalid] = 1e10
    dsd[invalid] = 0.0
    # lengths ascending like the renderer emits
    length = np.sort(length, axis=-1)
    return idx, act, length, dsd


def test_aggregation_matches_reference(ref, rng):
    import torch

    idx, act, length, dsd = _random_fragments(rng)
    w_ref, idx_ref, valid_ref, len_ref = ref.Aggregation.aggregation(
        torch.from_numpy(idx.astype(np.int64)),
        torch.from_numpy(act),
        torch.from_numpy(length),
        torch.from_numpy(dsd),
        occupation_weight=0.7,
    )
    w_jax, idx_jax, valid_jax, len_jax = agg.aggregation(
        jnp.asarray(idx), jnp.asarray(act), jnp.asarray(length),
        jnp.asarray(dsd), occupation_weight=0.7,
    )
    np.testing.assert_allclose(
        np.asarray(w_jax), w_ref.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(valid_jax), valid_ref.numpy())


def test_cross_activation_and_weights_match(ref, rng):
    import torch

    sel_len = rng.uniform(1, 5, size=(40, 7)).astype(np.float32)
    sel_dsd = rng.uniform(0.1, 20, size=(40, 7)).astype(np.float32)
    sel_act = rng.uniform(0, 3, size=(40, 7)).astype(np.float32)

    ca_ref = ref.Aggregation.get_cross_activation(
        torch.from_numpy(sel_len), torch.from_numpy(sel_dsd)
    )
    ca_jax = agg.get_cross_activation(jnp.asarray(sel_len), jnp.asarray(sel_dsd))
    np.testing.assert_allclose(np.asarray(ca_jax), ca_ref.numpy(), rtol=1e-5, atol=1e-6)

    w_ref = ref.Aggregation.assign2weight(
        torch.from_numpy(sel_act), ca_ref, occupation_weight=1.3
    )
    w_jax = agg.assign2weight(jnp.asarray(sel_act), ca_jax, occupation_weight=1.3)
    np.testing.assert_allclose(np.asarray(w_jax), w_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_merge_final_matches_reference(ref, rng):
    import torch

    idx, act, length, dsd = _random_fragments(rng, shape=(1, 5, 4, 6))
    w = rng.uniform(0, 1, size=idx.shape).astype(np.float32)
    attr = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    valid_num = (idx >= 0).sum(-1)

    out_ref = ref.Aggregation.merge_final(
        torch.from_numpy(attr),
        torch.from_numpy(w),
        torch.from_numpy(idx.astype(np.int64)),
        torch.from_numpy(valid_num.astype(np.int64)),
    )
    out_jax = agg.merge_final(
        jnp.asarray(attr), jnp.asarray(w), jnp.asarray(idx),
        jnp.asarray(valid_num),
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(10,), (10, 3), (10, 3, 3)])
def test_expend_sigma_matches_reference(ref, rng, shape):
    import torch

    sigma = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    out_ref = ref.Aggregation.expend_sigma(torch.from_numpy(sigma))
    out_jax = agg.expend_sigma(jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy(), rtol=1e-6)


def test_inverse_cumsum_matches_reference(ref, rng):
    import torch
    from voge_tpu.utils import inverse_cumsum

    x = rng.uniform(size=(4, 7)).astype(np.float32)
    out_ref = ref.Aggregation.inverse_cumsum(torch.from_numpy(x), dim=1)
    out_jax = inverse_cumsum(jnp.asarray(x), dim=1)
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy(), rtol=1e-5, atol=1e-6)
