"""Memory-bounded chunked execution.

Functional equivalent of the reference ``Batchifier`` decorator
(``Utils.py:59-176``): designated keyword arguments are reshaped so that a
set of target dims ravel into one axis, that axis is sliced into chunks of
``batch_size``, the wrapped function runs per chunk, and outputs are
re-concatenated and reshaped.  Used to bound the memory of dense
(rays x Gaussians) products (e.g. the brute-force NeMo path and the
pointcloud converter).

On TPU, prefer equal-size chunks (every chunk compiles to the same
executable); ``pad_to_full_chunks=True`` pads the last chunk and crops the
output, so a jitted ``fn`` compiles exactly once.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _normalize_dims(shape, target_dims, remain_dims):
    nd = len(shape)
    if target_dims is not None:
        if isinstance(target_dims, int):
            target_dims = (target_dims,)
        this_dims = tuple(d if d >= 0 else nd + d for d in target_dims)
    else:
        if isinstance(remain_dims, int):
            remain_dims = (remain_dims,)
        other = tuple(d if d >= 0 else nd + d for d in remain_dims)
        this_dims = tuple(i for i in range(nd) if i not in other)
    return this_dims


def _ravel_spec(shape, this_dims):
    """Collapse contiguous target dims into a single -1 axis (reference
    ``Utils.py:129-136`` semantics: target dims must be contiguous)."""
    to_shape = [shape[i] if i not in this_dims else -1 for i in range(len(shape))]
    t_l = len(to_shape)
    for i in range(t_l - 1):
        j = t_l - 1 - i
        if j < len(to_shape) and to_shape[j] == -1 and to_shape[j - 1] == -1:
            del to_shape[j]
    assert to_shape.count(-1) == 1, "target dims must be contiguous"
    save_idx = to_shape.index(-1)
    return to_shape, save_idx


def batchify(
    fn: Callable,
    batch_size: int,
    batch_args: Union[str, Sequence[str]],
    target_dims: Union[int, Sequence[int], None] = None,
    remain_dims: Union[int, Sequence[int], None] = None,
    pad_to_full_chunks: bool = True,
) -> Callable:
    """Chunk designated kwargs of ``fn`` along their raveled target dims."""
    if isinstance(batch_args, str):
        batch_args = (batch_args,)
    batch_args = tuple(batch_args)
    assert len(batch_args) > 0

    def wrapper(*args, **kwargs):
        kwargs = dict(kwargs)
        total_len = -1
        recorded_shape = None
        save_idx = None
        for k in batch_args:
            get = kwargs[k]
            this_dims = _normalize_dims(get.shape, target_dims, remain_dims)
            to_shape, s_idx = _ravel_spec(get.shape, this_dims)
            to_record = tuple(get.shape[0 : to_shape.index(-1) + len(this_dims)])
            if recorded_shape is None:
                recorded_shape, save_idx = to_record, s_idx
            else:
                assert recorded_shape == to_record
            kwargs[k] = get.reshape(to_shape)
            total_len = kwargs[k].shape[s_idx]
        assert total_len >= 0, "No batchify parameters found!"

        n_chunks = (total_len - 1) // batch_size + 1
        out = []
        for i in range(n_chunks):
            start, stop = i * batch_size, min((i + 1) * batch_size, total_len)
            this_kwargs = dict(kwargs)
            for k in batch_args:
                sl = (slice(None),) * save_idx + (slice(start, stop),)
                chunk = kwargs[k][sl]
                if pad_to_full_chunks and stop - start < batch_size:
                    pad = [(0, 0)] * chunk.ndim
                    pad[save_idx] = (0, batch_size - (stop - start))
                    chunk = jnp.pad(chunk, pad, mode="edge")
                this_kwargs[k] = chunk
            res = fn(*args, **this_kwargs)
            if pad_to_full_chunks and stop - start < batch_size:
                crop = lambda x: x[
                    (slice(None),) * save_idx + (slice(0, stop - start),)
                ] if hasattr(x, "ndim") and x.ndim > save_idx else x
                res = jax.tree_util.tree_map(crop, res)
            out.append(res)

        def reshape_out(parts):
            if isinstance(parts[0], (float, int)):
                return sum(parts)
            if hasattr(parts[0], "ndim") and parts[0].ndim == 0:
                return jnp.sum(jnp.stack(parts))
            x = jnp.concatenate(parts, axis=save_idx) if len(parts) > 1 else parts[0]
            return x.reshape(*recorded_shape, *x.shape[save_idx + 1 :])

        if isinstance(out[0], tuple):
            return tuple(
                reshape_out([o[i] for o in out]) for i in range(len(out[0]))
            )
        return reshape_out(out)

    return wrapper


class Batchifier:
    """Decorator-style API parity with reference ``Utils.py:80``."""

    def __init__(
        self,
        batch_size: int,
        batch_args: Union[str, Sequence[str]],
        target_dims=None,
        remain_dims=None,
        **kwargs,
    ):
        self.batch_size = batch_size
        self.batch_args = batch_args
        self.target_dims = target_dims
        self.remain_dims = remain_dims

    def __call__(self, func):
        return batchify(
            func, self.batch_size, self.batch_args,
            self.target_dims, self.remain_dims,
        )
