"""Honest device timing.

On some JAX backends (notably tunneled/relayed TPU plugins),
``jax.block_until_ready`` returns before device execution completes and
host readbacks carry polling-backoff latency.  The only reliable protocol:

  1. dispatch N jitted executions (in-order stream),
  2. force ONE host readback of the last output (in-order execution means
     everything before it has finished),
  3. measure two different N and difference away the constant readback/poll
     tail:  exec_time = (t(N2) - t(N1)) / (N2 - N1).
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np
import jax


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def measure(fn: Callable, args_list: Sequence, n1: int = 5, n2: int = 25,
            max_retries: int = 4) -> float:
    """Per-execution seconds of ``fn`` (jitted), robust to async dispatch,
    fake block_until_ready, and readback polling.

    ``args_list``: sequence of argument tuples, cycled through (pass several
    distinct sets to defeat any caching).

    Reliability notes for the relay attachment:
      - a stall (program reload) can make ``t(n2) - t(n1)`` nonpositive ->
        such attempts are retried;
      - REPEATED inputs can be served from a result cache, deflating later
        runs -> when ``args_list`` is long enough, every execution gets a
        distinct argument set and no estimate-minimum is taken.
    """
    k = len(args_list)
    out = fn(*args_list[0])
    _force(out)  # warmup (compile + one real exec)

    cursor = [1 if k > n1 + n2 else 0]

    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(*args_list[(cursor[0] + i) % k])
        cursor[0] += n
        _force(out)
        return time.perf_counter() - t0

    est = None
    for _ in range(max_retries):
        t1 = run(n1)
        t2 = run(n2)
        est = (t2 - t1) / (n2 - n1)
        if est > 0:
            break
    if est is None or est <= 0:
        # A nonpositive estimate after all retries means the attachment is
        # misbehaving (program reloads mid-measurement); a silent tiny floor
        # would surface as an absurd inflated fps — fail loudly instead.
        raise RuntimeError(
            f"timing.measure: nonpositive per-exec estimate ({est!r}) after "
            f"{max_retries} attempts; the device attachment is unstable"
        )
    return est
