"""Honest device timing.

On some JAX backends (notably tunneled/relayed TPU plugins),
``jax.block_until_ready`` returns before device execution completes and
host readbacks carry polling-backoff latency.  The only reliable protocol:

  1. dispatch N jitted executions (in-order stream),
  2. force ONE host readback of the last output (in-order execution means
     everything before it has finished),
  3. measure two different N and difference away the constant readback/poll
     tail:  exec_time = (t(N2) - t(N1)) / (N2 - N1).

Two further hazards this module absorbs:

  - REPEATED inputs can be served from a relay result cache, deflating
    later runs.  Every execution therefore needs a DISTINCT argument set:
    pass ``args_fn`` (``i -> args tuple``) and the module materializes as
    many as the protocol needs; a fixed ``args_list`` is still accepted
    but must be long enough (``1 + attempts * (n1 + n2)``) or a warning
    estimate bias is possible.
  - occasional stalls (relay program reloads) inflate or deflate a single
    two-point estimate by milliseconds.  ``measure`` therefore repeats the
    (t1, t2) pair ``attempts`` times and returns the MEDIAN estimate;
    ``measure_stats`` additionally reports the spread so benchmark
    artifacts can carry variance.
"""
from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import numpy as np
import jax


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def measure_stats(
    fn: Callable,
    args_list: Optional[Sequence] = None,
    n1: int = 5,
    n2: int = 25,
    attempts: int = 3,
    max_retries: int = 4,
    args_fn: Optional[Callable[[int], tuple]] = None,
) -> dict:
    """Per-execution seconds of ``fn`` (jitted), robust to async dispatch,
    fake block_until_ready, readback polling, result caches, and stalls.

    :param args_list: sequence of argument tuples, cycled through.  Prefer
        ``args_fn`` so every execution can get a distinct set.
    :param args_fn: ``i -> args tuple`` called with increasing i; overrides
        ``args_list``.
    :param attempts: number of independent (t1, t2) two-point estimates;
        the median is returned (stalls corrupt single estimates both ways).
    :return: dict with ``median`` (seconds/exec), ``estimates`` (all
        positive attempt estimates, seconds), ``spread`` (max/min - 1 over
        the positive estimates; 0.0 when fewer than 2).
    """
    if args_fn is None:
        assert args_list is not None and len(args_list) > 0
        k = len(args_list)
        args_fn = lambda i: args_list[i % k]

    cursor = [0]

    def next_args():
        a = args_fn(cursor[0])
        cursor[0] += 1
        return a

    out = fn(*next_args())
    _force(out)  # warmup (compile + one real exec)

    def run(n):
        argsets = [next_args() for _ in range(n)]  # build outside the clock
        out = None
        t0 = time.perf_counter()
        for a in argsets:
            out = fn(*a)
        _force(out)
        return time.perf_counter() - t0

    ests = []
    tries = 0
    while len(ests) < attempts and tries < attempts + max_retries:
        tries += 1
        t1 = run(n1)
        t2 = run(n2)
        est = (t2 - t1) / (n2 - n1)
        if est > 0:
            ests.append(est)
    if not ests:
        # A nonpositive estimate after all retries means the attachment is
        # misbehaving (program reloads mid-measurement); a silent tiny floor
        # would surface as an absurd inflated fps — fail loudly instead.
        raise RuntimeError(
            f"timing.measure: no positive per-exec estimate after "
            f"{tries} attempts; the device attachment is unstable"
        )
    med = float(np.median(ests))
    spread = float(max(ests) / min(ests) - 1.0) if len(ests) > 1 else 0.0
    # IQR spread: the relay's occasional multi-ms stalls land in single
    # attempts, so max/min-1 overstates steady-state variance; the
    # interquartile spread is the robust companion (VERDICT round-4 #7/#9)
    if len(ests) > 2:
        q25, q75 = np.percentile(ests, [25, 75])
        iqr_spread = float((q75 - q25) / med)
    else:
        iqr_spread = spread
    return {"median": med, "estimates": ests, "spread": spread,
            "iqr_spread": iqr_spread}


def measure(
    fn: Callable,
    args_list: Optional[Sequence] = None,
    n1: int = 5,
    n2: int = 25,
    max_retries: int = 4,
    attempts: int = 3,
    args_fn: Optional[Callable[[int], tuple]] = None,
) -> float:
    """Median per-execution seconds of ``fn`` — see :func:`measure_stats`."""
    return measure_stats(
        fn, args_list, n1=n1, n2=n2, attempts=attempts,
        max_retries=max_retries, args_fn=args_fn,
    )["median"]
