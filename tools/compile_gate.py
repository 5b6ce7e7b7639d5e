"""Compile-time gate: cold-lower + cold-compile every bench workload and
assert per-config budgets (VERDICT round-4 next #2).

Round 4 shipped a cold-start regression (313 s of lowering on the
pointcloud config — see DESIGN_NOTES round-5 finding 1) that no gate
caught until the driver's bench subprocesses timed out.  This tool is the
gate: it builds each bench workload, lowers and compiles it against a
FRESH compilation cache, and fails loudly if any config exceeds its
budget.  Run on the TPU attachment before every end-of-round snapshot:

    python tools/compile_gate.py            # all configs
    python tools/compile_gate.py 10k b8     # subset

Budgets are generous multiples of the healthy numbers (lower ~1 s,
compile ~20-40 s on the relay): the gate is for catching order-of-
magnitude regressions, not jitter.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# fresh cache: measure true cold compiles
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxgate")

import jax  # noqa: E402

import bench  # noqa: E402

# (name, builder -> (fn, args_fn, ...), build_budget_s, lower_s, compile_s)
# The FIRST config in a cold process absorbs every shared host-side
# compile (look_at chain, converter ops, the fused ctx build) — measured
# ~70 s on the 1-core attachment host — so it gets a wider build budget;
# the regression class this gate exists for (the round-4 313 s lowering
# blowup, 600 s subprocess timeouts) still trips it.
CONFIGS = [
    ("1k", lambda: bench.build_fwdbwd(1000)[:2], 240, 20, 180),
    ("10k", lambda: bench.build_fwdbwd(10000)[:2], 30, 20, 180),
    ("b8", lambda: bench.build_fwdbwd_batched()[:2], 30, 20, 240),
    ("pointcloud", lambda: bench.build_fwd_pointcloud()[:2], 30, 20, 180),
    ("occlusion", lambda: bench.build_occlusion()[:2], 30, 20, 240),
    ("texture", lambda: bench.build_texture()[:2], 30, 20, 240),
    ("shapefit", lambda: bench.build_shapefit_iter()[:2], 30, 20, 240),
]


def main():
    only = set(sys.argv[1:])
    failures = []
    # First TPU contact pays the relay attachment handshake (measured
    # anywhere from 4 to 210 s depending on the relay's state) — do it
    # once here so it doesn't land in the first config's build budget.
    t0 = time.time()
    jax.block_until_ready(jax.device_put(jax.numpy.zeros(8)))
    print(json.dumps({"attach_warmup_s": round(time.time() - t0, 1)}),
          flush=True)
    for name, build, b_budget, l_budget, c_budget in CONFIGS:
        if only and name not in only:
            continue
        t0 = time.time()
        fn, args_fn = build()
        args = args_fn(0)
        t_build = time.time() - t0
        t0 = time.time()
        lowered = fn.lower(*args)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        row = {
            "config": name,
            "build_s": round(t_build, 1),
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "budgets": [b_budget, l_budget, c_budget],
            "ok": (t_build <= b_budget and t_lower <= l_budget
                   and t_compile <= c_budget),
        }
        print(json.dumps(row), flush=True)
        if not row["ok"]:
            failures.append(name)
        del compiled, lowered
    if failures:
        print(f"COMPILE GATE FAILED: {failures}", flush=True)
        sys.exit(1)
    print("compile gate OK", flush=True)


if __name__ == "__main__":
    main()
