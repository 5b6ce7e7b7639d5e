"""Per-execution floor of the TPU attachment: times trivial jitted
functions with the same two-point protocol as the benchmarks
(voge_tpu/timing.py), so workload numbers can be split into device work vs
relay/dispatch floor.  Run: python tools/relay_floor.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.timing import measure

print("backend", jax.default_backend())

cases = {
    # one tiny elementwise kernel: pure dispatch floor
    "tiny_add_1kern": (jax.jit(lambda x: x + 1.0), (jnp.ones((8, 128)),)),
    # ~40 sequential tiny kernels (optimization barriers defeat fusion):
    # how much each extra kernel in a program costs end to end
    "tiny_chain_40kern": (
        jax.jit(
            lambda x: jax.lax.fori_loop(
                0,
                40,
                lambda i, v: jax.lax.optimization_barrier(v) + 1.0,
                x,
            )
        ),
        (jnp.ones((8, 128)),),
    ),
    # one medium matmul (~67 MFLOP): device-work reference point
    "matmul_1024": (
        jax.jit(lambda a: a @ a),
        (jnp.ones((1024, 1024), jnp.bfloat16),),
    ),
}

for name, (fn, args) in cases.items():
    args_list = [
        tuple(a * (1.0 + 1e-5 * i) for a in args) for i in range(64)
    ]
    t = measure(fn, args_list, n1=8, n2=56)
    print(f"{name:20s} {t * 1e3:8.3f} ms/exec")
