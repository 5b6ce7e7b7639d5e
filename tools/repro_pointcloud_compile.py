"""Reproduce the round-4 pointcloud cold-compile blowup (VERDICT weak #2).

Builds the bench.py pointcloud workload (100K pts, 320x320, K=20), lowers
and compiles it AOT with a FRESH compilation cache, printing wall-clock for
lower / compile / first-exec separately.  Run on the TPU attachment:

    timeout 580 python tools/repro_pointcloud_compile.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcold")

import jax

import bench

t0 = time.time()
fn, args_fn = bench.build_fwd_pointcloud()
args = args_fn(0)
print(f"build: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
lowered = fn.lower(*args)
print(f"lower: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
compiled = lowered.compile()
print(f"compile: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
out = compiled(*args)
jax.block_until_ready(out)
print(f"first exec: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
for i in range(3):
    out = compiled(*args_fn(i + 1))
jax.block_until_ready(out)
print(f"3 steady execs: {(time.time()-t0)/3*1000:.1f} ms each", flush=True)
