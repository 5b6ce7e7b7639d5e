"""Microbenchmark: the K-pass argmin-extraction merge in isolation.

Measures per-pass cost vs (R, W, n_payloads, variant) to find where the
time goes (reduction latency vs vreg throughput).
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voge_tpu.timing import measure

_INF = 1e10


def make_kernel(R, W, K, n_payload, variant):
    def kernel(len_ref, pay_ref, ol_ref, op_ref):
        cat_len = len_ref[:]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        new_len = []
        new_pay = [[] for _ in range(n_payload)]
        for _ in range(K):
            if variant == "full":
                mn = jnp.min(cat_len, axis=1, keepdims=True)
                am = jnp.argmin(cat_len, axis=1)
                oh = lane_w == am[:, None]
                valid = mn < _INF
                new_len.append(jnp.where(valid, mn, _INF))
                for p in range(n_payload):
                    v = jnp.sum(jnp.where(oh, pay_ref[p], 0.0), axis=1, keepdims=True)
                    new_pay[p].append(jnp.where(valid, v, 0.0))
                cat_len = jnp.where(oh, _INF, cat_len)
            elif variant == "slim":
                # no min reduce, no valid wheres: len extracted via masked sum
                am = jnp.argmin(cat_len, axis=1)
                oh = lane_w == am[:, None]
                new_len.append(jnp.sum(jnp.where(oh, cat_len, _INF * 0.0), axis=1, keepdims=True))
                for p in range(n_payload):
                    new_pay[p].append(jnp.sum(jnp.where(oh, pay_ref[p], 0.0), axis=1, keepdims=True))
                cat_len = jnp.where(oh, _INF, cat_len)
            elif variant == "noargmin":
                # argmin replaced by min + first-match-lane min
                mn = jnp.min(cat_len, axis=1, keepdims=True)
                oh0 = cat_len == mn
                am = jnp.min(jnp.where(oh0, lane_w, W), axis=1, keepdims=True)
                oh = lane_w == am
                new_len.append(mn)
                for p in range(n_payload):
                    new_pay[p].append(jnp.sum(jnp.where(oh, pay_ref[p], 0.0), axis=1, keepdims=True))
                cat_len = jnp.where(oh, _INF, cat_len)
            elif variant == "minonly":
                mn = jnp.min(cat_len, axis=1, keepdims=True)
                new_len.append(mn)
                oh = cat_len == mn
                cat_len = jnp.where(oh, _INF, cat_len)
            elif variant == "argminonly":
                am = jnp.argmin(cat_len, axis=1)
                oh = lane_w == am[:, None]
                new_len.append(jnp.sum(jnp.where(oh, cat_len, 0.0), axis=1, keepdims=True))
                cat_len = jnp.where(oh, _INF, cat_len)
        ol_ref[:] = jnp.concatenate(new_len + [jnp.zeros((R, 128 - K))], axis=1)
        if n_payload and variant in ("full", "slim"):
            op_ref[:] = jnp.concatenate(new_pay[0] + [jnp.zeros((R, 128 - K))], axis=1)
        else:
            op_ref[:] = jnp.zeros((R, 128))

    return kernel


def make_kernel_T(R, W, K, n_payload):
    """Transposed layout: candidates on SUBLANES (axis 0), rays on lanes."""
    def kernel(len_ref, pay_ref, ol_ref, op_ref):
        cat_len = len_ref[0]                       # (W, R)
        sub_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
        new_len = []
        new_pay = [[] for _ in range(n_payload)]
        acc_p = [jnp.zeros((8, R), jnp.float32) for _ in range(n_payload)]
        for k in range(K):
            mn = jnp.min(cat_len, axis=0, keepdims=True)       # (1, R)
            oh0 = cat_len == mn
            am = jnp.min(jnp.where(oh0, sub_w, W), axis=0, keepdims=True)
            oh = sub_w == am
            new_len.append(mn)
            for p in range(n_payload):
                v = jnp.sum(jnp.where(oh, pay_ref[p], 0.0), axis=0, keepdims=True)
                acc_p[p] = acc_p[p] + jnp.broadcast_to(v, (8, R)) * (
                    jax.lax.broadcasted_iota(jnp.int32, (8, R), 0) == (k % 8)
                )
            cat_len = jnp.where(oh, _INF, cat_len)
        ol_ref[:] = jnp.concatenate(
            [jnp.concatenate(new_len, axis=0)] +
            [jnp.zeros((128 - K, R))], axis=0)
        if n_payload:
            op_ref[:] = jnp.concatenate(
                acc_p[0:1] + [jnp.zeros((120, R))], axis=0)
        else:
            op_ref[:] = jnp.zeros((128, R))
    return kernel


def bench_T(R, W, K, n_payload, steps=64):
    kern = make_kernel_T(R, W, K, n_payload)
    lens = jnp.asarray(np.random.RandomState(0).rand(steps, W, R).astype(np.float32))
    pays = jnp.asarray(np.random.RandomState(1).rand(max(n_payload, 1), W, R).astype(np.float32))

    def run(lens, pays):
        f = pl.pallas_call(
            kern,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, W, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((max(n_payload, 1), W, R), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((128, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((128, R), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(lens, pays)
        return f[0].sum() + f[1].sum()

    t = measure(jax.jit(run), [(lens, pays)], n1=3, n2=10)
    per_pass_us = t / steps / K * 1e6
    print(f"T: R={R:5d} W={W:5d} K={K} pay={n_payload}: "
          f"{t*1e3:7.2f} ms total, {t/steps*1e6:7.1f} us/step, {per_pass_us:6.2f} us/pass")


def bench(R, W, K, n_payload, variant, steps=64):
    kern = make_kernel(R, W, K, n_payload, variant)
    lens = jnp.asarray(np.random.RandomState(0).rand(steps, R, W).astype(np.float32))
    pays = jnp.asarray(np.random.RandomState(1).rand(max(n_payload, 1), R, W).astype(np.float32))

    def run(lens, pays):
        f = pl.pallas_call(
            lambda l_ref, p_ref, ol, op: kern(l_ref.at[0], p_ref, ol, op),
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, R, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((max(n_payload, 1), R, W), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(lens, pays)
        return f[0].sum() + f[1].sum()

    t = measure(jax.jit(run), [(lens, pays)], n1=3, n2=10)
    per_pass_us = t / steps / K * 1e6
    vregs = (R // 8) * (-(-W // 128))
    print(f"R={R:5d} W={W:5d} K={K} pay={n_payload} {variant:10s}: "
          f"{t*1e3:7.2f} ms total, {t/steps*1e6:7.1f} us/step, "
          f"{per_pass_us:6.2f} us/pass, {per_pass_us*1000/vregs:6.2f} ns/vreg/pass")


if __name__ == "__main__":
    for (R, W) in [(416, 1152), (416, 256), (1024, 1152)]:
        for variant, pay in [("noargmin", 3), ("noargmin", 4), ("slim", 3), ("minonly", 0)]:
            try:
                bench(R, W, 20, pay, variant)
            except Exception as e:
                print(f"R={R} W={W} {variant}: FAIL {str(e)[:100]}")
