"""Honest micro-profile of fine-backward components (E=1.3M, P=10K)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from voge_tpu.timing import measure

E, P = 256*256*20, 9602
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, P, size=E).astype(np.int32))
vals12 = jnp.asarray(rng.rand(E, 12).astype(np.float32))
planes = [jnp.asarray(rng.rand(P).astype(np.float32)) for _ in range(12)]
gl = jnp.asarray(rng.rand(E).astype(np.float32))

def log(name, fn, args_list):
    t0=time.perf_counter()
    ms = measure(fn, args_list, n1=4, n2=16)*1000
    print(f"{name}: {ms:.2f} ms (wall {time.perf_counter()-t0:.0f}s)", flush=True)

va = [(vals12*(1+1e-3*i),) for i in range(6)]
log('segment_sum (E,12)->(P,12)', jax.jit(lambda v: jax.ops.segment_sum(v, idx, num_segments=P)), va)

def gathers(c):
    acc = 0.
    for p in planes:
        acc = acc + p[idx] * c
    return acc
log('12 gathers (E,) from (P,)', jax.jit(gathers), [(jnp.float32(1.0+i*1e-3),) for i in range(6)])

def elementwise(c):
    g = [p[idx] for p in planes]
    a = gl*c
    out = 0.
    for i in range(3):
        for j in range(3):
            out = out + a * g[i] * g[3+j]
    return out
log('gather+chain elementwise', jax.jit(elementwise), [(jnp.float32(1.0+i*1e-3),) for i in range(6)])

# aggregation bwd (remat as in renderer)
from voge_tpu.aggregation import aggregation
B,H,W,K = 1,256,256,20
sidx = jnp.asarray(rng.randint(-1, 100, size=(B,H,W,K)).astype(np.int32))
sact = jnp.asarray(rng.rand(B,H,W,K).astype(np.float32))
slen = jnp.asarray(np.sort(rng.rand(B,H,W,K).astype(np.float32),axis=-1))
sdsd = jnp.asarray(rng.rand(B,H,W,K).astype(np.float32)+0.5)
agg_r = jax.checkpoint(lambda a,l,d: aggregation(sidx, a, l, d, 1.0)[0])
f_aggb = jax.jit(jax.grad(lambda a,l,d: (agg_r(a,l,d)**2).sum(), argnums=(0,1,2)))
log('aggregation remat fwd+bwd', f_aggb, [(sact*(1+1e-3*i), slen, sdsd) for i in range(6)])
