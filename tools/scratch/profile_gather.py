import time
import numpy as np
import jax, jax.numpy as jnp
from voge_tpu.timing import measure

E, P = 256*256*20, 9602
rng = np.random.RandomState(0)
idxs = [jnp.asarray(rng.randint(0, P, size=E).astype(np.int32)) for _ in range(6)]
plane = jnp.asarray(rng.rand(P).astype(np.float32))
packed = jnp.asarray(rng.rand(P, 16).astype(np.float32))

def log(name, fn, args_list, n2=16):
    t0=time.perf_counter()
    ms = measure(fn, args_list, n1=4, n2=n2)*1000
    print(f"{name}: {ms:.2f} ms (wall {time.perf_counter()-t0:.0f}s)", flush=True)

log('1 gather (E,) from (P,)', jax.jit(lambda i: plane[i].sum()), [(i,) for i in idxs])
def g15(i):
    acc = 0.
    for k in range(15):
        acc = acc + (plane[i] * (k+1)).sum()
    return acc
log('15 gathers (E,) from (P,)', jax.jit(g15), [(i,) for i in idxs])
log('1 row-gather (E,16) from (P,16)', jax.jit(lambda i: packed[i].sum()), [(i,) for i in idxs])
def g15_distinct(i):
    # 15 gathers with DISTINCT source planes (defeat CSE)
    acc = 0.
    for k in range(15):
        acc = acc + (packed[:, k][i]).sum()
    return acc
log('15 strided gathers from (P,16)', jax.jit(g15_distinct), [(i,) for i in idxs])
