import time
import numpy as np
import jax, jax.numpy as jnp
from voge_tpu.timing import measure

E, P = 256*256*20, 9602
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, P, size=E).astype(np.int32))
planes = [jnp.asarray(rng.rand(E).astype(np.float32)) for _ in range(12)]

def log(name, fn, args_list, n2=16):
    t0=time.perf_counter()
    ms = measure(fn, args_list, n1=4, n2=n2)*1000
    print(f"{name}: {ms:.2f} ms (wall {time.perf_counter()-t0:.0f}s)", flush=True)

def stack_then_segsum(c):
    packed = jnp.stack([p*c for p in planes], axis=-1)      # (E, 12)
    return jax.ops.segment_sum(packed, idx, num_segments=P)
log('stack(E,12)+segment_sum', jax.jit(stack_then_segsum), [(jnp.float32(1+1e-3*i),) for i in range(6)])

def sep_segsums(c):
    outs = [jax.ops.segment_sum(p*c, idx, num_segments=P) for p in planes]
    return jnp.stack(outs, axis=-1)
log('12 separate segment_sums', jax.jit(sep_segsums), [(jnp.float32(1+1e-3*i),) for i in range(6)])

def stack_only(c):
    return jnp.stack([p*c for p in planes], axis=-1).sum()
log('stack (E,12) only', jax.jit(stack_only), [(jnp.float32(1+1e-3*i),) for i in range(6)])

# one-hot matmul alternative: sort-free; (E,12)^T @ onehot? too big. skip.
