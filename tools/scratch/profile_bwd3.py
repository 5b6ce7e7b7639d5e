import time
import numpy as np
import jax, jax.numpy as jnp
from voge_tpu.timing import measure
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import render_pipeline
from voge_tpu.ops.fine import _ray_trace_fine_mask

g = Cuboid.cuboid_gauss((-1,1),(-1,1),(-1,1),10000,percentage=0.6,as_obj=True)
verts = jnp.asarray(g.verts); sigmas = jnp.asarray(g.sigmas)
P = verts.shape[0]
R,T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.,300.]]); principal = jnp.asarray([[128.,128.]])

def log(name, fn, args_list, n2=16):
    t0=time.perf_counter()
    ms = measure(fn, args_list, n1=4, n2=n2)*1000
    print(f"{name}: {ms:.2f} ms (wall {time.perf_counter()-t0:.0f}s)", flush=True)

# strided-slice gathers from (P,3,3)
E = 256*256*20
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, P, size=E).astype(np.int32))
isg = jnp.asarray(rng.rand(P,3,3).astype(np.float32))
mus3 = jnp.asarray(rng.rand(P,3).astype(np.float32))
def strided_gathers(c):
    acc = 0.
    for i in range(3):
        for j in range(3):
            acc = acc + isg[:, i, j][idx] * c
    for d in range(3):
        acc = acc + mus3[:, d][idx] * c
    return acc
log('strided-slice gathers', jax.jit(strided_gathers), [(jnp.float32(1+1e-3*i),) for i in range(6)])

# full fine custom bwd via vjp of the op alone (mask from renderer internals)
from voge_tpu.ops.coarse import overlap_mask, coarse_bin_config
from voge_tpu.rays import camera_rays
rays, origins = camera_rays(R, T, focal, principal, (256,256))
mus_cam = verts[None] - origins[:,None,:]
isig_b = jnp.broadcast_to(2.0*(sigmas[:,None,None]*jnp.eye(3))[None], (1,P,3,3))
bs, _ = coarse_bin_config((256,256), 20, P, None, None)
mask = overlap_mask(R,T,focal,principal,mus_cam,isig_b,(256,256),0.01,bs)
import math
thr_act = -math.log(0.01+1e-10)

def op_loss(m, s):
    sel = _ray_trace_fine_mask(m, s, rays, mask, thr_act, (bs,bs), 20)
    return jnp.sum(jnp.where(sel[0]>=0, sel[1]*0.1 + sel[2]*0.2 + sel[3]*0.3, 0.)**2)
log('fine op fwd only', jax.jit(op_loss), [(mus_cam*(1+1e-4*i), isig_b) for i in range(6)])
log('fine op fwd+bwd', jax.jit(jax.grad(op_loss, argnums=(0,1))), [(mus_cam*(1+1e-4*i), isig_b) for i in range(6)])
