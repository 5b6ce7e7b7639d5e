import time, math
import numpy as np
import jax, jax.numpy as jnp
from voge_tpu.timing import measure
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.rays import camera_rays
from voge_tpu.ops.coarse import overlap_mask, coarse_bin_config
import voge_tpu.ops.fine as F

g = Cuboid.cuboid_gauss((-1,1),(-1,1),(-1,1),10000,percentage=0.6,as_obj=True)
verts = jnp.asarray(g.verts); sigmas = jnp.asarray(g.sigmas)
P = verts.shape[0]
R,T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.,300.]]); principal = jnp.asarray([[128.,128.]])
rays, origins = camera_rays(R, T, focal, principal, (256,256))
mus_cam = verts[None] - origins[:,None,:]
isig_b = jnp.broadcast_to(2.0*(sigmas[:,None,None]*jnp.eye(3))[None], (1,P,3,3))
bs, _ = coarse_bin_config((256,256), 20, P, None, None)
mask = overlap_mask(R,T,focal,principal,mus_cam,isig_b,(256,256),0.01,bs)
thr_act = -math.log(0.01+1e-10)

def log(name, fn, args_list, n2=16):
    t0=time.perf_counter()
    ms = measure(fn, args_list, n1=4, n2=n2)*1000
    print(f"{name}: {ms:.2f} ms (wall {time.perf_counter()-t0:.0f}s)", flush=True)

def make_loss():
    def op_loss(m, s):
        sel = F._ray_trace_fine_mask(m, s, rays, mask, thr_act, (bs,bs), 20)
        return jnp.sum(jnp.where(sel[0]>=0, sel[1]*0.1 + sel[2]*0.2 + sel[3]*0.3, 0.)**2)
    return op_loss

orig_bwd = F._ray_trace_fine_bwd

def bwd_zeros(thr_act_, bin_size_, K_, res, g_):
    mus, isigmas, rays_, sel_idx, bp = res
    return (jnp.zeros_like(mus), jnp.zeros_like(isigmas), jnp.zeros_like(rays_),
            np.zeros(bp.shape, dtype=jax.dtypes.float0))

variants = {'zeros': bwd_zeros, 'full': orig_bwd}
for name, bwd in variants.items():
    F._ray_trace_fine.defvjp(F._ray_trace_fine_fwd, bwd)
    # re-register mask vjp too (it calls _ray_trace_fine_bwd directly)
    F._ray_trace_fine_bwd = bwd
    F._ray_trace_fine_mask.defvjp(F._ray_trace_fine_mask_fwd, F._ray_trace_fine_mask_bwd)
    fn = jax.jit(jax.grad(make_loss(), argnums=(0,1)))
    log(f'bwd={name}', fn, [(mus_cam*(1+1e-4*i), isig_b) for i in range(6)])
F._ray_trace_fine_bwd = orig_bwd
