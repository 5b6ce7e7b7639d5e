"""Honest stage ablation profile on the real TPU (slow: each program pays a
first-execution penalty on this attachment)."""
import time
import numpy as np
import jax, jax.numpy as jnp

from voge_tpu.timing import measure
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.rays import camera_rays
from voge_tpu.ops import fine, coarse
from voge_tpu.aggregation import aggregation
from voge_tpu.renderer import render_pipeline, interpolate_attr, get_silhouette

g = Cuboid.cuboid_gauss((-1,1),(-1,1),(-1,1),10000,percentage=0.6,as_obj=True)
verts = jnp.asarray(g.verts); sigmas = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts)+1)/3)
P = verts.shape[0]; H=W=256
R,T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.,300.]]); principal = jnp.asarray([[128.,128.]])
rays, origins = camera_rays(R,T,focal,principal,(H,W))
mus_cam = (verts[None]-origins[:,None,:])
isig_b = jnp.broadcast_to(2.0*(sigmas[:,None,None]*jnp.eye(3))[None],(1,P,3,3))
bs, M = coarse.coarse_bin_config((H,W), 20, P, None, None)
target = jnp.ones((1,H,W,3))*0.5

def log(name, fn, args_list):
    t0 = time.perf_counter()
    ms = measure(fn, args_list, n1=4, n2=20) * 1000
    print(f"{name}: {ms:.2f} ms   (wall {time.perf_counter()-t0:.0f}s)", flush=True)

va = [ (verts*(1+1e-4*i),) for i in range(6) ]

# B: coarse only
fB = jax.jit(lambda v: coarse.rasterize_coarse(R,T,focal,principal,(v[None]-origins[:,None,:]),isig_b,(H,W),0.01,bs,M))
log('coarse only', fB, va)

# C: fine only (bins as input)
bins = fB(verts)
fC = jax.jit(lambda v, bp: fine.ray_tracing_fine((v[None]-origins[:,None,:]).reshape(-1,3), isig_b.reshape(-1,3,3), rays, bp, 0.01, bs, 20))
log('fine only', fC, [(v[0], bins) for v in va])

# E: full fwd
fE = jax.jit(lambda v: render_pipeline(v, sigmas, R, T, focal, principal, image_size=(H,W), max_assign=20).vert_weight)
log('full fwd', fE, va)

# F: full fwd+bwd
def loss_fn(v, s, c):
    frag = render_pipeline(v, s, R, T, focal, principal, image_size=(H,W), max_assign=20)
    return jnp.mean((interpolate_attr(frag, c)-target)**2) + jnp.mean(get_silhouette(frag)**2)
fF = jax.jit(jax.grad(loss_fn, argnums=(0,1,2)))
log('full fwd+bwd', fF, [(v[0], sigmas, colors) for v in va])
