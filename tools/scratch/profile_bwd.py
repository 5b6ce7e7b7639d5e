"""Honest backward ablation at 10K Gaussians, 256x256."""
import time
import numpy as np
import jax, jax.numpy as jnp
from voge_tpu.timing import measure
from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import render_pipeline, interpolate_attr, get_silhouette

g = Cuboid.cuboid_gauss((-1,1),(-1,1),(-1,1),10000,percentage=0.6,as_obj=True)
verts = jnp.asarray(g.verts); sigmas = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts)+1)/3)
R,T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = jnp.asarray([[300.,300.]]); principal = jnp.asarray([[128.,128.]])
target = jnp.ones((1,256,256,3))*0.5

def full_loss(v, s, c):
    frag = render_pipeline(v, s, R, T, focal, principal, image_size=(256,256), max_assign=20)
    return jnp.mean((interpolate_attr(frag, c)-target)**2) + jnp.mean(get_silhouette(frag)**2)

def weight_loss(v, s):
    frag = render_pipeline(v, s, R, T, focal, principal, image_size=(256,256), max_assign=20)
    return jnp.mean(frag.vert_weight**2)

def log(name, fn, args_list):
    t0=time.perf_counter()
    ms = measure(fn, args_list, n1=4, n2=16)*1000
    print(f"{name}: {ms:.2f} ms  (wall {time.perf_counter()-t0:.0f}s)", flush=True)

va = [(verts*(1+1e-4*i), sigmas, colors) for i in range(6)]
log('grad colors only', jax.jit(jax.grad(full_loss, argnums=2)), va)
log('grad verts only (full loss)', jax.jit(jax.grad(full_loss, argnums=0)), va)
log('grad verts only (weight loss)', jax.jit(jax.grad(weight_loss, argnums=0)), [(v,s) for v,s,_ in va])
log('grad all (full loss)', jax.jit(jax.grad(full_loss, argnums=(0,1,2))), va)
