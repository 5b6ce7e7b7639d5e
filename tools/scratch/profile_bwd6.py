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

def op_loss(m, s):
    sel = F._ray_trace_fine_mask(m, s, rays, mask, thr_act, (bs,bs), 20)
    return jnp.sum(jnp.where(sel[0]>=0, sel[1]*0.1 + sel[2]*0.2 + sel[3]*0.3, 0.)**2)

orig = F._ray_trace_fine_bwd

def make_variant(mode):
    def bwd(thr_act_, bin_size_, K_, res, gg):
        mus, isigmas, rays_, sel_idx, bp = res
        _, g_len, g_act, g_dsd = gg
        B, H, W, Kk = sel_idx.shape
        Pf = mus.shape[0]
        if mode == 'zeros':
            s = jnp.sum(g_len) * 0.0
            return (jnp.zeros_like(mus)+s, jnp.zeros_like(isigmas)+s,
                    jnp.zeros_like(rays_)+s, np.zeros(bp.shape, dtype=jax.dtypes.float0))
        idx = sel_idx.reshape(-1)
        valid = idx >= 0
        idxc = jnp.where(valid, idx, 0)
        mu = [mus[:, d][idxc] for d in range(3)]
        L = [[isigmas[:, i, j][idxc] for j in range(3)] for i in range(3)]
        r_pix = [rays_[..., d].reshape(-1) for d in range(3)]
        r = [jnp.broadcast_to(x[:, None], (x.shape[0], Kk)).reshape(-1) for x in r_pix]
        lam_r = [sum(L[i][j]*r[j] for j in range(3)) for i in range(3)]
        lamT_r = [sum(L[j][i]*r[j] for j in range(3)) for i in range(3)]
        lam_mu = [sum(L[i][j]*mu[j] for j in range(3)) for i in range(3)]
        lamT_mu = [sum(L[j][i]*mu[j] for j in range(3)) for i in range(3)]
        ksk = sum(r[i]*lam_r[i] for i in range(3))
        msk = sum(mu[i]*lam_r[i] for i in range(3))
        ksk = jnp.where(valid, ksk, 1.0)
        vf = valid.astype(mus.dtype)
        gl = g_len.reshape(-1)*vf; ga = g_act.reshape(-1)*vf; gd = g_dsd.reshape(-1)*vf
        g_ksk = (ga*msk - gl)*msk/(ksk*ksk) + gd
        g_msk = (gl - 2.0*ga*msk)/ksk
        g_msm = ga
        g_mu = [g_msk*lam_r[i] + g_msm*(lam_mu[i]+lamT_mu[i]) for i in range(3)]
        g_ray = [g_ksk*(lam_r[i]+lamT_r[i]) + g_msk*lamT_mu[i] for i in range(3)]
        g_L = [g_ksk*r[i]*r[j] + g_msk*mu[i]*r[j] + g_msm*mu[i]*mu[j]
               for i in range(3) for j in range(3)]
        grad_rays = jnp.stack([x.reshape(B,H,W,Kk).sum(axis=3) for x in g_ray], axis=-1)
        if mode == 'no_segsum':
            s = sum(jnp.sum(x) for x in g_mu + g_L) * 1e-20
            return (jnp.zeros_like(mus)+s, jnp.zeros_like(isigmas)+s, grad_rays,
                    np.zeros(bp.shape, dtype=jax.dtypes.float0))
        packed = jnp.stack(g_mu + g_L, axis=-1)
        summed = jax.ops.segment_sum(packed, idxc, num_segments=Pf)
        grad_mus = summed[:, 0:3]
        grad_isg = summed[:, 3:12].reshape(Pf, 3, 3)
        return grad_mus, grad_isg, grad_rays, np.zeros(bp.shape, dtype=jax.dtypes.float0)
    return bwd

for mode in ('zeros', 'no_segsum', 'full'):
    F._ray_trace_fine_bwd = make_variant(mode) if mode != 'full' else orig
    F._ray_trace_fine_mask.defvjp(F._ray_trace_fine_mask_fwd, F._ray_trace_fine_mask_bwd)
    fn = jax.jit(jax.value_and_grad(op_loss, argnums=(0,1)))
    log(f'v+g bwd={mode}', fn, [(mus_cam*(1+1e-4*i), isig_b) for i in range(6)])
F._ray_trace_fine_bwd = orig
