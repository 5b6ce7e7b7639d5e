"""Localize the bunny config's f32 drift (PARITY.json: ours 0.80 vs the
reference-f32 control 0.157 on agreeing pixels — round-2 VERDICT weak #2).

Method: render the bunny config in f32 and f64 (ours-in-f64 is proven
identical to the reference oracle, PARITY.json exact_f64_err ~ 3e-10), find
the worst agreeing pixels, and attribute the error:

  - per-pixel LOCAL error envelope: eps_f32 * max(msm) over the pixel's own
    selected candidates (the act = msm - msk^2/ksk cancellation bound) —
    the global envelope in the gate uses the 99th msm percentile, which
    underestimates tail pixels;
  - per-slot intermediates (len/act/dsd/weight) f32 vs f64 at the worst
    pixel, plus both contraction orders (planes A = Lambda^T mu vs the
    CUDA Innerdot3d order) and the compensated residual form
    act = d^T Lambda d with d = mu - t r (no large-term cancellation).

Run under JAX_PLATFORMS=cpu.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_comp_cache")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tools.parity_gate import cfg_bunny
from voge_tpu.aggregation import expend_sigma, weights_from_sel
from voge_tpu.renderer import render_pipeline, to_white_background

cfg = cfg_bunny()
H, W, K = cfg["H"], cfg["W"], cfg["K"]
P = cfg["verts"].shape[0]
sig33 = np.asarray(expend_sigma(jnp.asarray(cfg["sigmas"])))


def render(dtype):
    with jax.enable_x64(dtype == np.float64):
        frag = render_pipeline(
            jnp.asarray(cfg["verts"], dtype), jnp.asarray(sig33, dtype),
            jnp.asarray(cfg["R"], dtype), jnp.asarray(cfg["T"], dtype),
            jnp.asarray(cfg["focal"], dtype),
            jnp.asarray(cfg["principal"], dtype),
            image_size=(H, W), max_assign=K,
            max_point_per_bin=P,
        )
        img = np.asarray(
            to_white_background(frag, jnp.asarray(cfg["colors"], dtype))
        )
        return (np.asarray(frag.vert_index), np.asarray(frag.vert_weight),
                np.asarray(frag.vert_hit_length), img)


i32, w32, l32, img32 = render(np.float32)
i64, w64, l64, img64 = render(np.float64)

agree = (i32 == i64).all(axis=-1)[0]
err = np.abs(img32 - img64).max(axis=-1)[0]
err_a = np.where(agree, err, 0.0)
print(f"agree {agree.mean():.4f}  max_err_agree {err_a.max():.4f}")

# camera-centered f64 ground-truth per-candidate quantities
Rn = np.asarray(cfg["R"], np.float64)[0]
Tn = np.asarray(cfg["T"], np.float64)[0]
C_cam = -Tn @ np.linalg.inv(Rn)
mu = np.asarray(cfg["verts"], np.float64) - C_cam
lam = 2.0 * np.asarray(sig33, np.float64)
msm_all = np.einsum("ni,nij,nj->n", mu, lam, mu)

# ---- local envelope over agreeing pixels ---------------------------------
sel = i64[0]                                   # (H, W, K) global b*N+n, B=1
valid = sel >= 0
msm_px = np.where(valid, msm_all[np.where(valid, sel % P, 0)], 0.0)
local_env = 1.2e-7 * msm_px.max(axis=-1)       # (H, W)
ratio = err_a / np.maximum(local_env, 1e-12)
rr = ratio[agree & (err_a > 1e-4)]
print(f"pixels with err>1e-4 on agree: {(err_a > 1e-4).sum()}")
print("err / local_envelope percentiles on those:",
      np.percentile(rr, [50, 90, 99, 100]).round(3) if rr.size else "n/a")

# ---- worst pixels ---------------------------------------------------------
flat = np.argsort(err_a.ravel())[::-1][:8]
from voge_tpu.rays import camera_rays

rays64, orig64 = camera_rays(
    jnp.asarray(cfg["R"], jnp.float64), jnp.asarray(cfg["T"], jnp.float64),
    jnp.asarray(cfg["focal"], jnp.float64),
    jnp.asarray(cfg["principal"], jnp.float64), (H, W))
with jax.enable_x64(True):
    rays64 = np.asarray(rays64, np.float64)

for f in flat[:4]:
    y, x = np.unravel_index(f, (H, W))
    print(f"\n--- pixel ({y},{x}) err {err_a[y, x]:.4f} "
          f"local_env {local_env[y, x]:.4f}")
    ids = sel[y, x]
    v = ids >= 0
    idn = np.where(v, ids % P, 0)
    r = rays64[0, y, x]
    mu_s = mu[idn]                                   # (K, 3)
    lam_s = lam[idn]                                 # (K, 3, 3)
    for dt, tag in ((np.float32, "f32"), (np.float64, "f64")):
        mu_d = mu_s.astype(dt)
        lam_d = lam_s.astype(dt)
        r_d = r.astype(dt)
        # our planes order: A = Lambda^T mu, msk = A . r
        A = np.einsum("kij,ki->kj", lam_d, mu_d).astype(dt)
        msm_p = np.sum(mu_d * A, axis=-1).astype(dt)
        msk_p = np.sum(A * r_d, axis=-1).astype(dt)
        ksk_p = np.einsum("i,kij,j->k", r_d, lam_d, r_d).astype(dt)
        act_p = (msm_p - msk_p * msk_p / ksk_p).astype(dt)
        # CUDA order: three separate Innerdot3d
        lr = np.einsum("kij,j->ki", lam_d, r_d).astype(dt)
        msk_c = np.sum(mu_d * lr, axis=-1).astype(dt)
        msm_c = np.einsum("ki,kij,kj->k", mu_d, lam_d, mu_d).astype(dt)
        act_c = (msm_c - msk_c * msk_c / ksk_p).astype(dt)
        # compensated residual form: d = mu - t r, act = d^T Lambda d
        t_d = (msk_p / ksk_p).astype(dt)
        d = (mu_d - t_d[:, None] * r_d[None]).astype(dt)
        act_r = np.einsum("ki,kij,kj->k", d, lam_d, d).astype(dt)
        w_p = np.asarray(weights_from_sel(
            jnp.asarray((msk_p / ksk_p)[None, None, None]),
            jnp.asarray(act_p[None, None, None]),
            jnp.asarray(ksk_p[None, None, None]), 1.0))[0, 0, 0]
        if dt == np.float64:
            act_t, w_t = act_p, w_p
            print(" slot msm          act_f64     dact_plane  dact_cuda   "
                  "dact_resid  w_f64    dw_f32")
            for k in range(K):
                if not v[k]:
                    continue
                print(f"  {k:3d} {msm_p[k]:11.1f} {act_t[k]:11.6f} "
                      f"{p32['act_p'][k]-act_t[k]:11.6f} "
                      f"{p32['act_c'][k]-act_t[k]:11.6f} "
                      f"{p32['act_r'][k]-act_t[k]:11.6f} "
                      f"{w_t[k]:.5f} {p32['w'][k]-w_t[k]:9.5f}")
        else:
            p32 = dict(act_p=act_p, act_c=act_c, act_r=act_r, w=w_p)
