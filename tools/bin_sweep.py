"""Sweep bin_size (and cand_chunk) for the headline 10K fwd+bwd step.

The supertile extraction passes cost ~(Kp + cc) * R per occupied chunk
step; smaller bins shrink both the candidate occupancy (cc can drop) and
the ray width R, at the price of more supertiles (more steps, bigger
emission sort).  This sweep measures the real end-to-end step so the
geometry choice in ``production_bin_geometry`` is data, not theory.

Run: python tools/bin_sweep.py [n_gauss]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.renderer import (
    render_pipeline, get_silhouette, precompute_camera_ctx,
)
from voge_tpu.timing import measure_stats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
H = W = 256
K = 20

g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), N, percentage=0.6,
                        as_obj=True)
verts = jnp.asarray(g.verts)
sigmas = jnp.asarray(g.sigmas)
colors = jnp.asarray((np.asarray(g.verts) + 1) / 3)
R_m, T = look_at_view_transform(dist=6, elev=10, azim=70)
focal = np.asarray([[300.0, 300.0]], np.float32)
principal = np.asarray([[W / 2, H / 2]], np.float32)
target = jax.device_put(np.full((1, H, W, 3), 0.5, np.float32))
P = int(verts.shape[0])
print(f"P={P} backend={jax.default_backend()}", flush=True)


def build(bin_size):
    ctx = precompute_camera_ctx(R_m, T, focal, principal, (H, W), P,
                                max_assign=K, bin_size=bin_size)

    def loss_fn(verts, sigmas, colors, ctx, target):
        frag = render_pipeline(
            verts, sigmas, R_m, T, focal, principal, image_size=(H, W),
            max_assign=K, bin_size=bin_size, cam_ctx=ctx, attrs=colors,
        )
        img = frag.attr_img
        sil = get_silhouette(frag)
        return jnp.mean((img - target) ** 2) + jnp.mean(sil ** 2)

    fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    args_fn = lambda i: (verts * (1.0 + 1e-5 * i), sigmas, colors, ctx,
                         target)
    return fn, args_fn


for bs, cc in [(None, None), (8, None), (8, 128), (12, None), (8, 64),
               (16, None)]:
    if cc is None:
        os.environ.pop("VOGE_CC", None)
    else:
        os.environ["VOGE_CC"] = str(cc)
    try:
        fn, args_fn = build(bs)
        st = measure_stats(fn, args_fn=args_fn, n1=5, n2=45, attempts=3)
        print(f"bin={bs} cc={cc}: {st['median']*1e3:7.2f} ms  "
              f"(spread {st['spread']*100:.0f}%)", flush=True)
    except Exception as e:
        print(f"bin={bs} cc={cc}: FAILED {type(e).__name__}: {e}",
              flush=True)
os.environ.pop("VOGE_CC", None)
