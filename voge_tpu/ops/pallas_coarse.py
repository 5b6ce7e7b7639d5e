"""Pallas emission kernel for the coarse stage.

Fuses the per-Gaussian window math of
:func:`voge_tpu.ops.coarse.emit_supertile_candidates` — camera projection,
pixel-radius ellipse bound, 2x2 supertile window, per-bin membership bits,
and sort-key packing — into ONE kernel over the Gaussian axis.  The XLA
formulation is ~80 sequential (B, P) elementwise ops (the math is trivial;
the latency of the op chain is not: ~0.5 ms of the 10K step); the kernel
runs the same arithmetic as ~80 row passes over lane chunks in ~2 machine
steps' worth of dispatch.

Reference math being implemented: the per-Gaussian bbox walk of
``rasterize_coarse.cu:111-151`` and the ``convert_to_box`` ellipse bound
(``RayTracing.py:33-39``) — identical term-for-term to
``coarse._camera_planes`` / ``coarse._pixel_radii_planes`` /
``coarse.emit_supertile_candidates`` (the parity test drives both).

Outputs (per Gaussian):
  - ``keys`` (B, win^2, P_pad) int32: the window-cell sort keys,
    ``((img*nst + sy*BW2 + sx) * S + idx) * 16 + bits``; invalid
    emissions carry the out-of-range sentinel ``nb * S * 16``.
  - ``aux`` (B, 8, P_pad) f32 rows: u, v, rx, ry, z, oversize-flag —
    consumed by the (rare) global-member path, which stays in XLA.

Only dispatched when the key range fits int32 (the XLA path handles the
int64 regime) — checked by the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _emit_kernel(
    cam_ref,     # (B, 16) f32 SMEM: R row-major (9), fx, fy, px, py
    p_ref,       # (1, 3, pc) f32 camera-centered point planes
    l_ref,       # (1, 9, pc) f32 isigma planes (row i*3+j = Lambda_ij)
    keys_ref,    # (1, win^2, pc) int32 out
    aux_ref,     # (1, 8, pc) f32 out
    *, nlt: float, fb: float, H: int, W: int, BH2: int, BW2: int,
    nst: int, S: int, P: int, pc: int, big: int, win: int,
):
    b = pl.program_id(0)
    cch = pl.program_id(1)
    st = 2.0 * fb
    R = lambda i, d: cam_ref[b, 3 * i + d]
    p = [p_ref[0, d:d + 1, :] for d in range(3)]              # (1, pc)
    L = [[l_ref[0, 3 * i + j:3 * i + j + 1, :] for j in range(3)]
         for i in range(3)]

    # ---- camera planes (coarse._camera_planes) ------------------------
    view = [p[0] * R(0, d) + p[1] * R(1, d) + p[2] * R(2, d)
            for d in range(3)]
    z = view[2]
    u = cam_ref[b, 11] - view[0] * cam_ref[b, 9] / z
    v = cam_ref[b, 12] - view[1] * cam_ref[b, 10] / z

    # ---- pixel radii (coarse._pixel_radii_planes) ---------------------
    Lc = [[None, None], [None, None]]
    for a_ in range(2):
        for b_ in range(2):
            acc = jnp.zeros_like(z)
            for i in range(3):
                for j in range(3):
                    acc = acc + (R(i, a_) * R(j, b_)) * L[i][j]
            Lc[a_][b_] = acc
    det = Lc[0][0] * Lc[1][1] - Lc[0][1] * Lc[1][0]
    fx = cam_ref[b, 9]
    fy = cam_ref[b, 10]
    col_x = (fx * fx * Lc[1][1] - fy * fx * Lc[1][0]) / det
    col_y = (-fx * fy * Lc[0][1] + fy * fy * Lc[0][0]) / det
    rx = jnp.sqrt(nlt * col_x) / z
    ry = jnp.sqrt(nlt * col_y) / z
    keep = jnp.logical_not(z < 0)

    # ---- 2x2 supertile window (coarse.emit_supertile_candidates) ------
    def window(c, r):
        lo = (c - r - fb) / st
        hi = (c + r) / st
        fin = jnp.isfinite(lo) & jnp.isfinite(hi)
        f0 = jnp.where(fin, jnp.floor(jnp.where(fin, lo, 0.0)), 0.0)
        f1 = jnp.where(fin, jnp.floor(jnp.where(fin, hi, 0.0)), -2.0)
        f0i = jnp.clip(f0, -2.0 ** 30, 2.0 ** 30).astype(jnp.int32)
        w = jnp.clip(f1, -2.0 ** 30, 2.0 ** 30).astype(jnp.int32) - f0i + 1
        return f0i, w, fin

    fx0, wx, finx = window(u, rx)
    fy0, wy, finy = window(v, ry)
    oversize = keep & ((~finx) | (~finy) | (wx > win) | (wy > win))

    # per-axis bin overlap tests for the window's 4 bin columns/rows
    lo_u, hi_u = u - rx, u + rx
    lo_v, hi_v = v - ry, v + ry
    fx0f = fx0.astype(jnp.float32)
    fy0f = fy0.astype(jnp.float32)
    xo = []
    yo = []
    for m in range(2 * win):
        bx = (2.0 * fx0f + m) * fb
        xo.append((lo_u <= bx + fb) & (bx < hi_u) & (bx < W))
        by = (2.0 * fy0f + m) * fb
        yo.append((lo_v <= by + fb) & (by < hi_v) & (by < H))

    idx = (jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1) + cch * pc)
    in_p = idx < P
    base_ok = keep & (~oversize) & in_p

    for e in range(win * win):
        cx, cy = e % win, e // win
        bits = jnp.zeros_like(idx)
        for i in range(2):
            for j in range(2):
                t = (yo[2 * cy + i] & xo[2 * cx + j]).astype(jnp.int32)
                bits = bits | (t << (2 * i + j))
        sx = fx0 + cx
        sy = fy0 + cy
        ok = (
            base_ok & (sx >= 0) & (sx < BW2) & (sy >= 0) & (sy < BH2)
            & (bits != 0)
        )
        key = ((b * nst + sy * BW2 + sx) * S + idx) * 16 + bits
        keys_ref[0, e:e + 1, :] = jnp.where(ok, key, jnp.int32(big))

    ovf = oversize.astype(jnp.float32)
    aux_ref[0] = jnp.concatenate(
        [u, v, rx, ry, z, ovf, jnp.zeros_like(u), jnp.zeros_like(u)],
        axis=0,
    )


def emit_keys_pallas(
    R: jax.Array, T: jax.Array, focal: jax.Array, principal: jax.Array,
    points: jax.Array,     # (B, P, 3) camera-centered
    isigmas: jax.Array,    # (B, P, 3, 3)
    thr: float, bin_size: int, image_size, nst: int, BH2: int, BW2: int,
    S: int, win: int = 2, interpret: bool = False,
):
    """Run the fused emission kernel; returns (keys (B, P, win^2) int32,
    u, v, rx, ry (each (B, P) f32), oversize (B, P) bool)."""
    import math

    B, P = points.shape[0], points.shape[1]
    H, W = int(image_size[0]), int(image_size[1])
    pc = 1024
    P_pad = -(-P // pc) * pc
    p_pl = jnp.swapaxes(points, 1, 2)                        # (B, 3, P)
    l_pl = jnp.swapaxes(isigmas.reshape(B, P, 9), 1, 2)      # (B, 9, P)
    if P_pad > P:
        pad = ((0, 0), (0, 0), (0, P_pad - P))
        p_pl = jnp.pad(p_pl, pad)
        # padding Gaussians get identity Lambda (det != 0; keys are
        # invalidated by the idx < P gate regardless)
        l_pl = jnp.pad(l_pl, pad)
        eye = jnp.asarray([1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0])[None, :, None]
        mask_pad = (
            jnp.arange(P_pad, dtype=jnp.int32)[None, None, :] >= P
        )
        l_pl = jnp.where(mask_pad, eye, l_pl)
    cam = jnp.concatenate([
        R.reshape(B, 9), focal[:, 0:1], focal[:, 1:2],
        principal[:, 0:1], principal[:, 1:2],
        jnp.zeros((B, 3), R.dtype),
    ], axis=1).astype(jnp.float32)

    nb = B * nst
    big = nb * S * 16
    kernel = functools.partial(
        _emit_kernel, nlt=float(-math.log(thr)), fb=float(bin_size),
        H=H, W=W, BH2=int(BH2), BW2=int(BW2), nst=int(nst), S=int(S),
        P=int(P), pc=pc, big=int(big), win=int(win),
    )
    n_pc = P_pad // pc
    keys, aux = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_pc),
            in_specs=[
                pl.BlockSpec((1, 3, pc), lambda b, c, cam: (b, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, pc), lambda b, c, cam: (b, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, win * win, pc),
                             lambda b, c, cam: (b, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, pc), lambda b, c, cam: (b, 0, c),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, win * win, P_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, P_pad), jnp.float32),
        ],
        interpret=interpret,
    )(cam, p_pl, l_pl)
    keys = jnp.swapaxes(keys, 1, 2)[:, :P, :]                # (B, P, 4)
    u, v, rx, ry, z, ovf = (aux[:, i, :P] for i in range(6))
    return keys, u, v, rx, ry, (ovf > 0.5)
