"""Full-chain parity gate over the six BASELINE.md configs.

Runs the voge_tpu pipeline (on the ACTIVE jax backend — run once on the TPU
attachment for the Pallas production path and once under JAX_PLATFORMS=cpu
for the XLA fallback) against the literal float64 reference oracle
(tests/oracle_full.py), and writes PARITY.json with per-config:

  - ``flip_frac``: fraction of pixels whose top-K selection differs
    (knife-edge candidates at the f32 threshold; see
    tests/test_parity_full.py docstring for the methodology),
  - ``max_err_agree`` / ``max_err_flip``: max |pixel error| over
    agreeing / flipped pixels (white-background RGB + silhouette),
  - ``exact_f64_err``: ours-in-float64 vs oracle (CPU only) — the
    same-mathematical-function proof,
  - ``overflow_points``: candidates dropped by capacity caps (0 = exact),
  - ``grad_rel_verts`` / ``grad_rel_sigmas``: full-chain gradient parity
    (ours-f32 vs the torch-f64 oracle's autograd) per config, with the
    control columns ``ref32_grad_rel_*`` (the reference chain itself in
    f32 vs its own f64 autograd).  Gradients use each config's SCENE
    (Gaussians, sigmas, K — the numerically relevant part) on a frame
    capped at 128 px on the long side (focal/principal scaled along), the
    small-frame methodology of tests/test_parity_full.py:246-307: f64
    oracle autograd at the heavy configs' full frames is intractable
    (forward alone is 300-400 s; the autograd graph of the K=60/80
    insertion sort multiplies that).

Usage:  python tools/parity_gate.py [--skip-f64] [--skip-grads]
                                    [--configs a,b,...]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

# this environment's sitecustomize force-registers the TPU backend and
# overrides JAX_PLATFORMS; pin the platform through jax.config as well
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

REF_DATA = "/root/reference/demo/data"


def _load_reference():
    from ref_loader import _load_reference as load

    return load()


# ---------------------------------------------------------------------------
# the six BASELINE.md configs
# ---------------------------------------------------------------------------

def cfg_quickstart():
    """Readme.md:70-101: 1000-G cuboid, 256^2, K=20."""
    from voge_tpu.converter import Cuboid
    from voge_tpu.cameras import look_at_view_transform

    g = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-1, 1), 1000,
                            percentage=0.6, as_obj=True)
    verts = np.asarray(g.verts, np.float32)
    R, T = look_at_view_transform(dist=6, elev=10, azim=70)
    return dict(
        verts=verts, sigmas=np.asarray(g.sigmas, np.float32),
        colors=((verts + 1) / 3).astype(np.float32),
        R=np.asarray(R), T=np.asarray(T),
        focal=np.array([[300.0, 300.0]], np.float32),
        principal=np.array([[128.0, 128.0]], np.float32),
        H=256, W=256, K=20, mppb=None,
    )


def cfg_bunny():
    """demo/RenderBunny.py:27-44: bunny mesh, 256^2, K=40, focal 2000."""
    from voge_tpu.converter.io import load_off
    from voge_tpu.converter.converters import naive_vertices_converter
    from voge_tpu.converter.shapes import vertex_normals
    from voge_tpu.cameras import look_at_view_transform

    verts_, faces_ = load_off(os.path.join(REF_DATA, "bunny.off"))
    v, isig, _ = naive_vertices_converter(verts_, faces_, percentage=0.6)
    normals = vertex_normals(np.asarray(verts_), np.asarray(faces_))
    colors = (normals * 0.4 + 0.4).astype(np.float32)
    R, T = look_at_view_transform([6], [0], [10], degrees=True)
    return dict(
        verts=np.asarray(v, np.float32), sigmas=np.asarray(isig, np.float32),
        colors=colors, R=np.asarray(R), T=np.asarray(T),
        focal=np.array([[2000.0, 2000.0]], np.float32),
        principal=np.array([[128.0, 128.0]], np.float32),
        H=256, W=256, K=40, mppb=None,
    )


def cfg_pointcloud():
    """demo/RenderPointClouds.py class: fixed-radius pointcloud at 320^2.
    The reference's PittsburghBridge data is not in the repo; a synthetic
    30K cloud with the demo's radius scale stands in (same math path)."""
    from voge_tpu.converter.converters import fixed_pointcloud_converter
    from voge_tpu.cameras import look_at_view_transform

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(30000, 3)).astype(np.float32)
    verts, isig, _ = fixed_pointcloud_converter(pts, radius=0.01)
    rng2 = np.random.RandomState(1)
    colors = rng2.uniform(size=(verts.shape[0], 3)).astype(np.float32)
    R, T = look_at_view_transform(dist=4, elev=20, azim=30)
    return dict(
        verts=np.asarray(verts, np.float32),
        sigmas=np.asarray(isig, np.float32), colors=colors,
        R=np.asarray(R), T=np.asarray(T),
        focal=np.array([[400.0, 400.0]], np.float32),
        principal=np.array([[160.0, 160.0]], np.float32),
        H=320, W=320, K=20, mppb=None,
    )


def cfg_shapefitting():
    """demo/ShapeFitting.py:219-296: ico_sphere(4), 128^2, K=25, no-coarse."""
    from voge_tpu.converter.converters import naive_vertices_converter
    from voge_tpu.converter.shapes import ico_sphere
    from voge_tpu.cameras import look_at_view_transform

    v, f = ico_sphere(4)
    verts, isig, _ = naive_vertices_converter(v, f, percentage=0.5)
    colors = np.ones((verts.shape[0], 3), np.float32) * 0.5
    R, T = look_at_view_transform(dist=2.7, elev=10, azim=60)
    return dict(
        verts=np.asarray(verts, np.float32),
        sigmas=np.asarray(isig, np.float32), colors=colors,
        R=np.asarray(R), T=np.asarray(T),
        focal=np.array([[126.0, 126.0]], np.float32),
        principal=np.array([[64.0, 64.0]], np.float32),
        H=128, W=128, K=25, mppb=-1,
    )


def cfg_occlusion():
    """demo/ReasonOcclusion.py:52-118: two cuboids (~7K G), 400^2, K=60."""
    from voge_tpu.converter import Cuboid
    from voge_tpu.cameras import look_at_view_transform

    colors0 = np.array([[0, 0.2, 1], [0, 0.2, 1], [0, 1, 0.2],
                        [0, 1, 0.2], [0, 1, 1], [0, 1, 1]])
    v0, s0, c0 = Cuboid.cuboid_gauss((-0.8, 0.8), (-0.4, 0.4), (-0.6, 0.6),
                                     4000, colors=colors0, percentage=0.7)
    colors1 = np.array([[1, 0.2, 0], [1, 0.2, 0], [1, 1, 0],
                        [1, 1, 0], [0.2, 1, 0], [0.2, 1, 0]])
    v1, s1, c1 = Cuboid.cuboid_gauss((-1, 1), (-1, 1), (-0.3, 0.3),
                                     3000, colors=colors1, percentage=0.7)
    verts = np.concatenate([v0 + np.array([[0.5, 0, 1]], np.float32), v1])
    sigmas = np.concatenate([np.broadcast_to(s0, (v0.shape[0],)) if np.ndim(s0) == 0 else s0,
                             np.broadcast_to(s1, (v1.shape[0],)) if np.ndim(s1) == 0 else s1])
    colors = np.concatenate([c0, c1]).astype(np.float32)
    R, T = look_at_view_transform(dist=5, elev=10, azim=20)
    return dict(
        verts=verts.astype(np.float32), sigmas=np.asarray(sigmas, np.float32),
        colors=colors, R=np.asarray(R), T=np.asarray(T),
        focal=np.array([[300.0, 300.0]], np.float32),
        principal=np.array([[200.0, 200.0]], np.float32),
        H=400, W=400, K=60, mppb=1500,
    )


def cfg_texture():
    """demo/ExtractTexture.py:26-57: car CAD, 256x672, K=80 +
    sample_features from the annotated real image."""
    from voge_tpu.converter.io import load_off, pre_process_pascal
    from voge_tpu.converter.converters import naive_vertices_converter
    from voge_tpu.cameras import look_at_view_transform
    from voge_tpu.utils import rotation_theta
    import jax.numpy as jnp

    annos = np.load(os.path.join(REF_DATA, "car_annotation.npz"))
    verts_, faces_ = load_off(os.path.join(REF_DATA, "car.off"))
    verts_, faces_ = pre_process_pascal(verts_, faces_)
    v, isig, _ = naive_vertices_converter(verts_, faces_, percentage=0.5,
                                          max_sig_rate=2)
    theta = float(annos["theta"])
    azim = float(annos["azimuth"])
    elev = float(annos["elevation"])
    R, T = look_at_view_transform([3], [elev], [azim], degrees=False)
    R = np.einsum("bij,bjk->bik", np.asarray(R),
                  np.asarray(rotation_theta(jnp.asarray([theta]))))
    colors = np.ones((v.shape[0], 3), np.float32) * 0.5
    return dict(
        verts=np.asarray(v, np.float32), sigmas=np.asarray(isig, np.float32),
        colors=colors, R=R.astype(np.float32), T=np.asarray(T),
        focal=np.array([[1800.0, 1800.0]], np.float32),
        principal=np.array([[336.0, 128.0]], np.float32),
        H=256, W=672, K=80, mppb=None, sample_image="car_image.JPEG",
    )


CONFIGS = dict(
    quickstart=cfg_quickstart,
    bunny=cfg_bunny,
    pointcloud=cfg_pointcloud,
    shapefitting=cfg_shapefitting,
    occlusion=cfg_occlusion,
    texture=cfg_texture,
)


# ---------------------------------------------------------------------------
# gradient parity (small-frame methodology at each config's scene)
# ---------------------------------------------------------------------------

def grad_parity(cfg, ref, sig33, max_side=128):
    """Gradient parity of the full chain at this config's SCENE (same
    Gaussians/sigmas/K), frame capped at ``max_side`` px on the long side
    with focal/principal scaled along.  Returns the relative-error columns
    (ours-f32 and reference-f32, each vs the f64 oracle's autograd), with
    Gaussians touched by knife-edge selection flips excluded — their
    gradient paths legitimately differ when the selection flips
    (tests/test_parity_full.py:285-301)."""
    import jax
    import jax.numpy as jnp
    import torch

    from voge_tpu.renderer import (
        get_silhouette, render_pipeline, to_white_background,
    )
    from oracle_full import (
        reference_render, reference_silhouette, reference_white_background,
    )

    s = min(1.0, max_side / max(cfg["H"], cfg["W"]))
    H, W = int(round(cfg["H"] * s)), int(round(cfg["W"] * s))
    K = cfg["K"]
    P = cfg["verts"].shape[0]
    focal = cfg["focal"] * s
    principal = cfg["principal"] * s
    rng = np.random.RandomState(0)
    Wp = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    Ws = rng.uniform(size=(1, H, W)).astype(np.float32)

    t = lambda x, d=torch.float64: torch.tensor(np.asarray(x), dtype=d)

    # oracle first: exact per-bin counts give the no-truncation mppb
    fd0 = reference_render(
        ref, t(cfg["verts"]), t(sig33), t(cfg["R"]), t(cfg["T"]),
        t(focal), t(principal), (H, W), max_assign=K,
        max_point_per_bin=P if cfg["mppb"] != -1 else -1,
    )
    mppb = -1 if cfg["mppb"] == -1 else int(fd0["bin_counts"].max()) + 8

    def loss_j(v, s33):
        frag = render_pipeline(
            v, s33, jnp.asarray(cfg["R"]), jnp.asarray(cfg["T"]),
            jnp.asarray(focal), jnp.asarray(principal),
            image_size=(H, W), max_assign=K, max_point_per_bin=mppb,
        )
        img = to_white_background(frag, jnp.asarray(cfg["colors"]))
        sil = get_silhouette(frag)
        return (jnp.mean(img * jnp.asarray(Wp))
                + jnp.mean(sil * jnp.asarray(Ws))), frag

    (_, frag), (gv, gs) = jax.value_and_grad(
        loss_j, argnums=(0, 1), has_aux=True
    )(jnp.asarray(cfg["verts"]), jnp.asarray(sig33, jnp.float32))

    def torch_grads(dtype):
        vt = t(cfg["verts"], dtype).requires_grad_(True)
        st = t(sig33, dtype).requires_grad_(True)
        fd = reference_render(
            ref, vt, st, t(cfg["R"], dtype), t(cfg["T"], dtype),
            t(focal, dtype), t(principal, dtype), (H, W), max_assign=K,
            max_point_per_bin=P if cfg["mppb"] != -1 else -1, dtype=dtype,
        )
        img_o = reference_white_background(ref, fd, t(cfg["colors"], dtype))
        sil_o = reference_silhouette(fd)
        L = ((img_o * t(Wp, dtype)).mean() + (sil_o * t(Ws, dtype)).mean())
        L.backward()
        return fd, vt.grad.numpy(), st.grad.numpy()

    fd64, gv_o, gs_o = torch_grads(torch.float64)
    fd32, gv_r, gs_r = torch_grads(torch.float32)

    i_o = fd64["vert_index"].numpy()

    def keep_mask(idx_ours):
        flips = (idx_ours != i_o).any(axis=-1)
        touched = set()
        for b, yy, xx in np.argwhere(flips):
            for v in list(idx_ours[b, yy, xx]) + list(i_o[b, yy, xx]):
                if v >= 0:
                    touched.add(int(v) % P)
        keep = np.ones(P, bool)
        keep[list(touched)] = False
        return keep, float(flips.mean())

    keep_j, flip_j = keep_mask(np.asarray(frag.vert_index))
    keep_r, flip_r = keep_mask(fd32["vert_index"].numpy())

    def rel(a, b, keep):
        a = np.asarray(a, np.float64)[keep]
        b = np.asarray(b, np.float64)[keep]
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))

    return dict(
        grad_H=H, grad_W=W, grad_flip_frac=flip_j,
        grad_rel_verts=rel(gv, gv_o, keep_j),
        grad_rel_sigmas=rel(gs, gs_o, keep_j),
        ref32_grad_flip_frac=flip_r,
        ref32_grad_rel_verts=rel(gv_r, gv_o, keep_r),
        ref32_grad_rel_sigmas=rel(gs_r, gs_o, keep_r),
    )


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def run_config(name, cfg, ref, skip_f64=False, skip_grads=False):
    import jax
    import jax.numpy as jnp
    import torch

    from voge_tpu.aggregation import expend_sigma
    from voge_tpu.renderer import (
        get_overflow_points,
        get_silhouette,
        render_pipeline,
        to_white_background,
    )
    from oracle_full import (
        reference_render,
        reference_silhouette,
        reference_white_background,
    )

    H, W, K = cfg["H"], cfg["W"], cfg["K"]
    P = cfg["verts"].shape[0]
    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float64)
    sig33 = np.asarray(expend_sigma(jnp.asarray(cfg["sigmas"])))

    # Oracle first: its exact per-bin counts give the no-truncation mppb
    # (the reference overflow drop order is nondeterministic, so gate
    # configs must not truncate; see tests/test_parity_full.py).  Passing
    # mppb=P would make the CPU fallback's dense (bins, R, mppb) hit
    # tensors blow up; the max bin count is the tight exact bound.
    t0 = time.time()
    fd = reference_render(
        ref, t(cfg["verts"]), t(sig33), t(cfg["R"]), t(cfg["T"]),
        t(cfg["focal"]), t(cfg["principal"]), (H, W), max_assign=K,
        max_point_per_bin=P if cfg["mppb"] != -1 else -1,
    )
    img_o = reference_white_background(ref, fd, t(cfg["colors"])).numpy()
    sil_o = reference_silhouette(fd).numpy()
    oracle_s = time.time() - t0

    if cfg["mppb"] == -1:
        mppb = -1
    else:
        mppb = int(fd["bin_counts"].max()) + 8

    t0 = time.time()
    frag = render_pipeline(
        jnp.asarray(cfg["verts"]), jnp.asarray(cfg["sigmas"]),
        jnp.asarray(cfg["R"]), jnp.asarray(cfg["T"]),
        jnp.asarray(cfg["focal"]), jnp.asarray(cfg["principal"]),
        image_size=(H, W), max_assign=K, max_point_per_bin=mppb,
    )
    img = np.asarray(to_white_background(frag, jnp.asarray(cfg["colors"])))
    sil = np.asarray(get_silhouette(frag))
    ours_s = time.time() - t0

    i1 = np.asarray(frag.vert_index)
    i2 = fd["vert_index"].numpy()
    flips = (i1 != i2).any(axis=-1)
    d_img = np.abs(img - img_o)
    d_sil = np.abs(sil - sil_o)[..., None]
    agree = ~flips

    def _mx(d, m):
        d2 = d.reshape(m.shape + (-1,))
        return float(d2[m].max()) if m.any() else 0.0

    # f32 activation-error envelope: act = msm - msk^2/ksk cancels
    # catastrophically when msm is large (tiny sigmas); any f32
    # implementation (including the CUDA reference, ray_trace_voge.cu:
    # 188-193, same formula) carries |d act| ~ eps_f32 * msm, which flips
    # threshold tests and scales weight error by e^{|d act|}.
    Rn = np.asarray(cfg["R"], np.float64)[0]
    Tn = np.asarray(cfg["T"], np.float64)[0]
    C_cam = -Tn @ np.linalg.inv(Rn)
    mu = np.asarray(cfg["verts"], np.float64) - C_cam
    lam = 2.0 * np.asarray(sig33, np.float64)
    msm = np.einsum("ni,nij,nj->n", mu, lam, mu)
    act_scale = float(np.percentile(msm, 99))
    res = dict(
        backend=jax.default_backend(),
        n_gauss=int(P), H=H, W=W, K=K, mppb=int(mppb),
        f32_act_envelope=float(1.2e-7 * act_scale),
        flip_frac=float(flips.mean()),
        max_err_agree=float(max(_mx(d_img, agree), _mx(d_sil, agree))),
        max_err_flip=float(max(_mx(d_img, flips), _mx(d_sil, flips))),
        overflow_points=int(get_overflow_points(frag)),
        ours_s=round(ours_s, 2), oracle_s=round(oracle_s, 2),
    )

    # Control: the REFERENCE chain itself in float32 (its production dtype
    # — the CUDA kernels are all-f32, ray_trace_voge.cu:219-247) vs the
    # f64 truth.  If its flip fraction / pixel drift match ours, the f32
    # envelope is inherent to the chain at this config, not an artifact of
    # the TPU implementation; "<1e-4 vs the reference" is then bounded by
    # the reference's own run-to-run float noise, which these columns
    # quantify.
    tf = lambda x: torch.tensor(np.asarray(x), dtype=torch.float32)
    fd32 = reference_render(
        ref, tf(cfg["verts"]), tf(sig33), tf(cfg["R"]), tf(cfg["T"]),
        tf(cfg["focal"]), tf(cfg["principal"]), (H, W), max_assign=K,
        max_point_per_bin=P if cfg["mppb"] != -1 else -1,
        dtype=torch.float32,
    )
    img_r32 = reference_white_background(ref, fd32, tf(cfg["colors"])).numpy()
    sil_r32 = reference_silhouette(fd32).numpy()
    ir = fd32["vert_index"].numpy()
    rflips = (ir != i2).any(axis=-1)
    rd_img = np.abs(img_r32.astype(np.float64) - img_o)
    rd_sil = np.abs(sil_r32.astype(np.float64) - sil_o)[..., None]
    res.update(
        ref32_flip_frac=float(rflips.mean()),
        ref32_max_err_agree=float(
            max(_mx(rd_img, ~rflips), _mx(rd_sil, ~rflips))
        ),
        ref32_max_err_flip=float(max(_mx(rd_img, rflips), _mx(rd_sil, rflips))),
    )
    # ours-f32 vs reference-f32 head-to-head, on pixels where both agree
    # with the f64 selection (the only pixels where f32-vs-f32 comparison
    # is meaningful; flipped pixels differ by selection, bounded above).
    both = (~flips) & (~rflips)
    dd_img = np.abs(img.astype(np.float64) - img_r32)
    dd_sil = np.abs(sil.astype(np.float64) - sil_r32)[..., None]
    res["max_err_vs_ref32_agree"] = float(
        max(_mx(dd_img, both), _mx(dd_sil, both))
    )

    if "sample_image" in cfg:
        from PIL import Image
        from voge_tpu.sampler import sample_features
        from oracle_full import reference_sample_features

        im = np.asarray(
            Image.open(os.path.join(REF_DATA, cfg["sample_image"]))
        ).astype(np.float32)
        feat, wsum = sample_features(frag, jnp.asarray(im)[None])
        feat_o, wsum_o = reference_sample_features(fd, t(im[None]), P)
        tex = np.asarray(feat) / (1e-8 + np.asarray(wsum)[:, None]) / 255.0
        tex_o = (feat_o / (1e-8 + wsum_o[:, None])).numpy() / 255.0
        keep = np.asarray(wsum_o) > 1e-3
        res["max_err_texture"] = float(np.abs(tex - tex_o)[keep].max())

    if not skip_grads:
        res.update(grad_parity(cfg, ref, sig33))

    if not skip_f64 and jax.default_backend() == "cpu":
        with jax.enable_x64(True):
            frag64 = render_pipeline(
                jnp.asarray(cfg["verts"], jnp.float64),
                jnp.asarray(sig33, jnp.float64),
                jnp.asarray(cfg["R"], jnp.float64),
                jnp.asarray(cfg["T"], jnp.float64),
                jnp.asarray(cfg["focal"], jnp.float64),
                jnp.asarray(cfg["principal"], jnp.float64),
                image_size=(H, W), max_assign=K, max_point_per_bin=mppb,
            )
            img64 = np.asarray(
                to_white_background(frag64, jnp.asarray(cfg["colors"], jnp.float64))
            )
            idx64 = np.asarray(frag64.vert_index)
        res["exact_f64_err"] = float(np.abs(img64 - img_o).max())
        res["exact_f64_idx_match"] = bool((idx64 == i2).all())
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-f64", action="store_true")
    ap.add_argument("--skip-grads", action="store_true")
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--out", default="PARITY.json")
    args = ap.parse_args()

    ref = _load_reference()
    import jax

    out = {"backend": jax.default_backend(), "configs": {}}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out)
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
        out.setdefault("configs", {})
    for name in args.configs.split(","):
        print(f"=== {name}", flush=True)
        cfg = CONFIGS[name]()
        res = run_config(name, cfg, ref, skip_f64=args.skip_f64,
                         skip_grads=args.skip_grads)
        key = f"{name}@{res['backend']}"
        out["configs"][key] = res
        print(json.dumps({key: res}), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
