"""Model-family tests: pose render-and-compare and the shape fitter."""
import numpy as np
import pytest

import jax.numpy as jnp

from voge_tpu.cameras import look_at_view_transform
from voge_tpu.converter import Cuboid
from voge_tpu.models import PoseHypothesisScorer, ShapeFitter, refine_pose, pose_matrices


@pytest.fixture(scope="module")
def scene():
    g = Cuboid.cuboid_gauss((-1, 1), (-0.5, 0.5), (-0.8, 0.8), 300,
                            percentage=0.6, as_obj=True)
    colors = (np.asarray(g.verts) + 1) / 2.5
    return g, jnp.asarray(colors.astype(np.float32))


def test_pose_scoring_prefers_true_pose(scene):
    g, colors = scene
    scorer = PoseHypothesisScorer(
        g.verts, g.sigmas, colors, focal=80.0, principal=(32, 32),
        image_size=(64, 64), max_assign=10, chunk=8,
    )
    true = (4.0, 0.3, 0.9, 0.0)
    R, T = pose_matrices(*[jnp.asarray([v]) for v in true])
    target, _ = scorer._render_features(R, T)

    # hypothesis grid around (and including) the truth
    azims = np.linspace(-1.5, 1.5, 11)
    Rh, Th = pose_matrices(
        jnp.full((11,), 4.0), jnp.full((11,), 0.3), jnp.asarray(azims),
        jnp.zeros(11),
    )
    scores = np.asarray(scorer.score(Rh, Th, target[0]))
    best = azims[int(scores.argmax())]
    assert abs(best - 0.9) < 0.31, (best, scores)


def test_pose_refinement_improves(scene):
    g, colors = scene
    scorer = PoseHypothesisScorer(
        g.verts, g.sigmas, colors, focal=80.0, principal=(32, 32),
        image_size=(64, 64), max_assign=10,
    )
    true = (4.0, 0.3, 0.9, 0.0)
    R, T = pose_matrices(*[jnp.asarray([v]) for v in true])
    target, _ = scorer._render_features(R, T)

    init = (4.0, 0.25, 0.7, 0.0)
    Ri, Ti = pose_matrices(*[jnp.asarray([v]) for v in init])
    s0 = float(scorer.score(Ri, Ti, target[0])[0])
    params, s1 = refine_pose(scorer, target[0], init, steps=40, lr=0.01)
    assert s1 > s0
    assert abs(float(params["azim"]) - 0.9) < abs(init[2] - 0.9)


def test_shape_fitter_reduces_loss(scene):
    g, colors = scene
    R, T = look_at_view_transform(
        dist=[4.0] * 4, elev=[0, 10, 20, 30], azim=[0, 90, 180, 270]
    )
    fitter_target = ShapeFitter(
        params={}, fixed=dict(verts=g.verts, sigmas=g.sigmas, colors=colors),
        image_size=(48, 48), focal=(60, 60), principal=(24, 24),
        max_assign=8,
    )
    t_rgb, t_sil = fitter_target.render(R, T)

    import optax

    fitter = ShapeFitter(
        params=dict(verts=g.verts * 1.15 + 0.05, colors=colors * 0 + 0.5),
        fixed=dict(sigmas=g.sigmas),
        image_size=(48, 48), focal=(60, 60), principal=(24, 24),
        max_assign=8, optimizer=optax.adam(0.01),
    )
    l0 = fitter.step(R, T, t_rgb, t_sil)
    l1 = fitter.fit(R, T, t_rgb, t_sil, iters=15)
    assert l1 < l0


def test_shape_fitter_sharded_runs(scene):
    from voge_tpu.parallel import make_mesh
    import optax

    g, colors = scene
    N = g.verts.shape[0]
    Np = (N + 7) // 8 * 8
    verts = jnp.pad(g.verts, ((0, Np - N), (0, 0)), constant_values=50.0)
    sigmas = jnp.pad(g.sigmas, ((0, Np - N),), constant_values=1.0)
    colors_p = jnp.pad(colors, ((0, Np - N), (0, 0)))
    R, T = look_at_view_transform(dist=[4.0] * 2, elev=[0, 10], azim=[0, 90])

    mesh = make_mesh(("data", "model"), (2, 4))
    fitter = ShapeFitter(
        params=dict(verts=verts, colors=colors_p),
        fixed=dict(sigmas=sigmas),
        image_size=(32, 32), focal=(40, 40), principal=(16, 16),
        max_assign=6, optimizer=optax.adam(0.01), mesh=mesh,
    )
    t_rgb, t_sil = fitter.render(R, T)
    loss = fitter.step(R, T, t_rgb * 0.9, t_sil)
    assert np.isfinite(loss)
