"""Multi-view inverse rendering (BASELINE config 5 at spec, shrunken).

Joint recovery of albedo + emitter radiance + per-view camera pose from M
views of one scene — the full-size version is benchmarks/run_baselines.py
config5; this is the same harness at test scale.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qt_raytracer_tpu import RenderConfig
from qt_raytracer_tpu.core.camera import make_camera
from qt_raytracer_tpu.core.scene import SceneBuilder
from qt_raytracer_tpu.diff.inverse import mean_image
from qt_raytracer_tpu.diff.multiview import (make_multiview_train_step,
                                             orbit_cameras, render_targets,
                                             translate_camera)

KEY = jax.random.PRNGKey(11)


def _lit_scene(pad_to=8):
    """Small enclosed scene with an emissive light: floor + ball + emitter."""
    b = SceneBuilder()
    b.lambertian((0.0, -100.5, -1.0), 100.0, (0.6, 0.6, 0.6))
    b.lambertian((0.0, 0.0, -1.5), 0.5, (0.75, 0.25, 0.2))
    b.emissive((0.0, 1.6, -1.5), 0.4, (9.0, 9.0, 9.0))
    return b.build(pad_to=pad_to)


def _base_camera(aspect):
    return make_camera(lookfrom=(0.0, 0.4, 1.2), lookat=(0.0, 0.0, -1.5),
                       vup=(0, 1, 0), vfov=55.0, aspect_ratio=aspect,
                       aperture=0.0, focus_dist=1.0)


def test_render_targets_matches_mean_image():
    # Progressive target accumulation == one batch render at equal spp/key
    # (the ProgressiveRenderer invariant, through the multiview helper).
    cfg = RenderConfig(width=32, height=24, spp=6, max_depth=3, rng="hash",
                       nee=True)
    scene = _lit_scene()
    cams = orbit_cameras(_base_camera(cfg.aspect_ratio), [(0, 0, 0)])
    tgt = render_targets(scene, cams, cfg, seed=5, spp_per_call=2)
    ref = mean_image(scene, cams[0], cfg, jax.random.PRNGKey(5))
    # Same per-sample radiances; partial-sum association differs (progressive
    # adds batch sums), so equality is to f32 reassociation tolerance — the
    # same contract as tests/test_app.py::test_progressive_equals_batch.
    np.testing.assert_allclose(np.asarray(tgt[0]), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("edge_aware", [False, True])
def test_multiview_joint_recovery(edge_aware):
    # Perturb albedo + emission (+ per-view pose in edge-aware mode); the
    # optimization must reduce every trained param-group error (full
    # convergence is the benchmark's job — this asserts the gradients point
    # the right way through the shared-scene / per-view-pose structure).
    #
    # Pose is trained ONLY in edge-aware mode: plain pathwise camera
    # gradients carry no silhouette term, so adam (which normalizes the
    # tiny noisy interior gradient to full-size steps) random-walks the
    # pose and drags the scene params with it — measured, and exactly the
    # failure edge-aware gradients exist to fix (diff/edge.py).
    # The step key is FIXED across iterations: the detached-decision
    # estimator matches FD on a fixed key, and re-sampling per step turns
    # the L2 of a noisy forward into a variance term that biases emitters
    # DOWN (dimming the light reduces render variance) — measured: emission
    # 5 -> 7.4 -> 0.7 with per-step keys vs 5 -> 8.9 (target 9) fixed.
    cfg = RenderConfig(width=48, height=32, spp=2, max_depth=3, rng="hash",
                       nee=True, samples_per_batch=1)
    scene = _lit_scene()
    base = _base_camera(cfg.aspect_ratio)
    true_cams = orbit_cameras(base, [(0, 0, 0), (0.3, 0.0, 0.0),
                                     (0.0, 0.2, 0.1)])
    targets = render_targets(scene, true_cams, cfg, seed=3, spp_per_call=2)

    wrong_scene = dc.replace(
        scene,
        albedo=scene.albedo.at[1].set(jnp.array([0.2, 0.7, 0.7])),
        emission=scene.emission.at[2].set(jnp.array([5.0, 5.0, 5.0])))
    labels = {"scene": {"albedo": "scene", "emission": "emission"}}
    lrs = {"scene": optax.adam(4e-2), "emission": optax.adam(0.3)}
    if edge_aware:
        pose_err0 = jnp.array([0.12, -0.08, 0.1])
        start_cams = tuple(translate_camera(c, pose_err0)
                           for c in true_cams)
        labels["camera"] = {"translate": "camera"}
        lrs["camera"] = optax.adam(3e-2)
    else:
        start_cams = true_cams

    opt = optax.multi_transform(lrs, labels)
    init_state, step_fn, rebuild_scene, rebuild_cams = \
        make_multiview_train_step(wrong_scene, start_cams, cfg, opt,
                                  trainable=("albedo", "emission"),
                                  train_camera="pose" if edge_aware else False,
                                  edge_aware=edge_aware)
    state = init_state()
    steps = 60 if edge_aware else 30
    for it in range(steps):
        state, loss = step_fn(state, targets, KEY)

    rec = rebuild_scene(state.params["scene"])
    alb_err0 = float(jnp.abs(wrong_scene.albedo[1] - scene.albedo[1]).max())
    alb_err = float(jnp.abs(rec.albedo[1] - scene.albedo[1]).max())
    emi_err0 = float(jnp.abs(wrong_scene.emission[2] - scene.emission[2]).max())
    emi_err = float(jnp.abs(rec.emission[2] - scene.emission[2]).max())
    assert alb_err < 0.6 * alb_err0, (alb_err0, alb_err)
    assert emi_err < 0.6 * emi_err0, (emi_err0, emi_err)

    if edge_aware:
        # Pose error must shrink for EVERY view (edge gradients drive it).
        t = np.asarray(state.params["camera"]["translate"])
        err0 = float(np.abs(np.asarray(pose_err0)).max())
        err = np.abs(t + np.asarray(pose_err0)).max(axis=1)
        assert (err < err0).all(), (err, err0)
