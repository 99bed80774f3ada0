"""The five BASELINE.json benchmark configs as one reproducible script.

Each config prints one JSON line (same schema as bench.py). Run:
    python benchmarks/run_baselines.py            # all configs on default device
    python benchmarks/run_baselines.py --configs 1 4
    python benchmarks/run_baselines.py --scale 0.25   # shrink resolutions (CI)

Configs (BASELINE.md):
  1. three-sphere + ground diffuse, 256x256, 16 spp, fixed seed
     (also validates forward image vs the float64 oracle at reduced size)
  2. Cornell box + emissive light + NEE, 512x512, 64 spp
  3. glossy/dielectric + depth-of-field, 512x512, 24 spp
  4. ~100k-triangle terrain mesh with BVH clusters, 1920x1080, 1 spp
  5. inverse rendering: jointly recover albedo + emitter radiance + per-view
     camera pose from multi-view renders (edge-aware silhouette gradients,
     sharded over ("sp","px") when >1 device is visible — see config5's
     docstring)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from qt_raytracer_tpu.runtime.compile_cache import enable_compilation_cache

ORACLE_FULL = False


def _bench_render(name, scene, cam, cfg, iters=3):
    import jax.numpy as jnp

    from qt_raytracer_tpu.core.render import render_linear

    # Sync via a dependent-scalar fetch, not block_until_ready(image): the
    # axon tunnel materializes blocked buffers on the host (see bench.py).
    sync = lambda img: float(jnp.sum(img))
    key = jax.random.PRNGKey(0)
    keys = [jax.block_until_ready(jax.random.fold_in(key, it))
            for it in range(iters)]
    out = render_linear(scene, cam, cfg, key)
    sync(out)
    t0 = time.perf_counter()
    for k in keys:
        out = render_linear(scene, cam, cfg, k)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    ms = cfg.width * cfg.height * cfg.spp / dt / 1e6
    print(json.dumps({
        "config": name, "width": cfg.width, "height": cfg.height,
        "spp": cfg.spp, "depth": cfg.max_depth, "nee": cfg.nee,
        "elapsed_s": round(dt, 4), "msamples_per_s": round(ms, 3),
        "backend": jax.default_backend(),
    }))
    return out


def config1(scale):
    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.models import scenes

    side = max(int(256 * scale), 16)
    cfg = RenderConfig(width=side, height=side, spp=16, max_depth=10,
                       rng="hash", intersector="fused")
    scene, cam = scenes.get_scene("three_sphere", 1.0)
    _bench_render("1_three_sphere_diffuse", scene, cam, cfg)

    # Oracle validation. Default: tiny crop against the scalar oracle.
    # --oracle-full: FULL-SIZE f64 validation against the vectorized oracle
    # (testing/oracle_vec.py) — the north-star "forward image allclose at
    # equal spp/seed" row at real resolution.
    from qt_raytracer_tpu.core.render import render_linear
    from qt_raytracer_tpu.testing import oracle
    vcfg = RenderConfig(width=16, height=16, spp=2, max_depth=4, rng="hash")
    key = jax.random.PRNGKey(0)
    got = np.asarray(render_linear(scene, cam, vcfg, key), np.float64) / 2
    want = oracle.render_oracle_linear(scene, cam, vcfg, key) / 2
    # Strict on the bulk, budgeted on boundary paths: an f32 render can
    # STRUCTURALLY diverge from the f64 oracle on measure-zero grazing
    # paths (measured on v5e: pixel (7,0) here — the fused kernel's
    # bounce-1 hit point differs from the XLA refine by 1 ulp under
    # Mosaic's FMA contraction, flipping a grazing metal hit/miss at
    # bounce 2; present since round 2, same class the full-size checks
    # budget with mismatch_fraction < 0.04). A real estimator bug shifts
    # MOST pixels, so <= 2/256 flips keeps full regression power.
    # Per-CHANNEL criterion (abs floor 2e-3 on dim channels, rel 2e-3 on
    # bright) so a bright channel can't mask a dim-channel error.
    per = (np.abs(got - want) / (np.abs(want) + 1.0)).max(axis=-1)
    flips = int((per > 2e-3).sum())
    print(json.dumps({"config": "1_oracle_allclose", "passed": flips <= 2,
                      "boundary_flips": flips, "pixels": per.size,
                      "bulk_max_rel": round(float(np.sort(per.ravel())[-3]),
                                            6)}))
    if ORACLE_FULL:
        from qt_raytracer_tpu.testing.oracle_vec import render_oracle_vec
        fcfg = RenderConfig(width=side, height=side, spp=min(cfg.spp, 8),
                            max_depth=cfg.max_depth, rng="hash")
        img = np.asarray(render_linear(scene, cam, fcfg, key), np.float64)
        ref = render_oracle_vec(scene, cam, fcfg, key)
        per = (np.abs(img - ref) / (np.abs(ref) + 1.0)).max(axis=-1)
        mism = float((per > 2e-3).mean())
        print(json.dumps({
            "config": "1_oracle_full", "width": fcfg.width,
            "spp": fcfg.spp, "mismatch_fraction": round(mism, 5),
            "passed": bool(mism < 0.04)}))


def config2(scale):
    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.models import scenes

    side = max(int(512 * scale), 16)
    # TRUE Cornell box: quad walls + emissive ceiling QUAD (area light),
    # NEE with MIS over sphere + triangle lights. The mesh world routes the
    # intersector to the pallas mesh kernel automatically.
    cfg = RenderConfig(width=side, height=side, spp=64, max_depth=10,
                       nee=True, rng="hash", samples_per_batch=4)
    scene, cam = scenes.get_scene("cornell_mesh", 1.0)
    _bench_render("2_cornell_area_light_nee_mis", scene, cam, cfg)
    if ORACLE_FULL:
        # Full-size f64 validation of the NEE + mesh transport against the
        # vectorized oracle (the north-star allclose row for config 2; also
        # asserted in CI by tests/test_oracle_vec.py::test_oracle_full_*).
        from qt_raytracer_tpu.core.render import render_linear
        from qt_raytracer_tpu.testing.oracle_vec import render_oracle_vec
        key = jax.random.PRNGKey(0)
        fcfg = RenderConfig(width=side, height=side, spp=4,
                            max_depth=cfg.max_depth, nee=True, rng="hash")
        img = np.asarray(render_linear(scene, cam, fcfg, key), np.float64)
        ref = render_oracle_vec(scene, cam, fcfg, key)
        per = (np.abs(img - ref) / (np.abs(ref) + 1.0)).max(axis=-1)
        mism = float((per > 2e-3).mean())
        print(json.dumps({
            "config": "2_oracle_full", "width": fcfg.width,
            "spp": fcfg.spp, "mismatch_fraction": round(mism, 5),
            "passed": bool(mism < 0.04)}))


def config3(scale):
    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.models import scenes

    side = max(int(512 * scale), 16)
    cfg = RenderConfig(width=side, height=side, spp=24, max_depth=10,
                       rng="hash", samples_per_batch=4,
                       intersector="fused")
    scene, cam = scenes.get_scene("glossy_dof", 1.0)
    _bench_render("3_glossy_dof", scene, cam, cfg)


def config4(scale):
    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.models import meshes

    w, h = max(int(1920 * scale), 64), max(int(1080 * scale), 36)
    cfg = RenderConfig(width=w, height=h, spp=1, max_depth=5, rng="hash")
    world = meshes.terrain_world()
    cam = meshes.terrain_camera(cfg.aspect_ratio)
    _bench_render("4_terrain_100k_tris", world, cam, cfg)


def _at_spec(w, h, views):
    """BASELINE configs[4] literal spec: 1080p multi-view renders."""
    return bool(w == 1920 and h == 1080 and views >= 2)


def _maybe_resume(state, checkpoint, resume, tag):
    """Restore a TrainState from an orbax checkpoint dir if present.

    Returns (state, start_step). The checkpoint carries params + optimizer
    moments + step (diff/inverse.save_train_state), so a resumed run
    continues the EXACT trajectory: the step key is fixed across
    iterations, so step k's render is identical whichever session runs it.
    """
    import pathlib as _pl

    from qt_raytracer_tpu.diff.inverse import load_train_state

    if checkpoint and resume and _pl.Path(checkpoint).exists():
        state = load_train_state(checkpoint, state)
        start = int(state.step)
        print(f"# {tag} resumed from step {start} ({checkpoint})",
              file=sys.stderr, flush=True)
        return state, start
    return state, 0


def config5(scale, steps=60, albedo_lr=0.03, views=4,
            same_key_targets=False, checkpoint=None, resume=False,
            ckpt_every=20, lr_scale=1.0, reinit_opt=False,
            reinit_at=-1, loss_mode="l2"):
    """BASELINE configs[4] at its LITERAL spec: recover albedo + EMITTER
    radiance + per-view CAMERA pose by gradient descent on multi-view
    renders (M=4 views, 1920x1080 at scale 1), edge-aware silhouette
    gradients, sharded over ("sp","px") when >1 device is visible.
    Targets render progressively (render_targets) so no device call
    exceeds the axon ~15 s limit."""
    import dataclasses as dc

    import jax.numpy as jnp
    import optax

    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.diff.multiview import (make_multiview_train_step,
                                                 orbit_cameras,
                                                 render_targets,
                                                 translate_camera)
    from qt_raytracer_tpu.models import scenes
    from qt_raytracer_tpu.parallel.sharding import make_mesh

    w = max(int(1920 * scale), 64)
    h = max(int(1080 * scale), 36)
    cfg_train = RenderConfig(width=w, height=h, spp=2, max_depth=4,
                             rng="hash", nee=True, samples_per_batch=1,
                             edge_aware=True)
    cfg_target = dc.replace(cfg_train, spp=max(int(64 * min(scale, 1.0)), 8),
                            edge_aware=False)
    true_scene = scenes.cornell_box_spheres()
    base_cam = scenes.cornell_box_camera(cfg_train.aspect_ratio)
    true_cams = orbit_cameras(base_cam, [(0.0, 0.0, 0.0), (0.5, 0.0, 0.0),
                                         (-0.5, 0.1, 0.0),
                                         (0.0, 0.3, -0.3)][:views])
    t_targets = time.perf_counter()
    if same_key_targets:
        # Same-key targets at the TRAIN spp (the methodology of the
        # recovery tests): loss is EXACTLY 0 at the true parameters, so
        # there is neither a fixed-speckle noise-fit floor (measured
        # albedo plateau 0.13-0.14 against independent high-spp targets)
        # nor the variance penalty of per-step resampling.
        import jax.numpy as _jnp

        from qt_raytracer_tpu.diff.inverse import mean_image
        k0 = jax.random.PRNGKey(7)
        cfg_t = dc.replace(cfg_train, edge_aware=False)
        targets = _jnp.stack([
            mean_image(true_scene, c, cfg_t, jax.random.fold_in(k0, v))
            for v, c in enumerate(true_cams)])
    else:
        targets = render_targets(true_scene, true_cams, cfg_target, seed=7,
                                 spp_per_call=8)
    jax.block_until_ready(targets)
    print(f"# config5 targets rendered ({len(true_cams)} views, "
          f"{cfg_train.spp if same_key_targets else cfg_target.spp} spp, "
          f"same_key={same_key_targets}): "
          f"{time.perf_counter() - t_targets:.0f}s",
          file=sys.stderr, flush=True)

    # Perturbations: ball albedo, light radiance, per-view rigid pose.
    wrong = dc.replace(
        true_scene,
        albedo=true_scene.albedo.at[6].set(jnp.array([0.2, 0.6, 0.8])),
        emission=true_scene.emission.at[5].set(jnp.array([8.0, 8.0, 8.0])))
    pose_err = jnp.array([0.1, -0.07, 0.08])
    start_cams = tuple(translate_camera(c, pose_err) for c in true_cams)

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(sp=1)          # all devices on the pixel axis
    # lr_scale < 1 is the STAGE-2 decay: resume the params from a
    # converged-coarse checkpoint (--reinit-opt drops the stale adam
    # moments) and polish with every group's lr scaled down — the measured
    # stage-1 behavior near the optimum is lr-limited oscillation
    # (albedo/emission bouncing in a band at constant loss amplitude).
    opt = optax.multi_transform(
        {"scene": optax.adam(albedo_lr * lr_scale),
         "emission": optax.adam(0.6 * lr_scale),
         "camera": optax.adam(2.5e-2 * lr_scale)},
        {"scene": {"albedo": "scene", "emission": "emission"},
         "camera": {"translate": "camera"}})
    init_state, step_fn, rebuild_scene, _ = make_multiview_train_step(
        wrong, start_cams, cfg_train, opt,
        trainable=("albedo", "emission"), train_camera="pose",
        mesh=mesh, edge_aware=True, loss=loss_mode)
    # The step key is FIXED across iterations: the detached-decision
    # estimator matches FD of the same fixed-key render, and re-sampling
    # per step turns the L2 of a noisy forward into a variance penalty
    # that biases the emitter DOWN (see tests/test_multiview.py note).
    from qt_raytracer_tpu.diff.inverse import save_train_state

    def errs(st):
        rec = rebuild_scene(st.params["scene"])
        a = float(jnp.abs(rec.albedo[6] - true_scene.albedo[6]).max())
        e = float(jnp.abs(rec.emission[5] - true_scene.emission[5]).max())
        tr = np.asarray(st.params["camera"]["translate"])
        p = float(np.abs(tr + np.asarray(pose_err)).max(axis=1).max())
        return a, e, p

    key = jax.random.PRNGKey(7)
    state, start_step = _maybe_resume(init_state(), checkpoint, resume,
                                      "config5")
    if reinit_opt and start_step and (reinit_at < 0
                                      or start_step == reinit_at):
        state = state._replace(opt_state=opt.init(state.params))
        print("# config5 optimizer re-initialized (stage-2, lr_scale="
              f"{lr_scale})", file=sys.stderr, flush=True)
    loss, t0, timed0 = None, None, None
    t_c = time.perf_counter()
    while int(state.step) < steps:
        state, loss = step_fn(state, targets, key)
        if t0 is None:   # first in-session call pays (cached) compile
            jax.block_until_ready(state)
            print(f"# config5 first step (incl. compile): "
                  f"{time.perf_counter() - t_c:.0f}s",
                  file=sys.stderr, flush=True)
            t0, timed0 = time.perf_counter(), int(state.step)
        s = int(state.step)
        if s % 10 == 0:
            a, e, p = errs(state)
            print(f"# config5 step {s}/{steps} loss={float(loss):.5f} "
                  f"albedo={a:.4f} emission={e:.4f} pose={p:.4f}",
                  file=sys.stderr, flush=True)
        if checkpoint and s % ckpt_every == 0 and s < steps:
            save_train_state(checkpoint, state)
    jax.block_until_ready(state)
    n_timed = (int(state.step) - timed0) if t0 is not None else 0
    dt = (time.perf_counter() - t0) / n_timed if n_timed else 0.0
    if checkpoint and int(state.step) > start_step:
        save_train_state(checkpoint, state)

    alb_err, emi_err, pose_err_final = errs(state)
    print(json.dumps({
        "config": "5_inverse_multiview", "width": w, "height": h,
        "views": len(true_cams), "spp": cfg_train.spp,
        "loss": loss_mode,
        "at_spec": _at_spec(w, h, len(true_cams)),
        "edge_aware": True, "steps": int(state.step),
        "resumed_from_step": start_step,
        "step_s": round(dt, 4),
        "final_loss": round(float(loss), 6) if loss is not None else None,
        "albedo_max_err": round(alb_err, 4),
        "emission_max_err": round(emi_err, 4),
        "pose_err_start": round(float(np.abs(np.asarray(pose_err)).max()), 4),
        "pose_max_err": round(pose_err_final, 4),
        "backend": jax.default_backend(),
    }))


def config5_mesh(scale, steps=60, views=2, checkpoint=None, resume=False,
                 ckpt_every=20, lr_scale=1.0, reinit_opt=False,
                 reinit_at=-1, loss_mode="l2"):
    """Config-5 mesh-world recovery line: camera-pose recovery in the TRUE
    Cornell box (triangle walls + boxes + emissive area quad, NEE+MIS)
    from multi-view 1920x1080-at-scale-1 renders, edge-aware silhouette
    gradients through the Pallas mesh kernel's per-lane exclusion operands
    (the xla path OOMs at this size — docs/PERFORMANCE.md edge-step table).
    Pose is the trainable family here (the scene-field lines are covered at
    full joint scope by 5_inverse_multiview above).

    Execution shape: PER-VIEW device calls (make_multiview_train_step_perview)
    — one jitted value_and_grad per view with on-device grad accumulation,
    so each device call stays at single-view cost (~10.5 s at 1080p spp 2)
    under the axon ~15 s limit for ANY view count. The round-4 single-call
    scanned step capped the line at 1 view at spec resolution, where pose
    stalls in the single-view speckle-decorrelation plateau; view averaging
    conditions + denoises the pose gradient (the 4-view sphere line
    converges at 1080p for exactly this reason)."""
    import dataclasses as dc

    import jax.numpy as jnp
    import optax

    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.diff.multiview import (
        make_multiview_train_step_perview, orbit_cameras, translate_camera)
    from qt_raytracer_tpu.models import meshes
    from qt_raytracer_tpu.parallel.sharding import make_mesh

    w = max(int(1920 * scale), 64)
    h = max(int(1080 * scale), 36)
    cfg_train = RenderConfig(width=w, height=h, spp=2, max_depth=4,
                             rng="hash", nee=True, samples_per_batch=1,
                             edge_aware=True)
    cfg_target = dc.replace(cfg_train, edge_aware=False)
    world = meshes.cornell_box_world()
    base_cam = meshes.cornell_box_mesh_camera(cfg_train.aspect_ratio)
    true_cams = orbit_cameras(base_cam,
                              [(0.0, 0.0, 0.0), (0.4, 0.15, 0.0),
                               (-0.35, 0.2, 0.1)][:views])
    # SAME-KEY targets (the methodology of the passing recovery test,
    # tests/test_mesh_edge_gradients.py): the loss is exactly 0 at the
    # true pose, so the optimization landscape has no fixed-noise floor.
    # With independent-seed spp-32 targets the spp-2 fixed-key L2 sits at
    # a ~0.18 variance floor that drowns the pose signal (measured: pose
    # 0.1 -> 0.12 after 60 steps, loss flat).
    from qt_raytracer_tpu.diff.inverse import mean_image, save_train_state
    key = jax.random.PRNGKey(11)
    t_targets = time.perf_counter()
    if loss_mode == "dual":
        # Dual-buffer loss wants independent "capture" targets (the
        # same-key construction is an L2-specific control); rendered
        # progressively so each 1080p mesh call stays under the axon
        # limit. spp 8 keeps target noise below the pose signal.
        from qt_raytracer_tpu.diff.multiview import render_targets
        tcfg = dc.replace(cfg_target, spp=8)
        targets = render_targets(world, true_cams, tcfg, seed=23,
                                 spp_per_call=2)
    else:
        targets = jnp.stack([
            mean_image(world, c, cfg_target, jax.random.fold_in(key, v))
            for v, c in enumerate(true_cams)])
    jax.block_until_ready(targets)
    print(f"# config5_mesh targets rendered: "
          f"{time.perf_counter() - t_targets:.0f}s",
          file=sys.stderr, flush=True)

    pose_err = jnp.array([0.1, -0.07, 0.05])
    start_cams = tuple(translate_camera(c, pose_err) for c in true_cams)
    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(sp=1)
    # lr_scale / reinit_opt: the COARSE-TO-FINE schedule's fine stage —
    # the pose checkpoint is resolution-independent, so stage A converges
    # at reduced scale (the validated 518x291 basin) and stage B resumes
    # the same checkpoint at 1080p from inside the basin. At 1080p a
    # 0.1-unit offset is ~50 px of image shift: starting THERE, the
    # fixed-key L2 gradient is speckle-decorrelation noise and adam
    # random-walks (measured: 2-view 1080p pose 0.1 -> 0.17 in 30 steps).
    opt = optax.adam(2.5e-2 * lr_scale)
    init_state, step_fn, _, _ = make_multiview_train_step_perview(
        world, start_cams, cfg_train, opt,
        trainable=(), train_camera="pose", mesh=mesh, edge_aware=True,
        loss=loss_mode)
    key = jax.random.PRNGKey(11)
    state, start_step = _maybe_resume(init_state(), checkpoint, resume,
                                      "config5_mesh")
    if reinit_opt and start_step and (reinit_at < 0
                                      or start_step == reinit_at):
        state = state._replace(opt_state=opt.init(state.params))
        print(f"# config5_mesh optimizer re-initialized (lr_scale="
              f"{lr_scale})", file=sys.stderr, flush=True)
    loss, t0, timed0 = None, None, None
    t_c = time.perf_counter()
    while int(state.step) < steps:
        state, loss = step_fn(state, targets, key)
        if t0 is None:
            jax.block_until_ready(state)
            print(f"# config5_mesh first step (incl. compile): "
                  f"{time.perf_counter() - t_c:.0f}s",
                  file=sys.stderr, flush=True)
            t0, timed0 = time.perf_counter(), int(state.step)
        s = int(state.step)
        if s % 10 == 0:
            tr = np.asarray(state.params["camera"]["translate"])
            p = float(np.abs(tr + np.asarray(pose_err)).max(axis=1).max())
            print(f"# config5_mesh step {s}/{steps} "
                  f"loss={float(loss):.5f} pose={p:.4f}",
                  file=sys.stderr, flush=True)
        if checkpoint and s % ckpt_every == 0 and s < steps:
            save_train_state(checkpoint, state)
    jax.block_until_ready(state)
    n_timed = (int(state.step) - timed0) if t0 is not None else 0
    dt = (time.perf_counter() - t0) / n_timed if n_timed else 0.0
    if checkpoint and int(state.step) > start_step:
        save_train_state(checkpoint, state)
    tr = np.asarray(state.params["camera"]["translate"])
    pose_errs = np.abs(tr + np.asarray(pose_err)).max(axis=1)
    print(json.dumps({
        "config": "5_inverse_mesh_world", "width": w, "height": h,
        "views": len(true_cams), "spp": cfg_train.spp, "nee": True,
        "at_spec": _at_spec(w, h, len(true_cams)),
        "loss": loss_mode,
        "edge_aware": True, "steps": int(state.step),
        "resumed_from_step": start_step, "per_view_calls": True,
        "lr_scale": lr_scale,
        "step_s": round(dt, 4),
        "final_loss": round(float(loss), 6) if loss is not None else None,
        "pose_err_start": round(float(np.abs(np.asarray(pose_err)).max()), 4),
        "pose_max_err": round(float(pose_errs.max()), 4),
        "backend": jax.default_backend(),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", type=int,
                    default=[1, 2, 3, 4, 5])
    ap.add_argument("--scale", type=float, default=1.0,
                    help="resolution scale factor (CI smoke: 0.1)")
    ap.add_argument("--oracle-full", action="store_true",
                    help="config 1: full-size f64 validation against the "
                         "vectorized oracle (O(30s) numpy)")
    ap.add_argument("--steps", type=int, default=60,
                    help="config 5: optimizer steps (CI smoke: ~6)")
    ap.add_argument("--albedo-lr", type=float, default=0.03,
                    help="config 5: adam lr for the albedo group")
    ap.add_argument("--views", type=int, default=4,
                    help="config 5: number of views")
    ap.add_argument("--mesh-world", action="store_true",
                    help="config 5: also run the TRUE-Cornell mesh-world "
                         "pose-recovery line (5_inverse_mesh_world)")
    ap.add_argument("--same-key-targets", action="store_true",
                    help="config 5: targets rendered at the train spp "
                         "with the training keys (loss exactly 0 at "
                         "truth; kills the fixed-key noise-fit floor)")
    ap.add_argument("--mesh-world-only", action="store_true",
                    help="config 5: run ONLY the mesh-world line")
    ap.add_argument("--mesh-views", type=int, default=2,
                    help="config 5 mesh-world: number of views (per-view "
                         "device calls, so any count fits the call limit)")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="config 5: orbax checkpoint dir (absolute); the "
                         "train state is saved every --ckpt-every steps "
                         "and at the end (mesh-world line uses "
                         "<checkpoint>_mesh)")
    ap.add_argument("--resume", action="store_true",
                    help="config 5: resume from --checkpoint if it exists")
    ap.add_argument("--ckpt-every", type=int, default=20)
    ap.add_argument("--lr-scale", type=float, default=1.0,
                    help="config 5: scale every lr group (stage-2 decay)")
    ap.add_argument("--reinit-opt", action="store_true",
                    help="config 5: on resume, keep params but re-init "
                         "the optimizer (drop stale adam moments)")
    ap.add_argument("--reinit-at", type=int, default=-1,
                    help="only re-init when resuming from EXACTLY this "
                         "step (so stall-restarts mid-stage keep moments)")
    ap.add_argument("--loss", default="l2", choices=["l2", "dual"],
                    help="config 5: fixed-key L2 or the dual-buffer "
                         "debiased product loss (kills the noise-fit "
                         "albedo floor; diff/inverse.dual_image_loss)")
    args = ap.parse_args()
    enable_compilation_cache()
    global ORACLE_FULL
    ORACLE_FULL = args.oracle_full

    def c5(s):
        if not args.mesh_world_only:
            config5(s, steps=args.steps, albedo_lr=args.albedo_lr,
                    views=args.views,
                    same_key_targets=args.same_key_targets,
                    checkpoint=args.checkpoint, resume=args.resume,
                    ckpt_every=args.ckpt_every, lr_scale=args.lr_scale,
                    reinit_opt=args.reinit_opt, reinit_at=args.reinit_at,
                    loss_mode=args.loss)
        if args.mesh_world or args.mesh_world_only:
            ck = args.checkpoint + "_mesh" if args.checkpoint else None
            config5_mesh(s, steps=args.steps, views=args.mesh_views,
                         checkpoint=ck, resume=args.resume,
                         ckpt_every=args.ckpt_every,
                         lr_scale=args.lr_scale,
                         reinit_opt=args.reinit_opt,
                         reinit_at=args.reinit_at, loss_mode=args.loss)

    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: c5}
    for c in args.configs:
        fns[c](args.scale)


if __name__ == "__main__":
    main()
