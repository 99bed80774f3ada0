"""Mesh-silhouette (triangle) edge-aware gradient tests — VERDICT r2 item 5:
the boundary estimator extended from sphere winners to triangle winners.

Geometry: one Lambertian quad (2 triangles) floating against the sky
gradient, fully inside frame — mean radiance is dominated by the quad's
visibility boundary, so plain pathwise gradients are ~0 while FD of the
same fixed-key render is large. The quad's interior DIAGONAL (the edge its
two triangles share) must contribute nothing: excluding the winner reveals
the neighbor triangle at the same depth, so L_fg − L_bg ≈ 0 there (the
estimator is self-selecting; diff/edge.py module docstring)."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qt_raytracer_tpu import RenderConfig
from qt_raytracer_tpu.accel.mesh import MeshBuilder
from qt_raytracer_tpu.core.camera import make_camera
from qt_raytracer_tpu.core.scene import SceneBuilder
from qt_raytracer_tpu.core.world import World
from qt_raytracer_tpu.diff.inverse import mean_image

CFG = RenderConfig(width=64, height=48, spp=16, max_depth=2)
CFG_EDGE = dc.replace(CFG, edge_aware=True)
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_caches():
    # The edge-aware World-gradient graphs here are the largest XLA:CPU
    # compiles in the suite; with ~40 modules of live executables already
    # JIT-loaded, LLVM segfaults/aborts INSIDE backend_compile (observed
    # deterministically at suite position ~41%, never standalone).
    # Dropping the accumulated executables first keeps the suite green at
    # the cost of recompiling this module's shared helpers.
    jax.clear_caches()
    yield


def _quad_world(dx: float = 0.0):
    """Unit quad at z=-3 (shifted +x by dx), one never-visible sphere."""
    m = MeshBuilder()
    m.add_quad((-0.5 + dx, -0.5, -3.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
               albedo=(0.8, 0.2, 0.2))
    b = SceneBuilder()
    b.lambertian((0.0, 0.0, 500.0), 1.0, (0.5, 0.5, 0.5))  # behind camera
    return World(spheres=b.build(pad_to=8), mesh=m.build())


def _camera():
    return make_camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vup=(0, 1, 0),
                       vfov=60.0, aspect_ratio=CFG.aspect_ratio,
                       aperture=0.0, focus_dist=1.0)


def _mean_rad(world, cam, cfg):
    return jnp.mean(mean_image(world, cam, cfg, KEY))


def test_edge_term_is_primal_zero_mesh():
    # Forward images bitwise unchanged in a mesh world.
    world, cam = _quad_world(), _camera()
    a = np.asarray(mean_image(world, cam, CFG, KEY))
    b = np.asarray(mean_image(world, cam, CFG_EDGE, KEY))
    np.testing.assert_array_equal(a, b)


def test_camera_translation_mesh_l2_gradient_matches_fd():
    # Camera x-translation through the L2 image loss (what training uses;
    # both swept edges contribute with the SAME sign, unlike the
    # mean-radiance functional where a fronto-parallel quad's image shifts
    # rigidly and opposing edges cancel to a noise-scale residual). Plain
    # pathwise is EXACTLY 0 here (diffuse quad radiance is view-position
    # independent); edge-aware must carry the whole FD signal.
    # Measured: fd 0.0502, edge 0.0299, plain 0.0.
    world, cam = _quad_world(), _camera()
    target = mean_image(world, cam, CFG, KEY)

    def loss(dx, cfg):
        delta = jnp.array([0.10 + dx, 0.0, 0.0])
        c = dc.replace(cam, origin=cam.origin + delta,
                       lower_left_corner=cam.lower_left_corner + delta)
        img = mean_image(world, c, cfg, KEY)
        return jnp.mean((img - target) ** 2)

    eps = 2e-2
    fd = (float(loss(eps, CFG)) - float(loss(-eps, CFG))) / (2 * eps)
    g_edge = float(jax.grad(lambda d: loss(d, CFG_EDGE))(0.0))
    g_plain = float(jax.grad(lambda d: loss(d, CFG))(0.0))
    assert abs(fd) > 1e-3, fd          # the loss really sees the boundary
    assert np.sign(g_edge) == np.sign(fd)
    assert abs(g_edge) > 0.25 * abs(fd), (g_edge, fd)
    assert abs(g_plain) < 0.05 * abs(fd), (g_plain, fd)
    np.testing.assert_allclose(g_edge, fd, rtol=1.0)


def test_mesh_translation_gradient_matches_fd():
    # Rigid mesh z-translation changes the quad's PROJECTED SIZE (a pure
    # coverage functional, no left/right cancellation). v0 + BVH boxes
    # shift together so FD renders stay exact; gradients flow through the
    # v0/e1/e2 gathers in g_tri. Measured: fd -0.0214, edge -0.0194.
    cam = _camera()

    def loss(dz, cfg):
        world = _quad_world()
        mesh = world.mesh
        delta = jnp.array([0.0, 0.0, dz])
        mesh = dc.replace(mesh, v0=mesh.v0 + delta,
                          bvh_min=mesh.bvh_min + delta,
                          bvh_max=mesh.bvh_max + delta)
        return _mean_rad(dc.replace(world, mesh=mesh), cam, cfg)

    eps = 4e-2
    fd = (float(loss(eps, CFG)) - float(loss(-eps, CFG))) / (2 * eps)
    g_edge = float(jax.grad(lambda d: loss(d, CFG_EDGE))(0.0))
    g_plain = float(jax.grad(lambda d: loss(d, CFG))(0.0))
    assert np.sign(g_edge) == np.sign(fd) and abs(g_edge) > 5 * abs(g_plain)
    np.testing.assert_allclose(g_edge, fd, rtol=0.3)


@pytest.mark.slow
def test_mesh_edge_gradient_on_kernel_path():
    # The kernel-backed edge path for mesh worlds (pallas selection with
    # per-lane triangle/sphere exclusion — what TPU runs; the xla [N,S]
    # sweep OOMs past ~512^2): FD-vs-autodiff of the SAME backend on the
    # quad's projected-size functional, small size (interpret kernels).
    cfg = dc.replace(CFG, width=40, height=32, spp=4,
                     intersector="pallas_interpret")
    cfg_edge = dc.replace(cfg, edge_aware=True)
    cam = _camera()

    def loss(dz, c):
        world = _quad_world()
        mesh = world.mesh
        delta = jnp.array([0.0, 0.0, dz])
        mesh = dc.replace(mesh, v0=mesh.v0 + delta,
                          bvh_min=mesh.bvh_min + delta,
                          bvh_max=mesh.bvh_max + delta)
        return _mean_rad(dc.replace(world, mesh=mesh), cam, c)

    eps = 5e-2
    fd = (float(loss(eps, cfg)) - float(loss(-eps, cfg))) / (2 * eps)
    g_edge = float(jax.grad(lambda d: loss(d, cfg_edge))(0.0))
    assert np.sign(g_edge) == np.sign(fd)
    np.testing.assert_allclose(g_edge, fd, rtol=0.5)


@pytest.mark.slow
def test_mesh_translation_gradient_bias_pinned_high_spp():
    # Bias-pinning case (round-4 VERDICT item 3): the triangle-family analog
    # of the sphere family's tight test (test_edge_gradients.py). Pure
    # coverage functional (projected size under rigid z-translation), where
    # FD is eps-stable (measured -0.0220+-0.0005 across eps 5e-3..4e-2 at
    # 256 spp, benchmarks/tri_edge_bias.py). Two assertions:
    #   order 2 (Richardson weight): W-independent, FD at rtol 0.1
    #     (measured -0.0217 at W=1, 256 spp);
    #   order 1 (default triangular weight): the measured LINEAR-in-W
    #     velocity-blur bias, pinned to its band — capture 80-95% of FD at
    #     W=1 on this 14-px quad (measured 85%; the bias scales as
    #     W / feature-px-size, so ~1-3% at production resolutions).
    # This attribution closed the round-3 "60% capture" question: kernel-
    # width blur plus an eps-UNSTABLE FD reference on the L2 composition
    # (FD there swings 0.039-0.050 over eps), not an estimator defect.
    from qt_raytracer_tpu.diff import edge as edge_mod

    cfg = dc.replace(CFG, spp=256)
    cfg_edge = dc.replace(cfg, edge_aware=True)
    cam = _camera()

    def loss(dz, c):
        world = _quad_world()
        mesh = world.mesh
        delta = jnp.array([0.0, 0.0, dz])
        mesh = dc.replace(mesh, v0=mesh.v0 + delta,
                          bvh_min=mesh.bvh_min + delta,
                          bvh_max=mesh.bvh_max + delta)
        return _mean_rad(dc.replace(world, mesh=mesh), cam, c)

    eps = 2e-2
    fd = (float(loss(eps, cfg)) - float(loss(-eps, cfg))) / (2 * eps)
    order0 = edge_mod.EDGE_KERNEL_ORDER
    try:
        edge_mod.EDGE_KERNEL_ORDER = 2
        jax.clear_caches()
        g2 = float(jax.grad(lambda d: loss(d, cfg_edge))(0.0))
        edge_mod.EDGE_KERNEL_ORDER = 1
        jax.clear_caches()
        g1 = float(jax.grad(lambda d: loss(d, cfg_edge))(0.0))
    finally:
        edge_mod.EDGE_KERNEL_ORDER = order0
    np.testing.assert_allclose(g2, fd, rtol=0.1)
    assert 0.80 * abs(fd) < abs(g1) < 0.95 * abs(fd), (g1, fd)
    assert np.sign(g1) == np.sign(fd)


@pytest.mark.slow
def test_camera_pose_recovery_cornell_mesh():
    # VERDICT r2 item 5 done-criterion: camera-pose recovery in the TRUE
    # Cornell box (mesh walls + boxes): a perturbed camera converges back
    # with edge-aware gradients at full lr.
    import optax

    from qt_raytracer_tpu.diff.inverse import make_train_step
    from qt_raytracer_tpu.models import meshes

    cfg = RenderConfig(width=48, height=32, spp=4, max_depth=2, nee=True)
    world = meshes.cornell_box_world()
    cam = meshes.cornell_box_mesh_camera(cfg.aspect_ratio)
    target = mean_image(world, cam, cfg, KEY)
    delta = jnp.array([0.12, -0.08, 0.0])
    start_cam = dc.replace(cam, origin=cam.origin + delta,
                           lower_left_corner=cam.lower_left_corner + delta)
    init_state, step_fn, _, rebuild_cam = make_train_step(
        world, start_cam, cfg, optax.adam(2.5e-2), trainable=(),
        train_camera="pose", edge_aware=True)
    state = init_state()
    # Measured trajectory (max |err| vs the true origin): start 0.12,
    # step 40 0.082 (an adam z-transient), step 80 0.014 — converged.
    for it in range(80):
        state, loss = step_fn(state, target, jax.random.fold_in(KEY, it + 1))
    rec = np.asarray(rebuild_cam(state.params).origin)
    err = np.abs(rec - np.asarray(cam.origin)).max()
    assert err < 0.05, (rec, np.asarray(cam.origin), err)
