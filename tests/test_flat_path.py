"""Flat-SoA fast path (fused hit kernel + integrator_flat) correctness.

The flat path is the SAME estimator on the SAME RNG stream as the [N,3]
integrator; the two differ only at FMA-contraction ulp level, which can flip
a stochastic branch for borderline samples (the f32-vs-f64 oracle comparison
has the identical property). So:
  - oracle goldens run on the flat path with the standard tolerances,
  - flat-vs-standard is compared statistically (mismatch fraction),
  - decomposition invariances (chunking, sample batching) must be BITWISE
    within the flat path, exactly as for the standard path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qt_raytracer_tpu import RenderConfig, render_linear
from qt_raytracer_tpu.core.intersect import intersect_spheres
from qt_raytracer_tpu.kernels.fused_hit import fused_hit_pallas, BIG
from qt_raytracer_tpu.models import scenes
from qt_raytracer_tpu.testing import oracle


def _cfg(**kw):
    kw.setdefault("intersector", "fused_interpret")
    return RenderConfig(**kw)


# ------------------------------------------------------- kernel field checks
def test_fused_kernel_matches_intersect_fields():
    scene, _ = scenes.get_scene("random", 16 / 9)
    key = jax.random.PRNGKey(3)
    n = 2048
    ko, kd = jax.random.split(key)
    o = jax.random.normal(ko, (n, 3)) * 3.0
    d = jax.random.normal(kd, (n, 3))
    alive = jnp.ones((n,), bool)
    h_std = intersect_spheres(scene, o, d, 1e-3, backend="pallas_interpret",
                              alive=alive)
    h = fused_hit_pallas(scene, o[:, 0], o[:, 1], o[:, 2],
                         d[:, 0], d[:, 1], d[:, 2], alive, 1e-3,
                         interpret=True)
    # Discrete global fields must agree exactly (same sweep, same
    # tie-breaks). Param/geometry outputs are compared on HIT lanes only:
    # the fused contract leaves them unspecified on miss lanes (all-miss
    # rows skip extraction; the XLA path returns sphere-0 params there).
    hit = np.asarray(h_std.hit)
    np.testing.assert_array_equal(np.asarray(h_std.prim_idx), h["idx"])
    np.testing.assert_array_equal(hit, np.asarray(h["t"]) < BIG)
    eq = lambda a, b: np.testing.assert_array_equal(
        np.asarray(a)[hit], np.asarray(b)[hit])
    eq(h_std.mat_type, h["mat"])
    eq(h_std.front_face, np.asarray(h["ff"]) > 0)
    # Winner parameters are extracted from the same packed table -> exact.
    eq(h_std.albedo[:, 0], h["ax"])
    eq(h_std.fuzz, h["fuzz"])
    eq(h_std.ior, h["ior"])
    eq(h_std.emission[:, 2], h["ez"])
    # Continuous fields: identical formulas, FMA-contraction ulp tolerance.
    np.testing.assert_allclose(np.asarray(h_std.t)[hit],
                               np.asarray(h["t"])[hit],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_std.normal[:, 1])[hit],
                               np.asarray(h["ny"])[hit],
                               rtol=2e-3, atol=2e-3)


def test_fused_kernel_shadow_only_matches_full():
    scene, _ = scenes.get_scene("cornell", 1.0)
    key = jax.random.PRNGKey(5)
    n = 1024
    ko, kd = jax.random.split(key)
    o = jax.random.normal(ko, (n, 3)) * 0.5
    d = jax.random.normal(kd, (n, 3))
    alive = jnp.ones((n,), bool)
    args = (scene, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            alive, 1e-3)
    full = fused_hit_pallas(*args, interpret=True)
    sh = fused_hit_pallas(*args, shadow_only=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(full["idx"]), sh["idx"])
    np.testing.assert_array_equal(
        np.asarray(full["t"]) < BIG, np.asarray(sh["t"]) < BIG)


def test_fused_kernel_dead_rows_report_miss():
    scene, _ = scenes.get_scene("three_sphere", 1.0)
    n = 2048
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    alive = jnp.zeros((n,), bool)
    h = fused_hit_pallas(scene, o[:, 0], o[:, 1], o[:, 2],
                         d[:, 0], d[:, 1], d[:, 2], alive, 1e-3,
                         interpret=True)
    assert bool(jnp.all(h["t"] >= BIG))
    assert bool(jnp.all(h["idx"] == 0))


# --------------------------------------------------------- oracle goldens
def _compare_oracle(scene_name, cfg, seed=0, atol=4e-3, rtol=4e-3,
                    max_mismatch=0.01):
    scene, cam = scenes.get_scene(scene_name, cfg.aspect_ratio, pad_to=None)
    key = jax.random.PRNGKey(seed)
    got = np.asarray(render_linear(scene, cam, cfg, key), np.float64)
    want = oracle.render_oracle_linear(scene, cam, cfg, key)
    got /= cfg.spp
    want /= cfg.spp
    mismatch = np.abs(got - want) > (atol + rtol * np.abs(want))
    assert mismatch.mean() <= max_mismatch, (
        f"mismatch fraction {mismatch.mean():.4f} > {max_mismatch}")


def test_flat_three_sphere_matches_oracle():
    _compare_oracle("three_sphere",
                    _cfg(width=16, height=12, spp=2, max_depth=4))


def test_flat_four_sphere_gpu_matches_oracle():
    _compare_oracle("four_sphere_gpu",
                    _cfg(width=16, height=12, spp=2, max_depth=4))


def test_flat_glossy_dof_matches_oracle():
    _compare_oracle("glossy_dof",
                    _cfg(width=16, height=12, spp=2, max_depth=6))


def test_flat_cornell_nee_matches_oracle():
    # 12x12x2spp is a small sample for branch-flip counting: at 24x24 the
    # flat path measures 0.8% mismatch (vs 1.3% for the standard path).
    _compare_oracle("cornell",
                    _cfg(width=12, height=12, spp=2, max_depth=5, nee=True),
                    max_mismatch=0.03)


def test_flat_cornell_nee_rr_hash_matches_oracle():
    _compare_oracle("cornell",
                    _cfg(width=12, height=12, spp=2, max_depth=6, nee=True,
                         rr_start=2, rng="hash"), max_mismatch=0.03)


# ------------------------------------------- flat vs standard (statistical)
@pytest.mark.parametrize("scene_name,nee,rr", [
    ("random", False, 0),
    ("cornell", True, 0),
    ("glossy_dof", False, 3),
])
def test_flat_matches_standard_statistically(scene_name, nee, rr):
    kw = dict(width=96, height=54, spp=4, max_depth=6, nee=nee,
              rr_start=rr, rng="hash")
    scene, cam = scenes.get_scene(scene_name, 96 / 54)
    key = jax.random.PRNGKey(7)
    a = np.asarray(render_linear(
        scene, cam, RenderConfig(intersector="pallas_interpret", **kw), key))
    b = np.asarray(render_linear(scene, cam, _cfg(**kw), key))
    d = np.abs(a - b)
    # Identical estimator; ulp-level branch flips relabel a small fraction
    # of paths. Mean image difference must be tiny and flips rare.
    assert d.mean() < 5e-3, d.mean()
    assert (d.max(-1) > 1e-3).mean() < 0.08


# ----------------------------------------------- decomposition invariances
@pytest.mark.slow
def test_flat_chunking_is_bitwise_invariant():
    scene, cam = scenes.get_scene("random", 80 / 45)
    key = jax.random.PRNGKey(1)
    kw = dict(width=80, height=45, spp=2, max_depth=4, rng="hash")
    ref = np.asarray(render_linear(scene, cam, _cfg(**kw), key))
    for chunk in (700, 1024, 1800):
        img = np.asarray(render_linear(
            scene, cam, _cfg(pixel_chunk=chunk, **kw), key))
        np.testing.assert_array_equal(ref, img)


def test_flat_sample_batching_is_bitwise_invariant():
    scene, cam = scenes.get_scene("glossy_dof", 1.0)
    key = jax.random.PRNGKey(2)
    kw = dict(width=32, height=32, spp=4, max_depth=4, rng="hash")
    ref = np.asarray(render_linear(scene, cam, _cfg(**kw), key))
    img = np.asarray(render_linear(
        scene, cam, _cfg(samples_per_batch=4, **kw), key))
    np.testing.assert_array_equal(ref, img)


# --------------------------------------------- flat MESH-WORLD path
@pytest.mark.parametrize("scene_name,nee", [
    ("icosphere", False),
    ("cornell_mesh", True),
])
@pytest.mark.slow
def test_flat_world_matches_standard_statistically(scene_name, nee):
    # trace_flat_world is the same estimator on the same stream as the
    # [N,3] World path; only FMA-contraction ulp flips differ (the same
    # contract as the sphere flat path above).
    kw = dict(width=48, height=48, spp=2, max_depth=5, nee=nee, rng="hash")
    scene, cam = scenes.get_scene(scene_name, 1.0)
    key = jax.random.PRNGKey(7)
    a = np.asarray(render_linear(
        scene, cam, RenderConfig(intersector="pallas_interpret", **kw), key))
    b = np.asarray(render_linear(scene, cam, _cfg(**kw), key))
    d = np.abs(a - b)
    assert d.mean() < 5e-3, d.mean()
    assert (d.max(-1) > 1e-3).mean() < 0.08


@pytest.mark.slow
def test_flat_world_cornell_mesh_matches_oracle():
    # (inline _compare_oracle: mesh scene builders take no pad_to kwarg)
    cfg = _cfg(width=12, height=12, spp=2, max_depth=4, nee=True)
    scene, cam = scenes.get_scene("cornell_mesh", cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)
    got = np.asarray(render_linear(scene, cam, cfg, key), np.float64) / 2
    want = oracle.render_oracle_linear(scene, cam, cfg, key) / 2
    mismatch = np.abs(got - want) > (4e-3 + 4e-3 * np.abs(want))
    assert mismatch.mean() <= 0.03, mismatch.mean()


@pytest.mark.slow
def test_flat_world_chunking_is_bitwise_invariant():
    scene, cam = scenes.get_scene("icosphere", 80 / 45)
    key = jax.random.PRNGKey(1)
    kw = dict(width=80, height=45, spp=1, max_depth=3, rng="hash")
    ref = np.asarray(render_linear(scene, cam, _cfg(**kw), key))
    img = np.asarray(render_linear(
        scene, cam, _cfg(pixel_chunk=1024, **kw), key))
    np.testing.assert_array_equal(ref, img)


def test_trace_flat_world_gradients_raise():
    from qt_raytracer_tpu.core.integrator_flat import trace_flat_world
    scene, cam = scenes.get_scene("icosphere", 1.0)
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((1024, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (1024, 1))
    keys = jnp.arange(1024, dtype=jnp.uint32)

    def f(albedo):
        import dataclasses as dc
        w = dc.replace(scene, mesh=dc.replace(scene.mesh, albedo=albedo))
        return jnp.sum(trace_flat_world(w, o, d, keys, 2, interpret=True))

    with pytest.raises(ValueError, match="forward-only"):
        jax.grad(f)(scene.mesh.albedo)


# ------------------------------------------------------------ forward-only
def test_trace_flat_gradients_raise():
    # The fused path detaches every hit quantity; differentiating through it
    # must raise (not silently return zero gradients). ADVICE r1 (medium).
    from qt_raytracer_tpu.core.integrator_flat import trace_flat
    scene, cam = scenes.get_scene("three_sphere", 1.0)
    o = jnp.zeros((8, 3)) + jnp.array([0.0, 2.0, 8.0])
    d = jnp.tile(jnp.array([[0.0, -0.1, -1.0]]), (8, 1))
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
        jnp.arange(8, dtype=jnp.uint32))

    def loss(albedo):
        import dataclasses
        sc = dataclasses.replace(scene, albedo=albedo)
        rad = trace_flat(sc, o, d, keys, 3, interpret=True)
        return jnp.sum(rad)

    with pytest.raises(ValueError, match="forward-only"):
        jax.grad(loss)(scene.albedo)


def test_make_train_step_pins_grad_capable_intersector():
    from qt_raytracer_tpu.diff.inverse import grad_capable_config
    assert grad_capable_config(
        RenderConfig(intersector="fused")).intersector == "fused_diff"
    assert grad_capable_config(
        RenderConfig(intersector="fused_interpret")).intersector == \
        "fused_diff_interpret"
    assert grad_capable_config(
        RenderConfig(intersector="xla")).intersector == "xla"


def test_fused_diff_forward_and_grads_match_xla():
    # VERDICT r1 item 6: the gradient-capable flat path (fused kernel for
    # selection + XLA re-derive for values) must reproduce the xla path's
    # forward AND gradients (selection identical, values mirror the same
    # refinement; measured maxdiff ~1e-10 on albedo grads).
    import dataclasses as dc
    from qt_raytracer_tpu.diff.inverse import mean_image
    scene, cam = scenes.get_scene("three_sphere", 1.5)
    cfg_x = RenderConfig(width=24, height=16, spp=2, max_depth=4,
                         intersector="xla")
    cfg_f = dc.replace(cfg_x, intersector="fused_diff_interpret")
    key = jax.random.PRNGKey(0)
    a = np.asarray(mean_image(scene, cam, cfg_x, key))
    b = np.asarray(mean_image(scene, cam, cfg_f, key))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    target = mean_image(scene, cam, cfg_x, jax.random.PRNGKey(9))

    def loss(albedo, cfg):
        sc = dc.replace(scene, albedo=albedo)
        return jnp.mean((mean_image(sc, cam, cfg, key) - target) ** 2)

    gx = np.asarray(jax.grad(lambda al: loss(al, cfg_x))(scene.albedo))
    gf = np.asarray(jax.grad(lambda al: loss(al, cfg_f))(scene.albedo))
    np.testing.assert_allclose(gx, gf, atol=1e-7, rtol=1e-4)


@pytest.mark.slow
def test_compact_mode_is_bitwise_and_grad_identical():
    # Alive-compaction (trace_flat(compact=True)) permutes lanes per bounce
    # but every per-ray value rides the permutation: images and gradients
    # must be BITWISE identical to compact=False. (Default is off on the
    # sphere path — measured relayout cost, see docs/PERFORMANCE.md — but
    # the switch must stay correct for re-measurement.)
    import dataclasses as dc
    from qt_raytracer_tpu.core import camera as cam_mod
    from qt_raytracer_tpu.core import sampling
    from qt_raytracer_tpu.core.integrator_flat import trace_flat
    from qt_raytracer_tpu.core.render import pixel_grid

    cfg = RenderConfig(width=48, height=32, spp=1, max_depth=5)
    scene, cam = scenes.get_scene("random", cfg.aspect_ratio)
    i, j, pix = pixel_grid(cfg)
    pk = sampling.pixel_states(jax.random.PRNGKey(0), pix, cfg.rng)
    sk = sampling.sample_keys(pk, jnp.uint32(0))
    gen = sampling.stream_uniforms(sk, sampling.STREAM_GEN,
                                   sampling.UNIFORMS_GEN)
    s = (i + gen[:, 0]) / (cfg.width - 1)
    t = (j + gen[:, 1]) / (cfg.height - 1)
    o, d = cam_mod.get_rays(cam, s, t, gen[:, 2], gen[:, 3])
    a = np.asarray(trace_flat(scene, o, d, sk, 5, interpret=True,
                              compact=False))
    b = np.asarray(trace_flat(scene, o, d, sk, 5, interpret=True,
                              compact=True))
    np.testing.assert_array_equal(a, b)

    def loss(albedo, compact):
        sc = dc.replace(scene, albedo=albedo)
        return jnp.sum(trace_flat(sc, o, d, sk, 3, interpret=True,
                                  diff=True, compact=compact))

    g0 = np.asarray(jax.grad(lambda x: loss(x, False))(scene.albedo))
    g1 = np.asarray(jax.grad(lambda x: loss(x, True))(scene.albedo))
    np.testing.assert_array_equal(g0, g1)


@pytest.mark.slow
def test_mesh_compact_mode_is_bitwise_identical():
    # Round-5 mesh compact mode (QTRT_MESH_COMPACT / compact=True on
    # trace_flat_world): per-bounce alive-compaction sort of the carries —
    # same bitwise contract as the sphere path's compact mode (keys ride
    # the permutation so per-ray RNG is unchanged; pid restores order).
    import dataclasses as dc

    from qt_raytracer_tpu.core import sampling
    from qt_raytracer_tpu.core.integrator_flat import trace_flat_world
    scene, cam = scenes.get_scene("icosphere", 16 / 9)
    key = jax.random.PRNGKey(3)
    n = 2048
    o = jax.random.uniform(key, (n, 3), minval=-2.0, maxval=2.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    keys = sampling.pixel_states(key, jnp.arange(n, dtype=jnp.uint32),
                                 "hash")
    skeys = sampling.sample_keys(keys, 0)
    ref = np.asarray(trace_flat_world(scene, o, d, skeys, 4,
                                      interpret=True, compact=False))
    img = np.asarray(trace_flat_world(scene, o, d, skeys, 4,
                                      interpret=True, compact=True))
    np.testing.assert_array_equal(ref, img)
    # and through the NEE path (cornell world has an emissive quad)
    world, _ = scenes.get_scene("cornell_mesh", 1.0)
    ref = np.asarray(trace_flat_world(world, o * 0.2, d, skeys, 3,
                                      nee=True, interpret=True,
                                      compact=False))
    img = np.asarray(trace_flat_world(world, o * 0.2, d, skeys, 3,
                                      nee=True, interpret=True,
                                      compact=True))
    np.testing.assert_array_equal(ref, img)
