"""Pallas kernel tests (interpreter mode on CPU — the compiled path runs on
TPU in bench/driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qt_raytracer_tpu import RenderConfig, render_linear
from qt_raytracer_tpu.core.intersect import BIG, intersect_spheres
from qt_raytracer_tpu.kernels.sphere_intersect import sphere_search_pallas
from qt_raytracer_tpu.models import scenes


@pytest.fixture(scope="module", autouse=True)
def _fresh_jit_cache():
    # Same workaround as tests/test_mesh_edge_gradients.py: XLA:CPU's
    # backend_compile aborts inside LLVM once ~40 modules of live
    # executables accumulate (deterministic at a suite position, never
    # standalone). The full-render graphs here crossed that threshold when
    # round 5 added interpret-mode kernel modules earlier in the alphabet;
    # dropping the accumulated executables first keeps the suite green.
    jax.clear_caches()
    yield


def _random_rays(n, key, spread=6.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    o = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    d = jax.random.normal(k2, (n, 3))
    return o, d


def test_pallas_search_matches_xla_search():
    scene = scenes.random_scene(seed=5, pad_to=128)
    o, d = _random_rays(333, key=0)  # non-multiple of 128 exercises padding
    t_x, i_x = [], []
    hx = intersect_spheres(scene, o, d, 1e-3, backend="xla")
    t_p, i_p = sphere_search_pallas(scene, o, d, 1e-3, interpret=True)
    t_x = np.asarray(hx.t)
    t_p = np.asarray(t_p)
    hit_x = t_x < float(BIG)
    hit_p = t_p < BIG
    np.testing.assert_array_equal(hit_x, hit_p)
    # Coarse t agrees to f32 cancellation noise (different op orders; the
    # r=1000 ground sphere dominates the error — both paths get refined
    # downstream, see test_pallas_full_render_matches_xla).
    np.testing.assert_allclose(t_p[hit_p], t_x[hit_x], rtol=2e-3, atol=1e-4)
    # Winning sphere must match except at near-exact ties.
    idx_match = np.asarray(hx.prim_idx) == np.asarray(i_p)
    assert idx_match[hit_x].mean() > 0.999


def test_pallas_search_exclusion_matches_xla():
    # Per-lane sphere exclusion (edge-aware background re-trace): excluding
    # each ray's own winner must reveal the second-closest hit with the
    # same semantics as the xla [N,S] mask, and the excluded id never wins.
    scene = scenes.random_scene(seed=5, pad_to=128)
    o, d = _random_rays(333, key=0)
    hx0 = intersect_spheres(scene, o, d, 1e-3, backend="xla")
    excl = jnp.where(hx0.hit, hx0.prim_idx, -1)
    hx = intersect_spheres(scene, o, d, 1e-3, backend="xla", exclude=excl)
    t_p, i_p = sphere_search_pallas(scene, o, d, 1e-3, interpret=True,
                                    exclude=excl)
    t_p, i_p = np.asarray(t_p), np.asarray(i_p)
    hit_p = t_p < BIG
    np.testing.assert_array_equal(np.asarray(hx.hit), hit_p)
    assert (np.asarray(hx.prim_idx) == i_p)[hit_p].mean() > 0.999
    assert not np.any(hit_p & (i_p == np.asarray(excl)))


def test_pallas_full_render_matches_xla():
    cfg_x = RenderConfig(width=16, height=12, spp=2, max_depth=4,
                         intersector="xla")
    cfg_p = RenderConfig(width=16, height=12, spp=2, max_depth=4,
                         intersector="pallas_interpret")
    scene, cam = scenes.get_scene("three_sphere", cfg_x.aspect_ratio)
    key = jax.random.PRNGKey(0)
    a = np.asarray(render_linear(scene, cam, cfg_x, key))
    b = np.asarray(render_linear(scene, cam, cfg_p, key))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pallas_clustered_path_matches_xla():
    # >= 1024 spheres triggers the cluster-culled kernel variant (Morton
    # order + per-chunk AABB gates); must agree with XLA exactly.
    from qt_raytracer_tpu import SceneBuilder
    from qt_raytracer_tpu.kernels.sphere_intersect import \
        MIN_CHUNKS_FOR_CULLING, CHUNK_S

    rng = np.random.default_rng(9)
    b = SceneBuilder()
    n_spheres = MIN_CHUNKS_FOR_CULLING * CHUNK_S + 37
    for _ in range(n_spheres):
        b.lambertian(rng.uniform(-10, 10, 3), rng.uniform(0.05, 0.4),
                     (0.5, 0.5, 0.5))
    scene = b.build(pad_to=128)
    o = jnp.asarray(rng.uniform(-12, 12, (512, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    hx = intersect_spheres(scene, o, d, 1e-3, backend="xla")
    t_p, i_p = sphere_search_pallas(scene, o, d, 1e-3, interpret=True)
    t_x = np.asarray(hx.t)
    t_p = np.asarray(t_p)
    hit_x, hit_p = t_x < float(BIG), t_p < BIG
    np.testing.assert_array_equal(hit_x, hit_p)
    np.testing.assert_allclose(t_p[hit_p], t_x[hit_x], rtol=2e-3, atol=1e-4)
    assert (np.asarray(hx.prim_idx) == np.asarray(i_p))[hit_x].mean() > 0.999


def test_pallas_path_gradients_flow():
    # Kernel outputs are detached; gradients must still flow via the
    # refinement recompute.
    import dataclasses
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=2,
                       intersector="pallas_interpret")
    scene, cam = scenes.get_scene("three_sphere", 1.0)
    key = jax.random.PRNGKey(0)

    def loss(albedo):
        sc = dataclasses.replace(scene, albedo=albedo)
        return jnp.mean(render_linear(sc, cam, cfg, key))

    g = np.asarray(jax.grad(loss)(scene.albedo))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
