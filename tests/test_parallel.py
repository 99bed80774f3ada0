"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-node-without-a-cluster via
--xla_force_host_platform_device_count=8, set in conftest.py)."""

import jax
import numpy as np
import pytest

from qt_raytracer_tpu import RenderConfig, render_linear
from qt_raytracer_tpu.models import scenes
from qt_raytracer_tpu.parallel.sharding import make_mesh, render_linear_sharded


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(width=16, height=12, spp=4, max_depth=4)
    scene, cam = scenes.get_scene("three_sphere", cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)
    ref = np.asarray(render_linear(scene, cam, cfg, key))
    return cfg, scene, cam, key, ref


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("sp,px", [(1, 8), (2, 4), (4, 2), (4, 1), (1, 1)])
def test_sharded_render_matches_single_device(setup, sp, px):
    # Mesh-shape invariance from the counter-based RNG: every sample is
    # keyed on GLOBAL (pixel, sample) ids, so pixel-partitioning ("px") is
    # BITWISE invariant — asserted exactly. Sample-partitioning ("sp")
    # reassociates the per-pixel spp sum ((s0+s1)+(s2+s3) vs sequential),
    # which moves results by <= a few ulps; asserted to 1-ulp-scale tol.
    cfg, scene, cam, key, ref = setup
    devices = jax.devices()[: sp * px]
    mesh = make_mesh(sp=sp, px=px, devices=devices)
    img = np.asarray(render_linear_sharded(scene, cam, cfg, key, mesh))
    if sp == 1:
        np.testing.assert_array_equal(img, ref)
    else:
        np.testing.assert_allclose(img, ref, rtol=3e-7, atol=3e-7)


def test_nondivisible_pixels_padded(setup):
    # 16x12 = 192 pixels over px=5 devices does not divide; padding must be
    # sliced off invisibly.
    cfg, scene, cam, key, ref = setup
    mesh = make_mesh(sp=1, px=5, devices=jax.devices()[:5])
    img = np.asarray(render_linear_sharded(scene, cam, cfg, key, mesh))
    # Not asserted bitwise: the ragged 39-pixel shard width changes CPU
    # autovectorization (measured: 1-ulp flips on 2/192 pixels), unlike the
    # divisible px shardings above which ARE exact.
    np.testing.assert_allclose(img, ref, rtol=3e-7, atol=3e-7)


def test_sharded_mesh_world_matches_single_device():
    # World with triangle mesh through shard_map (BVH while-loop traversal
    # inside the sharded region).
    from qt_raytracer_tpu.models import meshes
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3)
    world = meshes.icosphere_world(subdiv=1, builder="python")
    cam = meshes.icosphere_camera(cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)
    ref = np.asarray(render_linear(world, cam, cfg, key))
    mesh = make_mesh(sp=2, px=4)
    img = np.asarray(render_linear_sharded(world, cam, cfg, key, mesh))
    np.testing.assert_allclose(img, ref, atol=1e-5, rtol=1e-5)


def test_distributed_helpers_single_process():
    from qt_raytracer_tpu.parallel import distributed
    # Single-process: global_mesh spans the 8 virtual devices; gather is a
    # no-op passthrough; coordinator is process 0.
    mesh = distributed.global_mesh(sp=1)
    assert mesh.shape["px"] == len(jax.devices())
    assert distributed.is_coordinator()
    x = jax.numpy.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(distributed.gather_image(x), np.asarray(x))


def test_spp_not_divisible_raises(setup):
    cfg, scene, cam, key, _ = setup
    mesh = make_mesh(sp=3, px=1, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        render_linear_sharded(scene, cam, cfg, key, mesh)


def test_sharded_terrain_world_px_bitwise():
    # The ACTUAL config-4 terrain world (100k tris, real cluster counts)
    # through render_linear_sharded: px-sharding must be BITWISE invariant
    # on the mesh path too — the recorded artifact behind "px-sharding is
    # the linear path past the single-chip mesh plateau"
    # (docs/PERFORMANCE.md '2 Msamples/s bar' closure; the reference's
    # tile-pool decomposition being subsumed, RayTracerFboItem.cpp:72-89).
    from qt_raytracer_tpu.models import meshes
    cfg = RenderConfig(width=96, height=54, spp=2, max_depth=3, rng="hash")
    world = meshes.terrain_world()
    cam = meshes.terrain_camera(cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)
    ref = np.asarray(render_linear(world, cam, cfg, key))
    mesh = make_mesh(sp=1, px=8)
    img = np.asarray(render_linear_sharded(world, cam, cfg, key, mesh))
    np.testing.assert_array_equal(img, ref)
