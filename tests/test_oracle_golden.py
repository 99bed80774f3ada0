"""Golden-image tests: vectorized TPU renderer vs the scalar float64 oracle.

The reference has no cross-backend consistency tests at all (its four
integrator copies drifted: different scenes, different quantizers —
SURVEY.md §1). Here every material path and camera feature is checked
end-to-end against an independent scalar implementation consuming the same
random stream, at per-sample granularity.
"""

import jax
import numpy as np
import pytest

from qt_raytracer_tpu import RenderConfig, render_linear
from qt_raytracer_tpu.models import scenes
from qt_raytracer_tpu.testing import oracle


def _compare(scene_name, cfg, seed=0, atol=2e-3, rtol=2e-3, max_mismatch=0.0):
    """max_mismatch: allowed fraction of channel mismatches. Scenes with
    stochastic discrete branches (Schlick reflect-vs-refract, metal
    absorb-below-horizon) can flip a branch between f32 and f64 for borderline
    uniforms, changing that sample's whole path — tolerated as a small
    fraction rather than widening atol."""
    scene, cam = scenes.get_scene(scene_name, cfg.aspect_ratio, pad_to=None)
    key = jax.random.PRNGKey(seed)
    got = np.asarray(render_linear(scene, cam, cfg, key), np.float64)
    want = oracle.render_oracle_linear(scene, cam, cfg, key)
    # Normalize to per-sample means for scale-free tolerance.
    got /= cfg.spp
    want /= cfg.spp
    if max_mismatch == 0.0:
        np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)
    else:
        mismatch = np.abs(got - want) > (atol + rtol * np.abs(want))
        assert mismatch.mean() <= max_mismatch, (
            f"mismatch fraction {mismatch.mean():.4f} > {max_mismatch}"
        )


def test_three_sphere_diffuse_matches_oracle():
    # BASELINE config 1 (shrunk): pure Lambertian + ground + sky.
    # max_mismatch: one silhouette-grazing sample flips hit-vs-miss between
    # f32 and f64 (the stable-root refinement moved it to the other side of
    # the f64 oracle's branch; both are valid estimators of the pixel).
    _compare("three_sphere", RenderConfig(width=16, height=12, spp=2, max_depth=4),
             max_mismatch=0.01)


def test_four_sphere_gpu_scene_matches_oracle():
    # The scene every reference GPU kernel hardcodes.
    _compare("four_sphere_gpu", RenderConfig(width=16, height=12, spp=2, max_depth=4))


def test_glossy_dielectric_dof_matches_oracle():
    # BASELINE config 3 (shrunk): metal fuzz, dielectric, thin-lens aperture.
    _compare("glossy_dof", RenderConfig(width=16, height=12, spp=2, max_depth=6),
             atol=4e-3, rtol=4e-3, max_mismatch=0.01)


def test_cornell_emissive_matches_oracle():
    # BASELINE config 2 (shrunk): emissive termination path.
    _compare("cornell", RenderConfig(width=12, height=12, spp=2, max_depth=5),
             atol=4e-3, rtol=4e-3)


def test_cornell_nee_matches_oracle():
    # NEE path: cone light sampling + shadow rays + emitter-hit suppression,
    # all mirrored scalar-exactly by the oracle.
    # max_mismatch: Cornell walls are |c|~1e2 spheres where f32-vs-f64
    # branch flips at silhouettes are most likely; at 24x24 the measured
    # fraction is ~1.3% (and the fused/flat path measures ~0.8%).
    _compare("cornell", RenderConfig(width=12, height=12, spp=2, max_depth=5,
                                     nee=True),
             atol=4e-3, rtol=4e-3, max_mismatch=0.03)


def test_nee_is_unbiased_and_lower_variance():
    # Same scene, NEE on vs off: means agree (unbiased), per-pixel variance
    # collapses (that is the point of NEE). The camera is aimed so the light
    # sphere is OUT of frame — direct-visible-light pixels are identical in
    # both estimators but their hit-or-miss jitter noise would swamp the MSE
    # comparison at this resolution.
    from qt_raytracer_tpu.core.camera import make_camera
    scene, _ = scenes.get_scene("cornell", 1.0, pad_to=None)
    cam = make_camera((0.0, 0.7, 4.0), (0.0, 0.6, 0.0), vfov=22.0,
                      aspect_ratio=1.0, aperture=0.0, focus_dist=4.0)
    key = jax.random.PRNGKey(3)
    base = dict(width=8, height=8, max_depth=5, samples_per_batch=8)
    img_off = np.asarray(render_linear(
        scene, cam, RenderConfig(spp=512, **base), key)) / 512
    img_on = np.asarray(render_linear(
        scene, cam, RenderConfig(spp=64, nee=True, **base), key)) / 64
    # Unbiased: means of the two estimators agree within MC noise.
    assert np.abs(img_on.mean() - img_off.mean()) / img_off.mean() < 0.15
    # Variance: compare per-pixel deviation from a high-spp NEE reference.
    ref = np.asarray(render_linear(
        scene, cam, RenderConfig(spp=512, nee=True, **base),
        jax.random.PRNGKey(7))) / 512
    err_off = np.mean((img_off - ref) ** 2)
    err_on = np.mean((img_on - ref) ** 2)
    assert err_on < err_off, (err_on, err_off)  # 8x fewer spp, still better


def test_random_scene_small_matches_oracle():
    # Book-cover scene (RayTracer.h:599-643): all three materials at once.
    cfg = RenderConfig(width=12, height=8, spp=1, max_depth=4)
    scene = scenes.random_scene(seed=3, pad_to=None)
    cam = scenes.random_scene_camera(cfg.aspect_ratio)
    key = jax.random.PRNGKey(1)
    got = np.asarray(render_linear(scene, cam, cfg, key), np.float64) / cfg.spp
    want = oracle.render_oracle_linear(scene, cam, cfg, key) / cfg.spp
    # f32 catastrophic-cancellation risk is highest here (r=1000 ground +
    # 480 spheres); the refinement pass in intersect.py keeps this tight.
    mismatch = np.abs(got - want) > (4e-3 + 4e-3 * np.abs(want))
    # allow <=1% of pixel-channels to disagree (argmin ties / tangent discs)
    assert mismatch.mean() <= 0.01, f"mismatch fraction {mismatch.mean()}"


def test_padding_is_invisible():
    # Inactive padded slots must not change the image at all.
    cfg = RenderConfig(width=12, height=8, spp=2, max_depth=4)
    key = jax.random.PRNGKey(0)
    s1, cam = scenes.get_scene("three_sphere", cfg.aspect_ratio, pad_to=None)
    s2, _ = scenes.get_scene("three_sphere", cfg.aspect_ratio, pad_to=128)
    img1 = np.asarray(render_linear(s1, cam, cfg, key))
    img2 = np.asarray(render_linear(s2, cam, cfg, key))
    np.testing.assert_array_equal(img1, img2)


def test_render_deterministic_same_key():
    cfg = RenderConfig(width=12, height=8, spp=2, max_depth=4)
    scene, cam = scenes.get_scene("three_sphere", cfg.aspect_ratio)
    a = np.asarray(render_linear(scene, cam, cfg, jax.random.PRNGKey(7)))
    b = np.asarray(render_linear(scene, cam, cfg, jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_linear(scene, cam, cfg, jax.random.PRNGKey(8)))
    assert np.abs(a - c).max() > 0  # different key -> different noise


def test_pixel_chunk_invariance():
    # Chunked pixel tracing (memory-bounded path) must not change results,
    # including the non-divisible padding case.
    scene, cam = scenes.get_scene("three_sphere", 1.5)
    key = jax.random.PRNGKey(2)
    base = RenderConfig(width=12, height=8, spp=2, max_depth=3)
    ref = np.asarray(render_linear(scene, cam, base, key))
    for chunk in (32, 40, 96):  # 96 pixels: divisible, ragged, exact
        cfg = RenderConfig(width=12, height=8, spp=2, max_depth=3,
                           pixel_chunk=chunk)
        got = np.asarray(render_linear(scene, cam, cfg, key))
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_samples_per_batch_invariance():
    # The sample-batch scan layout must not change results.
    scene, cam = scenes.get_scene("three_sphere", 1.5)
    key = jax.random.PRNGKey(2)
    cfg1 = RenderConfig(width=12, height=8, spp=4, max_depth=3, samples_per_batch=1)
    cfg2 = RenderConfig(width=12, height=8, spp=4, max_depth=3, samples_per_batch=4)
    a = np.asarray(render_linear(scene, cam, cfg1, key))
    b = np.asarray(render_linear(scene, cam, cfg2, key))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
