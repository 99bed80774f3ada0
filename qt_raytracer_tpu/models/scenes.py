"""Scene builders ("model zoo").

Subsumes every scene shipped in the reference plus the north-star benchmark
scenes (BASELINE.json configs):

  - three_sphere_scene: BASELINE config 1 (3 spheres + ground, diffuse).
  - four_sphere_gpu_scene: the scene hardcoded in all three GPU kernels
    (GpuPathTracer.cpp:217-240, CudaPathTracerKernel.cu:113-116,
    resources/shaders/pathtrace_vulkan.comp:70-105).
  - random_scene: the book-cover scene (RayTracer.h:599-643) — ground sphere,
    22x22 grid of small spheres with the 80/15/5 diffuse/metal/glass mix, and
    three hero spheres.
  - cornell_box_spheres: Cornell-style emissive box approximated with spheres
    (BASELINE config 2; emissive is a north-star extension with no reference
    analog).
  - default cameras for each (RayTracerFboItem.cpp:49-56 for the CPU scene,
    GpuPathTracer.cpp camera for the GPU scene).
"""

from __future__ import annotations

import numpy as np

from ..core.camera import Camera, make_camera
from ..core.scene import SceneBuilder, SphereScene


def three_sphere_scene(pad_to: int | None = 128) -> SphereScene:
    """Three diffuse spheres + ground — CPU-reference oracle scene."""
    b = SceneBuilder()
    b.lambertian((0.0, -1000.0, 0.0), 1000.0, (0.5, 0.5, 0.5))
    b.lambertian((0.0, 1.0, 0.0), 1.0, (0.7, 0.3, 0.3))
    b.lambertian((-2.5, 1.0, 0.0), 1.0, (0.3, 0.7, 0.3))
    b.lambertian((2.5, 1.0, 0.0), 1.0, (0.3, 0.3, 0.7))
    return b.build(pad_to=pad_to)


def three_sphere_camera(aspect_ratio: float) -> Camera:
    return make_camera(
        lookfrom=(0.0, 2.0, 8.0), lookat=(0.0, 1.0, 0.0), vup=(0.0, 1.0, 0.0),
        vfov=30.0, aspect_ratio=aspect_ratio, aperture=0.0, focus_dist=8.0,
    )


def four_sphere_gpu_scene(pad_to: int | None = 128) -> SphereScene:
    """The 4-sphere scene all three GPU kernels hardcode.

    Sphere data from GpuPathTracer.cpp:217-240: ground r=100.5 @(0,-100.5,-1)
    gray, center r=0.5 @(0,0,-1) red-ish, right r=0.45 @(1.05,-0.05,-1.2),
    left r=0.4 @(-1.1,-0.1,-0.8). The kernels scatter everything Lambertian.
    """
    b = SceneBuilder()
    b.lambertian((0.0, -100.5, -1.0), 100.5, (0.8, 0.8, 0.8))
    b.lambertian((0.0, 0.0, -1.0), 0.5, (0.9, 0.35, 0.3))
    b.lambertian((1.05, -0.05, -1.2), 0.45, (0.3, 0.6, 0.9))
    b.lambertian((-1.1, -0.1, -0.8), 0.4, (0.9, 0.8, 0.3))
    return b.build(pad_to=pad_to)


def four_sphere_gpu_camera(aspect_ratio: float) -> Camera:
    """GPU kernels' fixed camera: origin (0,0.3,1.2) looking down -z
    (GpuPathTracer.cpp shader main)."""
    return make_camera(
        lookfrom=(0.0, 0.3, 1.2), lookat=(0.0, 0.0, -1.0), vup=(0.0, 1.0, 0.0),
        vfov=55.0, aspect_ratio=aspect_ratio, aperture=0.0, focus_dist=1.0,
    )


def random_scene(seed: int = 0, pad_to: int | None = 128) -> SphereScene:
    """Book-cover scene (RayTracer.h:599-643), ~480 spheres.

    Same construction rules (grid, 0.9-exclusion around (4,0.2,0), 80/15/5
    material mix, hero spheres); the RNG is a seeded numpy Generator rather
    than the reference's thread-local xorshift, so layouts are reproducible.
    """
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    b.lambertian((0.0, -1000.0, 0.0), 1000.0, (0.5, 0.5, 0.5))

    for a in range(-11, 11):
        for c in range(-11, 11):
            choose_mat = rng.random()
            center = np.array([a + 0.9 * rng.random(), 0.2, c + 0.9 * rng.random()])
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            if choose_mat < 0.8:
                albedo = rng.random(3) * rng.random(3)
                b.lambertian(center, 0.2, albedo)
            elif choose_mat < 0.95:
                albedo = 0.5 + 0.5 * rng.random(3)
                fuzz = 0.5 * rng.random()
                b.metal(center, 0.2, albedo, fuzz)
            else:
                b.dielectric(center, 0.2, 1.5)

    b.dielectric((0.0, 1.0, 0.0), 1.0, 1.5)
    b.lambertian((-4.0, 1.0, 0.0), 1.0, (0.4, 0.2, 0.1))
    b.metal((4.0, 1.0, 0.0), 1.0, (0.7, 0.6, 0.5), 0.0)
    return b.build(pad_to=pad_to)


def random_scene_camera(aspect_ratio: float) -> Camera:
    """The CPU RenderWorker camera (RayTracerFboItem.cpp:49-56)."""
    return make_camera(
        lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
        vfov=20.0, aspect_ratio=aspect_ratio, aperture=0.1, focus_dist=10.0,
    )


def glossy_dof_scene(pad_to: int | None = 128) -> SphereScene:
    """BASELINE config 3: glossy metal + dielectric + depth of field."""
    b = SceneBuilder()
    b.lambertian((0.0, -1000.0, 0.0), 1000.0, (0.5, 0.5, 0.5))
    b.dielectric((0.0, 1.0, 0.0), 1.0, 1.5)
    b.metal((-2.2, 1.0, -1.0), 1.0, (0.8, 0.6, 0.2), 0.15)
    b.metal((2.2, 1.0, 1.0), 1.0, (0.7, 0.7, 0.8), 0.0)
    b.lambertian((0.8, 0.4, 2.0), 0.4, (0.2, 0.4, 0.8))
    return b.build(pad_to=pad_to)


def glossy_dof_camera(aspect_ratio: float) -> Camera:
    return make_camera(
        lookfrom=(6.0, 2.0, 6.0), lookat=(0.0, 1.0, 0.0), vup=(0.0, 1.0, 0.0),
        vfov=25.0, aspect_ratio=aspect_ratio, aperture=0.4, focus_dist=8.5,
    )


def cornell_box_spheres(pad_to: int | None = 128) -> SphereScene:
    """Cornell-style enclosure built from huge spheres + an emissive sphere
    light (BASELINE config 2). Walls are giant spheres whose near surfaces
    approximate planes; the light is an EMISSIVE-tagged sphere at the ceiling.
    """
    R = 1000.0
    b = SceneBuilder()
    b.lambertian((0.0, -R, 0.0), R, (0.73, 0.73, 0.73))          # floor
    b.lambertian((0.0, R + 2.0, 0.0), R, (0.73, 0.73, 0.73))     # ceiling
    b.lambertian((0.0, 1.0, -R - 2.0), R, (0.73, 0.73, 0.73))    # back
    b.lambertian((-R - 2.0, 1.0, 0.0), R, (0.65, 0.05, 0.05))    # left red
    b.lambertian((R + 2.0, 1.0, 0.0), R, (0.12, 0.45, 0.15))     # right green
    b.emissive((0.0, 2.2, 0.0), 0.4, (15.0, 15.0, 15.0))         # area-ish light
    b.lambertian((-0.7, 0.5, -0.5), 0.5, (0.73, 0.73, 0.73))
    b.metal((0.8, 0.45, 0.3), 0.45, (0.8, 0.85, 0.88), 0.0)
    return b.build(pad_to=pad_to)


def cornell_box_camera(aspect_ratio: float) -> Camera:
    return make_camera(
        lookfrom=(0.0, 1.0, 4.5), lookat=(0.0, 1.0, 0.0), vup=(0.0, 1.0, 0.0),
        vfov=40.0, aspect_ratio=aspect_ratio, aperture=0.0, focus_dist=4.5,
    )


def _terrain():
    from . import meshes
    return meshes.terrain_world, meshes.terrain_camera


def _icosphere():
    from . import meshes
    return meshes.icosphere_world, meshes.icosphere_camera


def _cornell_mesh():
    from . import meshes
    return meshes.cornell_box_world, meshes.cornell_box_mesh_camera


SCENES = {
    "three_sphere": (three_sphere_scene, three_sphere_camera),
    "four_sphere_gpu": (four_sphere_gpu_scene, four_sphere_gpu_camera),
    "random": (random_scene, random_scene_camera),
    "glossy_dof": (glossy_dof_scene, glossy_dof_camera),
    "cornell": (cornell_box_spheres, cornell_box_camera),
}

# Mesh worlds (triangles + BVH; BASELINE configs 2 and 4) — lazy to keep
# bare sphere-scene imports light. "cornell_mesh" is the TRUE Cornell box
# (quad walls, emissive area-light quad, rotated boxes — per-face materials).
MESH_SCENES = ("terrain", "icosphere", "cornell_mesh")


def get_scene(name: str, aspect_ratio: float, **kwargs):
    """Look up (scene, camera) by name; raises KeyError with choices."""
    if name in MESH_SCENES:
        build, cam = {"terrain": _terrain, "icosphere": _icosphere,
                      "cornell_mesh": _cornell_mesh}[name]()
        return build(**kwargs), cam(aspect_ratio)
    if name not in SCENES:
        raise KeyError(
            f"unknown scene {name!r}; choices: "
            f"{sorted(SCENES) + sorted(MESH_SCENES)}")
    build, cam = SCENES[name]
    return build(**kwargs), cam(aspect_ratio)
