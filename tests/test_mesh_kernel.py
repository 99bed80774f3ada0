"""Clustered mesh-kernel tests (interpreter mode on CPU): both MT engines
(VPU elementwise and MXU bilinear-form) against the XLA BVH traversal, the
wavefront coherence sort, and dead-lane semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qt_raytracer_tpu.accel.traverse import intersect_mesh
from qt_raytracer_tpu.kernels.mesh_intersect import mesh_search_pallas
from qt_raytracer_tpu.models import meshes

BIG = 1e30


@pytest.fixture(scope="module")
def setup():
    world = meshes.terrain_world(nx=48, nz=48)
    mesh = world.mesh
    k = jax.random.PRNGKey(3)
    n = 4096
    o = jax.random.uniform(k, (n, 3), minval=-4.0, maxval=4.0).at[:, 1].add(3.0)
    d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    ref = intersect_mesh(mesh, o, d, 1e-3)
    return mesh, o, d, ref


@pytest.mark.parametrize("mt", ["vpu", "mxu"])
def test_kernel_matches_xla_traversal(setup, mt):
    mesh, o, d, ref = setup
    t, i = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True, mt=mt)
    t, i = np.asarray(t), np.asarray(i)
    rh = np.asarray(ref.hit)
    h = t < BIG
    # Hit classification and winning triangle must agree except at
    # measure-zero edge/tie flips (observed: exact agreement at this size).
    assert (h == rh).mean() > 0.999
    both = h & rh
    assert (i[both] == np.asarray(ref.tri_idx)[both]).mean() > 0.999
    match = both & (i == np.asarray(ref.tri_idx))
    np.testing.assert_allclose(t[match], np.asarray(ref.t)[match],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mt,mode", [("vpu", "crossing"), ("vpu", "morton"),
                                     ("mxu", "crossing")])
def test_sort_bitwise_on_live_lanes(setup, mt, mode):
    # The coherence sort (either key) may not change any LIVE lane's result
    # bitwise (per-ray math is lane-independent); dead lanes are don't-care.
    mesh, o, d, _ = setup
    alive = np.asarray(jax.random.bernoulli(jax.random.PRNGKey(7), 0.6,
                                            (o.shape[0],)))
    t0, i0 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                alive=jnp.asarray(alive), sort=False, mt=mt)
    t1, i1 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                alive=jnp.asarray(alive), sort=True, mt=mt,
                                sort_mode=mode)
    t0, t1, i0, i1 = map(np.asarray, (t0, t1, i0, i1))
    np.testing.assert_array_equal(t0[alive], t1[alive])
    np.testing.assert_array_equal(i0[alive], i1[alive])


def test_fused_sort_pipe_bitwise_all_lanes(setup):
    # The fused variadic-sort pipeline is the SAME stable permutation as
    # argsort+gathers (stable lax.sort with iota tiebreak IS jnp.argsort),
    # so outputs must match bitwise on every lane, dead ones included —
    # with and without t_cap (extra sorted operand).
    mesh, o, d, _ = setup
    alive = jnp.asarray(jax.random.bernoulli(jax.random.PRNGKey(7), 0.6,
                                             (o.shape[0],)))
    t_cap = jnp.full((o.shape[0],), 7.5)
    for cap in (None, t_cap):
        t0, i0 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                    alive=alive, t_cap=cap, pipe="gather")
        t1, i1 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                    alive=alive, t_cap=cap, pipe="fused")
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["subtile", "sliced", "rowgate"])
def test_visit_variants_bitwise_equal_full(setup, variant):
    # Every visit variant (sub-tiled MT, gate-sliced MT, per-row AABB
    # pre-gate) must reproduce the (128,128) visit BITWISE: same expression
    # tree per (ray,tri), same 128-lane argmin, gates only SKIP rows no
    # lane could win.
    mesh, o, d, _ = setup
    t0, i0 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                visit="full")
    t1, i1 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                visit=variant)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_first_crossed_cluster_matches_xla(setup):
    # The c1 kernel's slab gate must match the XLA formulation on the same
    # epsilon-padded cluster boxes (the sort key only needs consistency,
    # but exactness here catches slab-math drift).
    from qt_raytracer_tpu.kernels.mesh_intersect import (
        first_crossed_cluster)
    from qt_raytracer_tpu.kernels.mesh_pairs import cluster_bounds
    mesh, o, d, _ = setup
    c1 = np.asarray(first_crossed_cluster(mesh, o, d, 1e-3, interpret=True))
    lo, hi, k = cluster_bounds(mesh)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                          jnp.where(d < 0, -1e-30, 1e-30), d)
    t0 = (np.asarray(lo)[None] - np.asarray(o)[:, None]) * np.asarray(inv)[:, None]
    t1 = (np.asarray(hi)[None] - np.asarray(o)[:, None]) * np.asarray(inv)[:, None]
    enter = np.maximum(np.minimum(t0, t1).max(-1), 1e-3)
    exit_ = np.minimum(np.maximum(t0, t1), 3e38).min(-1)
    m = exit_ > enter
    ref = np.where(m.any(1), m.argmax(1), k)
    np.testing.assert_array_equal(c1, ref)


def test_exclusion_matches_xla_traversal(setup):
    # Per-lane triangle exclusion (the mesh-silhouette background re-trace):
    # excluding each ray's own winner must reveal the SECOND hit, matching
    # the XLA traversal's exclusion semantics (same measure-zero tie
    # tolerance as the plain comparison), and the excluded id must never
    # win.
    mesh, o, d, ref = setup
    excl = jnp.where(ref.hit, ref.tri_idx, -1)
    t1, i1 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                exclude=excl)
    ref2 = intersect_mesh(mesh, o, d, 1e-3, exclude=excl)
    t1, i1 = np.asarray(t1), np.asarray(i1)
    h = t1 < BIG
    rh = np.asarray(ref2.hit)
    assert (h == rh).mean() > 0.999
    both = h & rh
    assert (i1[both] == np.asarray(ref2.tri_idx)[both]).mean() > 0.999
    assert not np.any(h & (i1 == np.asarray(excl)))
    # Exclusion must actually change something on this workload.
    assert np.any(np.asarray(ref.hit) & (~h | (i1 != np.asarray(ref.tri_idx))))


def test_all_dead_returns_miss(setup):
    mesh, o, d, _ = setup
    alive = jnp.zeros((o.shape[0],), bool)
    t, i = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True, alive=alive)
    assert np.all(np.asarray(t) >= BIG)
    assert np.all(np.asarray(i) == 0)
