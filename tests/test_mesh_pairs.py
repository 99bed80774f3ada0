"""Pair-wavefront mesh kernel (interpreter mode on CPU): bitwise parity
with the clustered kernel on live lanes, sphere-cap semantics, dead lanes,
and the overflow fallback path (tiny pair budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qt_raytracer_tpu.kernels.mesh_intersect import mesh_search_pallas
from qt_raytracer_tpu.kernels.mesh_pairs import mesh_search_pairs
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
    ref_t, ref_i = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True)
    return mesh, o, d, np.asarray(ref_t), np.asarray(ref_i)


def test_pairs_bitwise_matches_clustered(setup):
    mesh, o, d, rt, ri = setup
    t, i = mesh_search_pairs(mesh, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(t), rt)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_pairs_with_sphere_cap_and_alive(setup):
    # A finite per-lane cap: only triangles strictly beating it may win;
    # dead lanes are miss; results bitwise match the clustered kernel.
    mesh, o, d, _, _ = setup
    n = o.shape[0]
    alive = jax.random.bernoulli(jax.random.PRNGKey(7), 0.6, (n,))
    tcap = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(8), 0.5, (n,)),
        jax.random.uniform(jax.random.PRNGKey(9), (n,), minval=0.5,
                           maxval=6.0),
        jnp.float32(3.0e38))
    t0, i0 = mesh_search_pallas(mesh, o, d, 1e-3, interpret=True,
                                alive=alive, t_cap=tcap)
    t1, i1 = mesh_search_pairs(mesh, o, d, 1e-3, interpret=True,
                               alive=alive, t_cap=tcap)
    a = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(t1)[a], np.asarray(t0)[a])
    np.testing.assert_array_equal(np.asarray(i1)[a], np.asarray(i0)[a])
    assert np.all(np.asarray(t1)[~a] >= BIG)
    # cap semantics: every reported hit strictly beats its cap
    hit = np.asarray(t1) < BIG
    assert np.all(np.asarray(t1)[hit] < np.asarray(tcap)[hit])


def test_pairs_overflow_falls_back_exactly(setup):
    # A pair budget far below the true crossing count forces the nonzero
    # drop; dropped rays must come back through the clustered kernel with
    # identical results (full-image bitwise parity regardless of budget).
    mesh, o, d, rt, ri = setup
    t, i = mesh_search_pairs(mesh, o, d, 1e-3, interpret=True,
                             pair_budget=1024)
    np.testing.assert_array_equal(np.asarray(t), rt)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_pairs_all_dead(setup):
    mesh, o, d, _, _ = setup
    alive = jnp.zeros((o.shape[0],), bool)
    t, i = mesh_search_pairs(mesh, o, d, 1e-3, interpret=True, alive=alive)
    assert np.all(np.asarray(t) >= BIG)
    assert np.all(np.asarray(i) == 0)
