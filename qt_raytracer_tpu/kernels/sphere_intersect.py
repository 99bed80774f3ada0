"""Pallas TPU kernel: fused brute-force ray-sphere closest-hit search.

The XLA lowering of the [N,S] search (core/intersect.py) materializes
multi-hundred-MB intermediates in HBM and pads K=3 matmuls to K=128 on the
MXU. This kernel keeps the entire candidate computation in VMEM:

    layout:  rays  -> lanes   (128 rays per grid step)
             spheres -> sublanes ([S, 128] candidate tile)

Per grid step it computes every sphere's nearest valid root for 128 rays
(~20 VPU ops per pair, exactly the Sphere::hit recipe RayTracer.h:289-305),
then min/arg-min-reduces along the sublane (sphere) axis. HBM traffic is just
the SoA ray state in and (t, idx) out.

Differentiation: outputs are treated as non-differentiable (detached); the
caller re-derives t from the winning sphere via the well-conditioned
refinement (core/intersect.py), which is where gradients flow. This is the
detached-decision convention of diff/inverse.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scene import SphereScene

BIG = 3.0e38
RAY_BLOCK = 128   # rays per grid step (one lane row)
SUBLANE = 8       # f32 sublane quantum


def _search_kernel(ox, oy, oz, dx, dy, dz, alive, cx, cy, cz, c2r2,
                   t_out, idx_out, tcand_ref,
                   *, t_min: float, num_spheres: int):
    """One grid step: closest hit of an (8, 128) ray tile against all spheres.

    The candidate tile is (S, 128) per ray row — spheres along sublanes, rays
    along lanes; the 8 rows are a static unrolled loop (TPU block shapes need
    sublane dims divisible by 8, so rays arrive 1024 per grid step).

    Dead-row skipping: rays die progressively down the wavefront (sky misses
    die at bounce 1) and death is pixel-coherent, so whole 128-ray rows go
    dead; those rows skip the S-sphere search entirely (predicated
    per-row with pl.when on the row's alive popcount).
    """
    c_x, c_y, c_z = cx[...], cy[...], cz[...]          # (S, 1)
    c2 = c2r2[...]                                     # (S, 1) = |c|^2 - r^2 (+BIG if inactive)

    for r in range(SUBLANE):
        row_alive = jnp.sum(alive[r:r+1, :]) > 0

        @pl.when(row_alive)
        def _(r=r):
            o_x, o_y, o_z = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]  # (1, B)
            d_x, d_y, d_z = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]

            # Per-ray invariants, (1, B).
            a = d_x * d_x + d_y * d_y + d_z * d_z
            o_dot_d = o_x * d_x + o_y * d_y + o_z * d_z
            o2 = o_x * o_x + o_y * o_y + o_z * o_z
            inv_a = 1.0 / a

            # (S, B) candidate tile.
            d_dot_c = c_x * d_x + c_y * d_y + c_z * d_z
            o_dot_c = c_x * o_x + c_y * o_y + c_z * o_z
            half_b = o_dot_d - d_dot_c
            cterm = o2 - 2.0 * o_dot_c + c2
            disc = half_b * half_b - a * cterm
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            near = (-half_b - sq) * inv_a
            far = (-half_b + sq) * inv_a
            near_ok = (near >= t_min) & (near <= BIG)
            far_ok = (far >= t_min) & (far <= BIG)
            root = jnp.where(near_ok, near, far)
            valid = (disc >= 0.0) & (near_ok | far_ok)
            # Materialize candidates in scratch: the min-reduce and the
            # equality match below MUST read the same bits — without the
            # store, Mosaic may recompute tcand along both paths with
            # different FMA contraction and the argmin equality silently
            # fails (observed on v5e).
            tcand_ref[...] = jnp.where(valid, root, BIG)
            tcand = tcand_ref[...]

            t_best = jnp.min(tcand, axis=0, keepdims=True)       # (1, B)
            rows = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 0)
            # Lowest index among ties — matches jnp.argmin semantics.
            idx_best = jnp.min(
                jnp.where(tcand == t_best, rows, num_spheres), axis=0,
                keepdims=True)
            t_out[r:r+1, :] = t_best
            idx_out[r:r+1, :] = jnp.where(idx_best >= num_spheres, 0, idx_best)

        @pl.when(jnp.logical_not(row_alive))
        def _(r=r):
            # Dead row: no search; outputs must still be written (miss).
            t_out[r:r+1, :] = jnp.full((1, RAY_BLOCK), BIG, jnp.float32)
            idx_out[r:r+1, :] = jnp.zeros((1, RAY_BLOCK), jnp.int32)


def prep_spheres(scene: SphereScene):
    """Pack sphere SoA into kernel layout [(S,1) columns]; inactive slots get
    a +BIG cterm bias which forces disc < 0 (never hit)."""
    c = scene.center
    c2r2 = (jnp.sum(c * c, axis=-1) - scene.radius * scene.radius
            + jnp.where(scene.active, 0.0, BIG))
    s = c.shape[0]
    s_pad = max(-(-s // SUBLANE) * SUBLANE, SUBLANE)
    pad = lambda x, v: jnp.pad(x, (0, s_pad - s), constant_values=v)
    return (
        pad(c[:, 0], 0.0).reshape(s_pad, 1),
        pad(c[:, 1], 0.0).reshape(s_pad, 1),
        pad(c[:, 2], 0.0).reshape(s_pad, 1),
        pad(c2r2, BIG).reshape(s_pad, 1),
    )


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def sphere_search_pallas(scene: SphereScene, origins, directions,
                         t_min: float, interpret: bool = False, alive=None):
    """Closest-hit search: returns (t [N] f32 with BIG=miss, idx [N] i32).

    alive: optional [N] bool — dead rays are guaranteed to return miss, and
    fully-dead 128-ray rows skip the search (wavefront occupancy win).

    Outputs are detached (stop_gradient) — differentiable quantities must be
    re-derived from idx by the caller.
    """
    # Fully detach the search: inputs carry no tangents (else JAX tries to
    # differentiate the pallas_call itself), outputs carry none either. The
    # caller re-derives every differentiable quantity from idx.
    origins = jax.lax.stop_gradient(origins)
    directions = jax.lax.stop_gradient(directions)
    scene = jax.lax.stop_gradient(scene)

    n = origins.shape[0]
    tile = SUBLANE * RAY_BLOCK  # 1024 rays per grid step
    n_pad = max(-(-n // tile) * tile, tile)
    nb = n_pad // tile

    def comp(x, i):
        return jnp.pad(x[:, i], (0, n_pad - n)).reshape(nb * SUBLANE,
                                                        RAY_BLOCK)

    rays = [comp(origins, i) for i in range(3)] + \
           [comp(directions, i) for i in range(3)]
    if alive is None:
        alive_arr = jnp.ones((nb * SUBLANE, RAY_BLOCK), jnp.int32)
    else:
        alive_arr = jnp.pad(
            jax.lax.stop_gradient(alive).astype(jnp.int32), (0, n_pad - n)
        ).reshape(nb * SUBLANE, RAY_BLOCK)
    rays.append(alive_arr)
    cx, cy, cz, c2r2 = prep_spheres(scene)
    s_pad = cx.shape[0]

    ray_spec = pl.BlockSpec((SUBLANE, RAY_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sphere_spec = pl.BlockSpec((s_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    t, idx = pl.pallas_call(
        functools.partial(_search_kernel, t_min=t_min,
                          num_spheres=scene.num_spheres),
        grid=(nb,),
        in_specs=[ray_spec] * 7 + [sphere_spec] * 4,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nb * SUBLANE, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb * SUBLANE, RAY_BLOCK), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((s_pad, RAY_BLOCK), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=20 * n_pad * s_pad, bytes_accessed=n_pad * 4 * 8,
            transcendentals=n_pad * s_pad,
        ),
        interpret=interpret,
    )(*rays, cx, cy, cz, c2r2)

    t = jax.lax.stop_gradient(t.reshape(-1)[:n])
    idx = jax.lax.stop_gradient(idx.reshape(-1)[:n])
    return t, idx
