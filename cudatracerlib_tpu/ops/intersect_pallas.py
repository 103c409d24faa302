"""Pallas TPU ray-intersection kernels.

TPU-native counterpart of the reference's intersection kernels
(Kernel/TraceHelper.cu:326-746). This module provides the *dense* kernel:
each grid step holds a tile of rays in VMEM and sweeps every (Woop-transformed)
triangle over the whole tile — zero gathers, pure VPU arithmetic, with the
triangle loop unrolled over VMEM-resident data. For scenes up to a few
thousand triangles this is faster than any pointer-chasing structure on TPU
(the machine does ~10^13 f32 FLOP/s but hates irregular loads); larger scenes
use the BVH path (accel/traversal.py, Pallas BVH kernel to follow).

Ray layout: each scalar stream (ox, oy, oz, dx, dy, dz, tmin, tmax) is shaped
(R, 128) so a (SUB, 128) block is a native VPU tile. Woop math is identical to
accel/traversal.intersect_woop (and Kernel/TraceHelper.cu:638-685).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import BVH
from ..accel.traversal import Hit

LANES = 128
SUB = 64           # sublane rows per block -> 64*128 = 8192 rays per grid step
TRI_CHUNK = 8      # triangles processed per inner-loop iteration


def _dense_kernel(woop_ref, rays_ref, t_ref, prim_ref, u_ref, v_ref, *, n_tri,
                  any_hit):
    """One ray tile vs all triangles.

    rays_ref: (8, SUB, 128) = [ox oy oz dx dy dz tmin tmax]
    woop_ref: (n_tri, 12) in VMEM
    outputs: t (SUB,128), prim int32 (SUB,128), u, v
    """
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    dx = rays_ref[3]
    dy = rays_ref[4]
    dz = rays_ref[5]
    tmin = rays_ref[6]
    tmax = rays_ref[7]

    best_t = tmax
    best_prim = jnp.full((SUB, LANES), -1, jnp.int32)
    best_u = jnp.zeros((SUB, LANES), jnp.float32)
    best_v = jnp.zeros((SUB, LANES), jnp.float32)

    def tri_body(j, state):
        best_t, best_prim, best_u, best_v = state
        w = woop_ref[j]  # (12,) vector; scalar broadcasts below
        r0x, r0y, r0z, r0w = w[0], w[1], w[2], w[3]
        r1x, r1y, r1z, r1w = w[4], w[5], w[6], w[7]
        r2x, r2y, r2z, r2w = w[8], w[9], w[10], w[11]

        oz_p = r2x * ox + r2y * oy + r2z * oz + r2w
        dz_p = r2x * dx + r2y * dy + r2z * dz
        inv_dz = 1.0 / jnp.where(jnp.abs(dz_p) < 1e-20, 1e-20, dz_p)
        t = -oz_p * inv_dz
        in_range = (t > tmin) & (t < best_t)

        u = r0x * (ox + t * dx) + r0y * (oy + t * dy) + r0z * (oz + t * dz) + r0w
        v = r1x * (ox + t * dx) + r1y * (oy + t * dy) + r1z * (oz + t * dz) + r1w
        hit = in_range & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)

        best_prim = jnp.where(hit, j, best_prim)
        best_u = jnp.where(hit, u, best_u)
        best_v = jnp.where(hit, v, best_v)
        best_t = jnp.where(hit, t, best_t)
        return best_t, best_prim, best_u, best_v

    best_t, best_prim, best_u, best_v = jax.lax.fori_loop(
        0, n_tri, tri_body, (best_t, best_prim, best_u, best_v)
    )

    t_ref[...] = best_t
    prim_ref[...] = best_prim
    u_ref[...] = best_u
    v_ref[...] = best_v


@functools.partial(jax.jit, static_argnames=("any_hit",))
def intersect_dense(bvh: BVH, o, d, t_min=1e-4, t_max=1e30, any_hit=False) -> Hit:
    """Dense Pallas intersection of a ray batch vs all scene triangles."""
    B = o.shape[0]
    n_tri = bvh.woop.shape[0]
    block = SUB * LANES
    pad = (-B) % block
    Bp = B + pad

    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (B,))
    t_max_b = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(t_max, jnp.float32), 1e30), (B,)
    )
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_min_b, t_max_b]
    rays = jnp.stack([jnp.pad(c, (0, pad)) for c in comps])  # (8, Bp)
    # avoid 0-direction NaNs in padded lanes
    rays = rays.reshape(8, Bp // LANES, LANES)

    grid = Bp // block
    kernel = functools.partial(_dense_kernel, n_tri=n_tri, any_hit=any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32),
        jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32),
    ]
    out_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n_tri, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=30 * n_tri * Bp, bytes_accessed=Bp * 48, transcendentals=0
        ),
    )(bvh.woop, rays)

    t = t.reshape(-1)[:B]
    prim = prim.reshape(-1)[:B]
    u = u.reshape(-1)[:B]
    v = v.reshape(-1)[:B]
    return Hit(
        t=t,
        prim=prim,
        bary=jnp.stack([u, v], axis=-1),
        valid=prim >= 0,
    )
