"""Pallas cluster-stream traversal kernel — the big-scene intersector.

TPU-native replacement for the reference's Aila-Laine persistent-threads BVH
kernel (Kernel/TraceHelper.cu:326-746). Design (SURVEY.md §7 "hard parts"):
per-ray pointer chasing cannot map to the VPU, so traversal is re-shaped into
dense culling over a two-level cluster decomposition (accel/clusters.py):

  per ray tile (SUB x 128 rays resident in VMEM):
    for each super box (all boxes in VMEM):        - scalar-pruned:
      if any lane enters it:                         a coherent tile skips
        for each of its 64 cluster boxes:            most of the scene
          if any lane enters (and beats its t):
            DMA the cluster's 256 Woop triangles HBM->VMEM
            test every lane against all 256 (dense VPU sweep)

The `any-lane` scalar predicates turn spatial coherence into skipped work —
the TPU analogue of warp-coherent traversal — and the only irregular memory
access left is the per-cluster DMA, which is a large contiguous 12 KB burst.
Closest-hit updates shrink best_t, so later boxes prune (front-ish order via
the Morton layout of clusters).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import BVH
from ..accel.clusters import (CLUSTER_TRIS, N_PACKETS, PACKET_TRIS, SUPER_WAY,
                              ClusterScene)
from ..accel.traversal import Hit

LANES = 128
SUB = 8  # 1024 rays per tile


def _slab(lo, hi, ox, oy, oz, idx, idy, idz, tmin, tmax):
    t0x = (lo[0] - ox) * idx
    t1x = (hi[0] - ox) * idx
    t0y = (lo[1] - oy) * idy
    t1y = (hi[1] - oy) * idy
    t0z = (lo[2] - oz) * idz
    t1z = (hi[2] - oz) * idz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), tmax),
    )
    return near <= far


def _slab_near(lo, hi, ox, oy, oz, idx, idy, idz, tmin, tmax):
    """Slab test returning (hit, clamped entry distance)."""
    t0x = (lo[0] - ox) * idx
    t1x = (hi[0] - ox) * idx
    t0y = (lo[1] - oy) * idy
    t1y = (hi[1] - oy) * idy
    t0z = (lo[2] - oz) * idz
    t1z = (hi[2] - oz) * idz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), tmax),
    )
    return near <= far, near


def _cluster_kernel(sup_ref, cl_ref, cl_cm_ref, rays_ref, woop_hbm, t_ref,
                    code_ref, u_ref, v_ref, scratch, sup_t, queue, near_ref,
                    nq_ref, sem, *, n_super, n_rounds, any_hit):
    """Front-to-back ordered cluster traversal (see module docstring).

    sup_t is an SMEM array of per-super tile entry distances; a selection
    loop visits supers near-to-far so best_t tightens early and distant boxes
    prune to `any() == False`. `near_ref` holds per-cluster conservative
    frustum entry distances computed once per tile (128 clusters per VPU
    round); `queue` holds a super's surviving cluster ids for the
    double-buffered DMA pipeline."""
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    dx = rays_ref[3]
    dy = rays_ref[4]
    dz = rays_ref[5]
    tmin = rays_ref[6]
    tmax = rays_ref[7]
    idx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    idy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    idz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)

    t_ref[...] = tmax
    code_ref[...] = jnp.full((SUB, LANES), -1, jnp.int32)
    u_ref[...] = jnp.zeros((SUB, LANES), jnp.float32)
    v_ref[...] = jnp.zeros((SUB, LANES), jnp.float32)

    INF = jnp.float32(3e30)

    # ---- frustum pre-cull: conservative per-cluster entry distance over the
    # whole tile, 128 clusters per VPU round (interval arithmetic over the
    # tile's origin/inv-direction bounds) ----
    o_bounds = [(jnp.min(ox), jnp.max(ox)), (jnp.min(oy), jnp.max(oy)),
                (jnp.min(oz), jnp.max(oz))]
    i_bounds = [(jnp.min(idx), jnp.max(idx)), (jnp.min(idy), jnp.max(idy)),
                (jnp.min(idz), jnp.max(idz))]
    tmax_ub = jnp.max(tmax)
    tmin_lb = jnp.min(tmin)
    for r in range(n_rounds):
        sl = slice(r * LANES, (r + 1) * LANES)
        near_lb = None
        far_ub = None
        for ax in range(3):
            lo = cl_cm_ref[ax, sl].reshape(1, LANES)
            hi = cl_cm_ref[ax + 3, sl].reshape(1, LANES)
            (o_l, o_h), (i_l, i_h) = o_bounds[ax], i_bounds[ax]
            prods = [(lo - o_l) * i_l, (lo - o_l) * i_h,
                     (lo - o_h) * i_l, (lo - o_h) * i_h,
                     (hi - o_l) * i_l, (hi - o_l) * i_h,
                     (hi - o_h) * i_l, (hi - o_h) * i_h]
            p_lo = prods[0]
            p_hi = prods[0]
            for q in prods[1:]:
                p_lo = jnp.minimum(p_lo, q)
                p_hi = jnp.maximum(p_hi, q)
            near_lb = p_lo if near_lb is None else jnp.maximum(near_lb, p_lo)
            far_ub = p_hi if far_ub is None else jnp.minimum(far_ub, p_hi)
        near_lb = jnp.maximum(near_lb, tmin_lb)
        ok_r = (near_lb <= far_ub) & (near_lb <= tmax_ub)
        val = jnp.where(ok_r, near_lb, INF)
        near_ref[r * LANES:(r + 1) * LANES, :] = val.reshape(LANES, 1)

    def test_cluster_tris(slot, c):
        def tri_body(t, _):
            w = [scratch[slot, k, t] for k in range(12)]
            oz_p = w[8] * ox + w[9] * oy + w[10] * oz + w[11]
            dz_p = w[8] * dx + w[9] * dy + w[10] * dz
            inv_dz = 1.0 / jnp.where(jnp.abs(dz_p) < 1e-20, 1e-20, dz_p)
            th = -oz_p * inv_dz
            ok = (th > tmin) & (th < t_ref[...])
            px = ox + th * dx
            py = oy + th * dy
            pz = oz + th * dz
            uu = w[0] * px + w[1] * py + w[2] * pz + w[3]
            vv = w[4] * px + w[5] * py + w[6] * pz + w[7]
            ok = ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            if any_hit:
                # occlusion query: any hit ends the lane — collapsing its t
                # to tmin makes every later slab test fail for that lane, and
                # the pick_super live check (max over t) stops the tile once
                # every lane is occluded (shadow rays are half of all work)
                t_ref[...] = jnp.where(ok, tmin, t_ref[...])
            else:
                t_ref[...] = jnp.where(ok, th, t_ref[...])
            code_ref[...] = jnp.where(ok, c * CLUSTER_TRIS + t, code_ref[...])
            u_ref[...] = jnp.where(ok, uu, u_ref[...])
            v_ref[...] = jnp.where(ok, vv, v_ref[...])
            return 0

        # packet gate: each PACKET_TRIS-tri packet carries its own AABB in
        # woop row 12 (accel/clusters.py); an any-lane slab test skips whole
        # packets — the hierarchical in-VMEM stage that removes the dense
        # 128-tri sweep's wasted work (empty/padded packets never run)
        for p in range(N_PACKETS):  # static unroll
            plo = (scratch[slot, 12, 0 * N_PACKETS + p],
                   scratch[slot, 12, 1 * N_PACKETS + p],
                   scratch[slot, 12, 2 * N_PACKETS + p])
            phi = (scratch[slot, 12, 3 * N_PACKETS + p],
                   scratch[slot, 12, 4 * N_PACKETS + p],
                   scratch[slot, 12, 5 * N_PACKETS + p])
            hit_p = _slab(plo, phi, ox, oy, oz, idx, idy, idz, tmin,
                          t_ref[...])

            @pl.when(jnp.any(hit_p))
            def _(p=p):
                # 2x unroll: lets Mosaic overlap the next pair's SMEM
                # component loads (scalar unit) with the current pair's math
                def tri_pair(i, _):
                    tri_body(p * PACKET_TRIS + 2 * i, 0)
                    tri_body(p * PACKET_TRIS + 2 * i + 1, 0)
                    return 0

                jax.lax.fori_loop(0, PACKET_TRIS // 2, tri_pair, 0)

    def _dma(slot, c):
        return pltpu.make_async_copy(woop_hbm.at[c], scratch.at[slot],
                                     sem.at[slot])

    def process_super(s):
        # phase 1: queue this super's clusters passing the precomputed
        # frustum gate against the CURRENT best t (pure scalar work —
        # no per-cluster vector slab tests on the hot path)
        t_cap = jnp.max(t_ref[...])
        nq_ref[0] = 0

        def gather(j, _):
            c = s * SUPER_WAY + j

            # cheap scalar frustum gate first; the exact any-lane slab test
            # (vector) runs only for frustum survivors
            @pl.when(near_ref[c, 0] < t_cap)
            def _():
                clo = (cl_ref[c, 0], cl_ref[c, 1], cl_ref[c, 2])
                chi = (cl_ref[c, 3], cl_ref[c, 4], cl_ref[c, 5])
                hit_c = _slab(clo, chi, ox, oy, oz, idx, idy, idz, tmin,
                              t_ref[...])

                @pl.when(jnp.any(hit_c))
                def _():
                    n = nq_ref[0]
                    queue[n] = c
                    nq_ref[0] = n + 1

            return 0

        jax.lax.fori_loop(0, SUPER_WAY, gather, 0)
        n_q = nq_ref[0]

        # phase 2: double-buffered DMA over the queue — the next cluster's
        # 8 KB burst overlaps the current cluster's triangle sweep (a
        # synchronous start/wait serialized ~2 us of DMA latency per cluster)
        @pl.when(n_q > 0)
        def _():
            _dma(0, queue[0]).start()

            def body(i, _):
                even = jax.lax.rem(i, 2) == 0

                @pl.when(i + 1 < n_q)
                def _():
                    c_next = queue[i + 1]

                    @pl.when(even)
                    def _():
                        _dma(1, c_next).start()

                    @pl.when(~even)
                    def _():
                        _dma(0, c_next).start()

                c = queue[i]

                @pl.when(even)
                def _():
                    _dma(0, c).wait()
                    test_cluster_tris(0, c)

                @pl.when(~even)
                def _():
                    _dma(1, c).wait()
                    test_cluster_tris(1, c)

                return 0

            jax.lax.fori_loop(0, n_q, body, 0)

    # per-super tile entry distances
    def sup_scan(s, _):
        slo = (sup_ref[s, 0], sup_ref[s, 1], sup_ref[s, 2])
        shi = (sup_ref[s, 3], sup_ref[s, 4], sup_ref[s, 5])
        hit_s, near_s = _slab_near(slo, shi, ox, oy, oz, idx, idy, idz,
                                   tmin, t_ref[...])
        sup_t[s] = jnp.min(jnp.where(hit_s, near_s, INF))
        return 0

    jax.lax.fori_loop(0, n_super, sup_scan, 0)

    def pick_super(_k, carry):
        def find(s, best):
            bt, bs = best
            ts = sup_t[s]
            better = ts < bt
            return (jnp.where(better, ts, bt), jnp.where(better, s, bs))

        bt, bs = jax.lax.fori_loop(0, n_super, find, (INF, 0))
        live = bt < jnp.max(t_ref[...])

        @pl.when(live)
        def _():
            sup_t[bs] = INF
            process_super(bs)

        return carry & live

    jax.lax.fori_loop(0, n_super, pick_super, True)


def _coherence_key(cs: ClusterScene, o, d):
    """Sort key restoring tile coherence for incoherent (bounce) batches:
    direction octant (high bits) then 6-bit-per-axis Morton code of the
    origin. The kernel's any-lane pruning only pays off when a tile's rays
    agree on which boxes they can touch — the CUDA reference gets this from
    warp-coherent persistent threads; here a batch sort does the same job."""
    wmin = jnp.min(cs.cluster_boxes[:, 0:3], axis=0)
    wmax = jnp.max(
        jnp.where(cs.cluster_boxes[:, 3:6] > 1e29, -1e30, cs.cluster_boxes[:, 3:6]),
        axis=0,
    )
    q = jnp.clip((o - wmin) / jnp.maximum(wmax - wmin, 1e-9), 0.0, 1.0)
    qi = (q * 63.0).astype(jnp.uint32)                       # 6 bits/axis

    def spread(x):  # canonical 3-D Morton bit spread (<=10-bit inputs)
        x = (x | (x << 16)) & jnp.uint32(0x30000FF)
        x = (x | (x << 8)) & jnp.uint32(0x300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x9249249)
        return x

    morton = spread(qi[:, 0]) | (spread(qi[:, 1]) << 1) | (spread(qi[:, 2]) << 2)
    octant = ((d[:, 0] > 0).astype(jnp.uint32)
              | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
    return (octant << jnp.uint32(18)) | morton


@functools.partial(jax.jit, static_argnames=("any_hit", "sort_rays"))
def intersect_clusters(cs: ClusterScene, o, d, t_min=1e-4, t_max=1e30,
                       any_hit: bool = False, sort_rays: bool = True) -> Hit:
    """Trace a ray batch against a cluster-decomposed scene."""
    if sort_rays:
        key = _coherence_key(cs, o, d)
        order = jnp.argsort(key)
        inv_order = jnp.argsort(order)
        tmin_s = t_min[order] if jnp.ndim(t_min) > 0 else t_min
        tmax_s = t_max[order] if jnp.ndim(t_max) > 0 else t_max
        hit = intersect_clusters(cs, o[order], d[order], tmin_s, tmax_s,
                                 any_hit=any_hit, sort_rays=False)
        return Hit(t=hit.t[inv_order], prim=hit.prim[inv_order],
                   bary=hit.bary[inv_order], valid=hit.valid[inv_order])
    B = o.shape[0]
    n_super = cs.super_boxes.shape[0]
    block = SUB * LANES
    pad = (-B) % block
    Bp = B + pad

    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (B,))
    t_max_b = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(t_max, jnp.float32), 1e30), (B,)
    )
    # clamp tmax to the scene-bbox exit: rays leaving the scene then carry a
    # small best_t, which is what makes the in-kernel early termination and
    # per-box pruning effective (a miss at t=1e30 would disable both)
    wmin = jnp.min(cs.cluster_boxes[:, 0:3], axis=0)
    wmax = jnp.max(
        jnp.where(cs.cluster_boxes[:, 3:6] > 1e29, -1e30, cs.cluster_boxes[:, 3:6]),
        axis=0,
    )
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (wmin - o) * inv
    t1 = (wmax - o) * inv
    exit_t = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_max_b = jnp.minimum(t_max_b, jnp.maximum(exit_t, t_min_b) + 1e-3)
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_min_b, t_max_b]
    rays = jnp.stack([jnp.pad(c, (0, pad)) for c in comps]).reshape(8, Bp // LANES, LANES)

    grid = Bp // block
    nc2 = cs.cluster_boxes_cm.shape[1]
    kernel = functools.partial(_cluster_kernel, n_super=n_super,
                               n_rounds=nc2 // LANES, any_hit=any_hit)
    oshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    oshape_i = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32)
    ospec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    woop_flat = cs.woop  # (NC, 16, CLUSTER_TRIS), tile-aligned for DMA
    t, code, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n_super, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cs.cluster_boxes.shape[0], 6), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, nc2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # woop stays in HBM
        ],
        out_specs=[ospec, ospec, ospec, ospec],
        out_shape=[oshape, oshape_i, oshape, oshape],
        scratch_shapes=[
            pltpu.SMEM((2, 16, CLUSTER_TRIS), jnp.float32),
            pltpu.SMEM((n_super,), jnp.float32),
            pltpu.SMEM((SUPER_WAY,), jnp.int32),
            pltpu.VMEM((nc2, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * 30 * CLUSTER_TRIS * Bp,  # ~40 clusters/tile heuristic
            bytes_accessed=Bp * 48 + int(cs.woop.size) * 4,
            transcendentals=0,
        ),
    )(cs.super_boxes, cs.cluster_boxes, cs.cluster_boxes_cm, rays, woop_flat)

    t = t.reshape(-1)[:B]
    code = code.reshape(-1)[:B]
    u = u.reshape(-1)[:B]
    v = v.reshape(-1)[:B]
    valid = code >= 0
    prim = jnp.where(
        valid, cs.prim.reshape(-1)[jnp.maximum(code, 0)], -1
    )
    return Hit(t=t, prim=prim, bary=jnp.stack([u, v], -1), valid=valid)
