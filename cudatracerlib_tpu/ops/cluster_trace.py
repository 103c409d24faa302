"""Pallas cluster-stream traversal kernel — the big-scene intersector.

TPU-native replacement for the reference's Aila-Laine persistent-threads BVH
kernel (Kernel/TraceHelper.cu:326-746). v2 design (round 3):

  per 128-ray tile (one lane row, Morton+octant sorted for coherence):
    1. interval-arithmetic slab test of the tile against ALL super boxes in
       one vectorized round (supers are component-major in VMEM)
    2. surviving supers, nearest-first: interval test their SUPER_WAY
       cluster boxes (vectorized), then an exact any-lane slab test per
       surviving cluster
    3. each surviving cluster: DMA its (8, 3*CT) Woop block HBM->VMEM
       (double-buffered) and run the whole-cluster x whole-tile Woop test as
       TWO K=4 MATMULS on the MXU + (CT, 128) element-wise VPU work
       (see accel/clusters.py for the wmat layout)

Why v2: round 2's kernel swept triangles through per-component *scalar*
loads (12 SMEM reads per triangle per tile), capping the 826k-tri config at
0.66 Mrays/s — the scalar core was the pipe. v2 streams triangle data
HBM -> VMEM -> MXU, uses 8x smaller ray tiles (128 vs 1024: per-tile cluster
unions shrink toward the per-ray truth -> work-proportionality), and keeps
the scalar core to box gating only. Early termination: per-tile t_cap (max
over lanes of best t) prunes supers/clusters front-to-back.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.clusters import CLUSTER_TRIS, SUPER_WAY, ClusterScene
from ..accel.traversal import Hit

LANES = 128
CT = CLUSTER_TRIS
INF = 3e30
MAX_ORD = 64      # capacity of the near-ordered surviving-super list


def _interval_near_far(lo, hi, b_ref):
    """Conservative [near, far] of a box row-vector pair against the tile's
    interval bounds (o_lo/o_hi, inv_lo/inv_hi per axis + t bounds in b_ref).

    lo/hi: tuples of 3 row vectors (1, N). Returns (near, far) (1, N): if
    near <= far some ray in the tile MAY enter the box (conservative)."""
    near = None
    far = None
    for ax in range(3):
        o_l, o_h = b_ref[2 * ax], b_ref[2 * ax + 1]
        i_l, i_h = b_ref[6 + 2 * ax], b_ref[6 + 2 * ax + 1]
        lo_m_ol = lo[ax] - o_l
        lo_m_oh = lo[ax] - o_h
        hi_m_ol = hi[ax] - o_l
        hi_m_oh = hi[ax] - o_h
        p0 = lo_m_ol * i_l
        p1 = lo_m_ol * i_h
        p2 = lo_m_oh * i_l
        p3 = lo_m_oh * i_h
        p4 = hi_m_ol * i_l
        p5 = hi_m_ol * i_h
        p6 = hi_m_oh * i_l
        p7 = hi_m_oh * i_h
        ax_lo = jnp.minimum(jnp.minimum(jnp.minimum(p0, p1), jnp.minimum(p2, p3)),
                            jnp.minimum(jnp.minimum(p4, p5), jnp.minimum(p6, p7)))
        ax_hi = jnp.maximum(jnp.maximum(jnp.maximum(p0, p1), jnp.maximum(p2, p3)),
                            jnp.maximum(jnp.maximum(p4, p5), jnp.maximum(p6, p7)))
        near = ax_lo if near is None else jnp.maximum(near, ax_lo)
        far = ax_hi if far is None else jnp.minimum(far, ax_hi)
    near = jnp.maximum(near, b_ref[12])   # tmin lower bound
    far = jnp.minimum(far, b_ref[13])     # tmax upper bound
    return near, far


SUBTILES = 8  # independent 128-ray tiles per grid step (block tiling: the
              # out block must be (8, 128); each subtile still culls alone)


def _cluster_kernel(sup_ref, scb_ref, cbox_ref, rays_ref, wmat_hbm, t_ref, code_ref,
                    u_ref, v_ref, wscr, near_scr, supn_scr, bounds, ord_id,
                    ord_near, n_ord, queue, nq_ref, tcap_ref, sem,
                    *, n_super, ns_pad, any_hit):
    def do_tile(st, _):
        return _do_tile(st, sup_ref, scb_ref, cbox_ref, rays_ref, wmat_hbm, t_ref,
                        code_ref, u_ref, v_ref, wscr, near_scr, supn_scr,
                        bounds, ord_id, ord_near, n_ord, queue, nq_ref,
                        tcap_ref, sem, n_super=n_super, ns_pad=ns_pad,
                        any_hit=any_hit)

    jax.lax.fori_loop(0, SUBTILES, do_tile, 0)


def _do_tile(st, sup_ref, scb_ref, cbox_ref, rays_ref, wmat_hbm, t_ref, code_ref,
             u_ref, v_ref, wscr, near_scr, supn_scr, bounds, ord_id,
             ord_near, n_ord, queue, nq_ref, tcap_ref, sem,
             *, n_super, ns_pad, any_hit):
    row = pl.ds(st, 1)
    ox = rays_ref[st, 0:1, :]
    oy = rays_ref[st, 1:2, :]
    oz = rays_ref[st, 2:3, :]
    dx = rays_ref[st, 3:4, :]
    dy = rays_ref[st, 4:5, :]
    dz = rays_ref[st, 5:6, :]
    tmin = rays_ref[st, 6:7, :]
    tmax = rays_ref[st, 7:8, :]
    idx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    idy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    idz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)

    t_ref[row] = tmax
    code_ref[row] = jnp.full((1, LANES), -1, jnp.int32)
    u_ref[row] = jnp.zeros((1, LANES), jnp.float32)
    v_ref[row] = jnp.zeros((1, LANES), jnp.float32)

    # ---- tile interval bounds -> SMEM (o_lo/o_hi, inv_lo/inv_hi, t) ----
    bounds[0] = jnp.min(ox)
    bounds[1] = jnp.max(ox)
    bounds[2] = jnp.min(oy)
    bounds[3] = jnp.max(oy)
    bounds[4] = jnp.min(oz)
    bounds[5] = jnp.max(oz)
    bounds[6] = jnp.min(idx)
    bounds[7] = jnp.max(idx)
    bounds[8] = jnp.min(idy)
    bounds[9] = jnp.max(idy)
    bounds[10] = jnp.min(idz)
    bounds[11] = jnp.max(idz)
    bounds[12] = jnp.min(tmin)
    bounds[13] = jnp.max(tmax)
    tcap_ref[0] = jnp.max(tmax)

    # ---- vectorized interval test of ALL supers (128 per round) ----
    for r in range(ns_pad // LANES):
        sl = slice(r * LANES, (r + 1) * LANES)
        lo = (sup_ref[0, sl].reshape(1, LANES), sup_ref[1, sl].reshape(1, LANES),
              sup_ref[2, sl].reshape(1, LANES))
        hi = (sup_ref[3, sl].reshape(1, LANES), sup_ref[4, sl].reshape(1, LANES),
              sup_ref[5, sl].reshape(1, LANES))
        near, far = _interval_near_far(lo, hi, bounds)
        val = jnp.where(near <= far, near, INF)
        supn_scr[sl, :] = val.reshape(LANES, 1)

    # ---- collect surviving supers into a near-ordered list (selection by
    # repeated insertion is fine: survivors are few) ----
    n_ord[0] = 0

    def collect(s, _):
        ns = supn_scr[s, 0]

        @pl.when(ns < INF)
        def _():
            k = n_ord[0]

            @pl.when(k < MAX_ORD)
            def _():
                ord_id[k] = s
                ord_near[k] = ns
                n_ord[0] = k + 1

        return 0

    jax.lax.fori_loop(0, n_super, collect, 0)
    n_sur = n_ord[0]

    # selection sort by near (n_sur is small; O(n^2) scalar ops)
    def sort_body(i, _):
        def find_min(j, best):
            bi, bv = best
            v = ord_near[j]
            better = v < bv
            return (jnp.where(better, j, bi), jnp.where(better, v, bv))

        bi, bv = jax.lax.fori_loop(i, n_sur, find_min, (i, ord_near[i]))
        ti, tv = ord_id[i], ord_near[i]
        ord_id[i] = ord_id[bi]
        ord_near[i] = bv
        ord_id[bi] = ti
        ord_near[bi] = tv
        return 0

    jax.lax.fori_loop(0, jnp.maximum(n_sur - 1, 0), sort_body, 0)

    # ---- per-cluster MXU sweep ----
    o4 = jnp.concatenate([ox, oy, oz, jnp.ones((1, LANES), jnp.float32)], axis=0)
    d4 = jnp.concatenate([dx, dy, dz, jnp.zeros((1, LANES), jnp.float32)], axis=0)
    iota_tri = jax.lax.broadcasted_iota(jnp.int32, (CT, LANES), 0)

    def sweep(slot, c):
        w = wscr[slot, 0:4, :]                   # (4, 3*CT)
        # HIGHEST: the MXU multiplies in bf16 passes by default, which is
        # catastrophic for Woop plane equations (t errors ~1e-2 relative);
        # the 6-pass f32 decomposition restores fp32-accurate hits
        P = jax.lax.dot_general(
            w, o4, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                        # (3*CT, LANES)
        Q = jax.lax.dot_general(
            w, d4, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        w0 = P[2 * CT:3 * CT, :]
        wd = Q[2 * CT:3 * CT, :]
        wd = jnp.where(jnp.abs(wd) < 1e-20, 1e-20, wd)
        t = -w0 / wd
        ok = (t > tmin) & (t < t_ref[row])       # (CT, LANES) vs (1, LANES)
        u = P[0:CT, :] + t * Q[0:CT, :]
        v = P[CT:2 * CT, :] + t * Q[CT:2 * CT, :]
        ok = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        tm = jnp.where(ok, t, INF)
        col_min = jnp.min(tm, axis=0, keepdims=True)        # (1, LANES)
        improved = col_min < t_ref[row]
        if any_hit:
            # occlusion query: any hit collapses the lane's t to tmin, so
            # every later box/tri test fails for it and the tile stops as
            # soon as t_cap == min(tmin)
            t_ref[row] = jnp.where(improved, tmin, t_ref[row])
            code_ref[row] = jnp.where(improved, 0, code_ref[row])
        else:
            sel = (tm == col_min) & ok
            win = jnp.max(jnp.where(sel, iota_tri, -1), axis=0, keepdims=True)
            sel2 = sel & (iota_tri == win)
            u_best = jnp.sum(jnp.where(sel2, u, 0.0), axis=0, keepdims=True)
            v_best = jnp.sum(jnp.where(sel2, v, 0.0), axis=0, keepdims=True)
            t_ref[row] = jnp.where(improved, col_min, t_ref[row])
            code_ref[row] = jnp.where(improved, c * CT + win, code_ref[row])
            u_ref[row] = jnp.where(improved, u_best, u_ref[row])
            v_ref[row] = jnp.where(improved, v_best, v_ref[row])

    def _dma(slot, c):
        return pltpu.make_async_copy(wmat_hbm.at[c], wscr.at[slot],
                                     sem.at[slot])

    def process_super(s):
        # interval test of this super's SUPER_WAY cluster boxes (vectorized)
        lo = (scb_ref[s, 0, :].reshape(1, SUPER_WAY),
              scb_ref[s, 1, :].reshape(1, SUPER_WAY),
              scb_ref[s, 2, :].reshape(1, SUPER_WAY))
        hi = (scb_ref[s, 3, :].reshape(1, SUPER_WAY),
              scb_ref[s, 4, :].reshape(1, SUPER_WAY),
              scb_ref[s, 5, :].reshape(1, SUPER_WAY))
        near, far = _interval_near_far(lo, hi, bounds)
        near_scr[...] = jnp.where(near <= far, near, INF).reshape(SUPER_WAY, 1)

        t_cap = tcap_ref[0]
        nq_ref[0] = 0

        def gather(j, _):
            @pl.when(near_scr[j, 0] < t_cap)
            def _():
                # exact any-lane slab test before paying the DMA + sweep
                # (cbox is the sublane-major copy: dynamic-sublane scalar
                # reads lower; dynamic-lane reads of scb would not)
                c_id = s * SUPER_WAY + j
                clo = (cbox_ref[c_id, 0], cbox_ref[c_id, 1], cbox_ref[c_id, 2])
                chi = (cbox_ref[c_id, 3], cbox_ref[c_id, 4], cbox_ref[c_id, 5])
                t0x = (clo[0] - ox) * idx
                t1x = (chi[0] - ox) * idx
                t0y = (clo[1] - oy) * idy
                t1y = (chi[1] - oy) * idy
                t0z = (clo[2] - oz) * idz
                t1z = (chi[2] - oz) * idz
                near_e = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tmin),
                )
                far_e = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), t_ref[row]),
                )

                @pl.when(jnp.any(near_e <= far_e))
                def _():
                    n = nq_ref[0]
                    queue[n] = s * SUPER_WAY + j
                    nq_ref[0] = n + 1

            return 0

        jax.lax.fori_loop(0, SUPER_WAY, gather, 0)
        n_q = nq_ref[0]

        # double-buffered DMA over the queue: the next cluster's 12 KB burst
        # overlaps the current cluster's MXU sweep
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
                    sweep(0, c)

                @pl.when(~even)
                def _():
                    _dma(1, c).wait()
                    sweep(1, c)

                return 0

            jax.lax.fori_loop(0, n_q, body, 0)
            tcap_ref[0] = jnp.max(t_ref[row])

    # ---- ordered main loop over surviving supers ----
    def super_loop(k, _):
        @pl.when(ord_near[k] < tcap_ref[0])
        def _():
            process_super(ord_id[k])

        return 0

    jax.lax.fori_loop(0, n_sur, super_loop, 0)

    # overflow beyond the ordered-list capacity: rare (MAX_ORD supers =
    # 4096+ clusters touched by one 128-ray tile); process in scan order
    @pl.when(n_sur >= MAX_ORD)
    def _():
        def extra(s, _):
            @pl.when((supn_scr[s, 0] < tcap_ref[0])
                     & (supn_scr[s, 0] < INF))
            def _():
                def seen(k, acc):
                    return acc | (ord_id[k] == s)

                already = jax.lax.fori_loop(0, n_sur, seen, False)

                @pl.when(~already)
                def _():
                    process_super(s)

            return 0

        jax.lax.fori_loop(0, n_super, extra, 0)

    return 0


def _coherence_key(lo, hi, o, d):
    """Sort key restoring tile coherence for incoherent (bounce) batches:
    direction octant (high bits) then 6-bit-per-axis Morton code of the
    origin. The kernel's any-lane pruning only pays off when a tile's rays
    agree on which boxes they can touch — the CUDA reference gets this from
    warp-coherent persistent threads; here a batch sort does the same job."""
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
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
    wlo, whi = cs.world_bounds
    if sort_rays:
        key = _coherence_key(wlo, whi, o, d)
        order = jnp.argsort(key)
        inv_order = jnp.argsort(order)
        tmin_s = t_min[order] if jnp.ndim(t_min) > 0 else t_min
        tmax_s = t_max[order] if jnp.ndim(t_max) > 0 else t_max
        hit = intersect_clusters(cs, o[order], d[order], tmin_s, tmax_s,
                                 any_hit=any_hit, sort_rays=False)
        return Hit(t=hit.t[inv_order], prim=hit.prim[inv_order],
                   bary=hit.bary[inv_order], valid=hit.valid[inv_order])
    B = o.shape[0]
    n_super = cs.scb.shape[0]
    ns_pad = cs.super_cm.shape[1]
    pad = (-B) % (LANES * 8)
    Bp = B + pad

    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (B,))
    t_max_b = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(t_max, jnp.float32), 1e30), (B,)
    )
    # clamp tmax to the scene-bbox exit: rays leaving the scene then carry a
    # small best_t, which is what makes the in-kernel early termination and
    # per-box pruning effective (a miss at t=1e30 would disable both)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (wlo - o) * inv
    t1 = (whi - o) * inv
    exit_t = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_max_b = jnp.minimum(t_max_b, jnp.maximum(exit_t, t_min_b) + 1e-3)
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_min_b, t_max_b]
    rays = jnp.stack([jnp.pad(c, (0, pad)) for c in comps])
    rays = rays.reshape(8, Bp // LANES, LANES).transpose(1, 0, 2)

    grid = Bp // (LANES * 8)
    kernel = functools.partial(_cluster_kernel, n_super=n_super,
                               ns_pad=ns_pad, any_hit=any_hit)
    oshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    oshape_i = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32)
    ospec = pl.BlockSpec((8, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    t, code, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, ns_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_super, 8, SUPER_WAY), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs.cbox.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # wmat stays in HBM
        ],
        out_specs=[ospec, ospec, ospec, ospec],
        out_shape=[oshape, oshape_i, oshape, oshape],
        scratch_shapes=[
            pltpu.VMEM((2, 8, 3 * CT), jnp.float32),     # wscr
            pltpu.VMEM((SUPER_WAY, 1), jnp.float32),     # near_scr
            pltpu.VMEM((ns_pad, 1), jnp.float32),        # supn_scr
            pltpu.SMEM((16,), jnp.float32),              # bounds
            pltpu.SMEM((MAX_ORD,), jnp.int32),           # ord_id
            pltpu.SMEM((MAX_ORD,), jnp.float32),         # ord_near
            pltpu.SMEM((1,), jnp.int32),                 # n_ord
            pltpu.SMEM((SUPER_WAY,), jnp.int32),         # queue
            pltpu.SMEM((1,), jnp.int32),                 # nq
            pltpu.SMEM((1,), jnp.float32),               # tcap
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 4 * 3 * CT * 20 * Bp,  # ~20 clusters/tile heuristic
            bytes_accessed=Bp * 48 + int(cs.wmat.size) * 4,
            transcendentals=0,
        ),
    )(cs.super_cm, cs.scb, cs.cbox, rays, cs.wmat)

    t = t.reshape(-1)[:B]
    code = code.reshape(-1)[:B]
    u = u.reshape(-1)[:B]
    v = v.reshape(-1)[:B]
    valid = code >= 0
    prim = jnp.where(
        valid, cs.prim.reshape(-1)[jnp.maximum(code, 0)], -1
    )
    return Hit(t=t, prim=prim, bary=jnp.stack([u, v], -1), valid=valid)
