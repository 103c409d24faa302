"""Pallas cluster-stream traversal kernel — the big-scene intersector.

TPU-native replacement for the reference's Aila-Laine persistent-threads BVH
kernel (Kernel/TraceHelper.cu:326-746). v3 design (round 3):

  per 1024-ray block (8 lane-rows of 128, Morton-sorted 5-bit origin +
  5-bit direction key for coherence):
    1. EXACT vectorized slab test of every ray against ALL super boxes:
       boxes on sublanes x rays on lanes, one (NS, 128) VPU pass per row,
       min-reduced across rows -> per-super entry distance for the block
    2. surviving supers in Morton order; per super the same exact test
       against its SUPER_WAY cluster boxes appends survivors to ONE
       block-wide queue via a BRANCHLESS gather (scalar-core loops with
       conditionals cost ~100 cycles/iteration; the ordering machinery an
       earlier revision ran per 128-ray subtile was 70% of total runtime)
    3. the queue drains through a RING-deep DMA pipeline: each cluster's
       (8, 3*CT) Woop block streams HBM->VMEM ~RING ahead of its sweep,
       and the Woop test runs as K=4 fp32 MATMULS on the MXU (one pair per
       lane-row) + (CT, 128) element-wise VPU work. Best-hit state is
       loop-carried SSA values — any ref RMW inside the sweep deoptimizes.

  The winner is selected WITHOUT cross-sublane argmin: the local triangle
  id rides the low TRI_BITS mantissa bits of the t-key (IEEE order is
  monotonic for positive floats), and exact t/u/v are recomputed from the
  winning prim OUTSIDE the kernel.

Why exact (not interval/frustum) culling: the round-3 diagnostic on real
bounce batches measured interval-frustum culling passing ~2,800 clusters
per tile where the exact union is ~74 — incoherent tiles have useless
frustums, and every scalar loop downstream scales with the pass count.

Why MXU triangle tests: round 2's kernel fed triangles through
per-component *scalar* loads (12 SMEM reads per triangle per tile), capping
the 826k-tri config at 0.66 Mrays/s — the scalar core was the pipe. Here
triangle data streams HBM -> VMEM -> MXU and the scalar core only walks
box-test survivors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.clusters import SUPER_WAY, ClusterScene
from ..accel.traversal import Hit

LANES = 128
ROWS = 8          # lane-rows per block; block = ROWS * LANES = 1024 rays
                  # (output tiling requires sublane multiples of 8)
INF = 3e30
TRI_BITS = 10     # low mantissa bits of the t-key carrying the local tri id
RING = 16         # wmat DMA pipeline depth (hides ~1.5 us DMA start latency)
N_BUCKETS = 16    # near-distance buckets for the approximate super ordering
MAX_ORD = 256     # = MAX_CLUSTERS / SUPER_WAY: every super always fits
QMAX = 512        # block-wide cluster queue capacity (drained when full)


import os  # noqa: E402  (CT_* env hooks for .scratch profilers)

# Tuning/debug knobs, read ONCE at import (they parameterize jit-traced
# code, so per-call reads would silently reuse the first compile —
# changing them requires a process restart; round-4 advisor note).
_KEY_OBITS = int(os.environ.get("CT_KEY_OBITS", "3"))
_KEY_DBITS = int(os.environ.get("CT_KEY_DBITS", "7"))
_DEBUG_COUNTS = bool(os.environ.get("CT_DEBUG_COUNTS"))


def _split(x):
    """f32 -> (bf16-representable hi, residual lo) for 3-pass f32 matmuls."""
    xh = x.astype(jnp.bfloat16).astype(jnp.float32)
    return xh, x - xh


def _cluster_kernel(sup_ref, rays_ref, cbox_ref, wmat_hbm, t_ref, code_ref,
                    dbg_ref, wscr, near_scr, supn_scr, queue, qnear, nq_ref,
                    tcap_ref, bt_scr, bc_scr, ord_id, ord_near, bkt_n, ctr,
                    sem, *, n_super, ct, any_hit):
    ctr[0] = 0  # queued
    ctr[1] = 0  # swept
    ctr[2] = 0  # supers processed
    id_mask = (1 << TRI_BITS) - 1

    # ---- per-row ray data (static reads; hoisted out of all loops) ----
    R = []
    for r in range(ROWS):
        ox = rays_ref[r, 0:1, :]
        oy = rays_ref[r, 1:2, :]
        oz = rays_ref[r, 2:3, :]
        dx = rays_ref[r, 3:4, :]
        dy = rays_ref[r, 4:5, :]
        dz = rays_ref[r, 5:6, :]
        tmin = rays_ref[r, 6:7, :]
        tmax = rays_ref[r, 7:8, :]
        idx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
        idy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
        idz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
        o4 = jnp.concatenate(
            [ox, oy, oz, jnp.ones((1, LANES), jnp.float32)], axis=0)
        d4 = jnp.concatenate(
            [dx, dy, dz, jnp.zeros((1, LANES), jnp.float32)], axis=0)
        o4h, o4l = _split(o4)
        d4h, d4l = _split(d4)
        R.append(dict(ox=ox, oy=oy, oz=oz, idx=idx, idy=idy, idz=idz,
                      tmin=tmin, tmax=tmax, o4h=o4h, o4l=o4l,
                      d4h=d4h, d4l=d4l))

    tcap_ref[0] = jnp.max(rays_ref[:, 7, :])

    ones_row = jnp.ones((1, LANES), jnp.float32)

    def _mat(col):
        """Materialize an (N,1) box column as a FULL (N,128) tile via a K=1
        outer product with ones on the MXU. Mosaic lowers an element-wise op
        with a COLUMN-broadcast operand ~500x slower than its FLOPs
        (measured 48 us for ONE (152,128) slab pass); a materialized tile
        takes the normal fast path. DEFAULT precision is safe because the
        boxes are pre-padded at build time beyond bf16 rounding error
        (accel/clusters.py)."""
        return jax.lax.dot_general(
            col, ones_row, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def exact_near(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_fars):
        """(N, 1) box columns vs all ROWS of rays -> per-box min entry over
        passing rays, (N, 1); INF where no ray passes."""
        bx = (_mat(lo_x), _mat(lo_y), _mat(lo_z),
              _mat(hi_x), _mat(hi_y), _mat(hi_z))
        best = None
        for r in range(ROWS):
            rr = R[r]
            t0x = (bx[0] - rr["ox"]) * rr["idx"]
            t1x = (bx[3] - rr["ox"]) * rr["idx"]
            t0y = (bx[1] - rr["oy"]) * rr["idy"]
            t1y = (bx[4] - rr["oy"]) * rr["idy"]
            t0z = (bx[2] - rr["oz"]) * rr["idz"]
            t1z = (bx[5] - rr["oz"]) * rr["idz"]
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), rr["tmin"]),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), t_fars[r]),
            )
            m = jnp.min(jnp.where(near <= far, near, INF), axis=1,
                        keepdims=True)
            best = m if best is None else jnp.minimum(best, m)
        return best

    # ---- stage 1: exact test against ALL super boxes ----
    supn_scr[...] = exact_near(
        sup_ref[:, 0:1], sup_ref[:, 1:2], sup_ref[:, 2:3],
        sup_ref[:, 3:4], sup_ref[:, 4:5], sup_ref[:, 5:6],
        [R[r]["tmax"] for r in range(ROWS)],
    )

    # ---- sweep: one K=4 matmul pair per lane-row, SSA best-hit carry ----
    iota_tri = jax.lax.broadcasted_iota(jnp.int32, (ct, LANES), 0)

    def sweep(slot, c, state):
        w = wscr[slot, 0:4, :]                   # (4, 3*CT)
        wh, wl = _split(w)
        out = []
        for r in range(ROWS):
            bt_val, bc_val = state[r]
            rr = R[r]
            # HIGHEST: the MXU multiplies in bf16 passes by default, which
            # is catastrophic for Woop plane equations; the multi-pass f32
            # decomposition keeps winner selection fp32-accurate
            # 3-pass bf16-split f32 matmuls: hi@hi + (hi@lo + lo@hi).
            # Plain DEFAULT rounds both operands to bf16 (t errors ~0.4%,
            # wrong winners near ties); HIGHEST is exact but 6 passes and
            # measured 2-3x whole-kernel cost. The split gives ~2^-21
            # relative error at half HIGHEST's passes; hi parts are
            # bf16-representable so DEFAULT multiplies them losslessly.
            def mm(a, b):
                return jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            P = mm(wh, rr["o4h"]) + (mm(wh, rr["o4l"]) + mm(wl, rr["o4h"]))
            Q = mm(wh, rr["d4h"]) + (mm(wh, rr["d4l"]) + mm(wl, rr["d4h"]))
            w0 = P[2 * ct:3 * ct, :]
            wd = Q[2 * ct:3 * ct, :]
            wd = jnp.where(jnp.abs(wd) < 1e-20, 1e-20, wd)
            t = -w0 / wd
            ok = (t > rr["tmin"]) & (t < bt_val)
            u = P[0:ct, :] + t * Q[0:ct, :]
            v = P[ct:2 * ct, :] + t * Q[ct:2 * ct, :]
            ok = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            if any_hit:
                anyh = jnp.min(jnp.where(ok, 0.0, INF), axis=0,
                               keepdims=True) < 1.0
                out.append((jnp.where(anyh, rr["tmin"], bt_val),
                            jnp.where(anyh, 0.0, bc_val)))
                continue
            key = pltpu.bitcast(
                (pltpu.bitcast(t, jnp.int32) & ~id_mask) | iota_tri,
                jnp.float32)
            tm = jnp.where(ok, key, INF)
            col_min = jnp.min(tm, axis=0, keepdims=True)
            improved = col_min < bt_val
            out.append((jnp.where(improved, col_min, bt_val),
                        jnp.where(improved, c.astype(jnp.float32), bc_val)))
        return tuple(out)

    def _dma(slot, c):
        return pltpu.make_async_copy(wmat_hbm.at[c], wscr.at[slot],
                                     sem.at[slot])

    def drain_queue():
        """Sweep every queued cluster through a RING-deep DMA pipeline.
        Best-hit state: bt/bc scratch tiles at the boundaries, SSA values
        inside (refs RMW'd per sweep deoptimize; state threaded through the
        outer super loop's conditionals spills 16 vregs per super)."""
        n_q = nq_ref[0]

        ctr[0] = ctr[0] + n_q

        @pl.when(n_q > 0)
        def _():
            state = tuple(
                (bt_scr[r:r + 1, :], bc_scr[r:r + 1, :]) for r in range(ROWS)
            )
            def warm(i, _):
                @pl.when(i < n_q)
                def _():
                    _dma(i, queue[i]).start()

                return 0

            jax.lax.fori_loop(0, RING, warm, 0)

            def body(i, st):
                slot = jax.lax.rem(i, RING)
                _dma(slot, queue[i]).wait()

                # refresh t_cap every RING/2 sweeps (a scalar readback after
                # EVERY sweep stalls the scalar core on the VPU result)
                @pl.when(jax.lax.rem(i, RING // 2) == RING // 2 - 1)
                def _():
                    cap = st[0][0]
                    for r in range(1, ROWS):
                        cap = jnp.maximum(cap, st[r][0])
                    tcap_ref[0] = jnp.max(cap)

                do_it = qnear[i] < tcap_ref[0]
                ctr[1] = ctr[1] + do_it.astype(jnp.int32)
                st = jax.lax.cond(
                    do_it,
                    lambda: sweep(slot, queue[i], st),
                    lambda: st,
                )

                @pl.when(i + RING < n_q)
                def _():
                    _dma(slot, queue[i + RING]).start()

                return st

            state = jax.lax.fori_loop(0, n_q, body, state)
            bt_scr[...] = jnp.concatenate(
                [state[r][0] for r in range(ROWS)], axis=0)
            bc_scr[...] = jnp.concatenate(
                [state[r][1] for r in range(ROWS)], axis=0)

        nq_ref[0] = 0

    def process_super(s):
        base = s * SUPER_WAY
        win = cbox_ref[pl.ds(base, SUPER_WAY), :]
        near_col = exact_near(
            win[:, 0:1], win[:, 1:2], win[:, 2:3],
            win[:, 3:4], win[:, 4:5], win[:, 5:6],
            [R[r]["tmax"] for r in range(ROWS)],
        )
        near_scr[...] = near_col
        t_cap = tcap_ref[0]

        # branchless gather (a conditional append costs ~100 scalar cycles
        # per iteration; the unconditional store + predicated increment ~15)
        def gather(j, n):
            nr = near_scr[j, 0]
            take = nr < t_cap
            queue[n] = base + j
            qnear[n] = nr
            return n + take.astype(jnp.int32)

        nq_ref[0] = jax.lax.fori_loop(0, SUPER_WAY, gather, nq_ref[0])
        ctr[2] = ctr[2] + 1

    # ---- near-ordered surviving-super list via a branchless single-pass
    # bucket (counting) sort: processing supers nearest-first lets t_cap
    # collapse after the first drains, which prunes the far supers — in
    # Morton order a primary block swept ~500 clusters before its first
    # hit tightened anything. All loops are branchless (conditional bodies
    # cost ~100 scalar cycles/iteration; predicated arithmetic ~15).
    t_base = jnp.min(rays_ref[:, 6, :])
    inv_bucket = jnp.float32(N_BUCKETS) / jnp.maximum(
        tcap_ref[0] - t_base, 1e-6)

    def zero_b(b, _):
        bkt_n[b] = 0
        return 0

    jax.lax.fori_loop(0, N_BUCKETS, zero_b, 0)

    def bucket_count(sx, _):
        ns = supn_scr[sx, 0]
        take = (ns < INF).astype(jnp.int32)
        b = jnp.clip((ns - t_base) * inv_bucket, 0,
                     N_BUCKETS - 1).astype(jnp.int32)
        bkt_n[b] = bkt_n[b] + take
        return 0

    jax.lax.fori_loop(0, n_super, bucket_count, 0)

    def prefix(b, acc):
        n = bkt_n[b]
        bkt_n[b] = acc
        return acc + n

    n_sur = jax.lax.fori_loop(0, N_BUCKETS, prefix, jnp.int32(0))

    def scatter_sorted(sx, _):
        ns = supn_scr[sx, 0]
        take = (ns < INF).astype(jnp.int32)
        b = jnp.clip((ns - t_base) * inv_bucket, 0,
                     N_BUCKETS - 1).astype(jnp.int32)
        k = bkt_n[b]
        ord_id[k] = sx
        ord_near[k] = ns
        bkt_n[b] = k + take
        return 0

    jax.lax.fori_loop(0, n_super, scatter_sorted, 0)

    # ---- main loop over near-ordered supers; drain when the queue nears
    # capacity ----
    nq_ref[0] = 0
    bt_scr[...] = rays_ref[:, 7, :]              # per-row tmax
    bc_scr[...] = jnp.full((ROWS, LANES), -1.0, jnp.float32)

    def super_loop(k, _):
        @pl.when(ord_near[k] < tcap_ref[0])
        def _():
            process_super(ord_id[k])

        @pl.when(nq_ref[0] > QMAX - SUPER_WAY)
        def _():
            drain_queue()

        return 0

    jax.lax.fori_loop(0, n_sur, super_loop, 0)
    drain_queue()

    t_ref[...] = bt_scr[...]
    code_ref[...] = bc_scr[...].astype(jnp.int32)
    dbg_ref[...] = jnp.concatenate([
        jnp.full((1, LANES), ctr[0], jnp.float32),
        jnp.full((1, LANES), ctr[1], jnp.float32),
        jnp.full((1, LANES), ctr[2], jnp.float32),
        jnp.full((ROWS - 3, LANES), 0.0, jnp.float32)], axis=0)


def _coherence_key(lo, hi, o, d):
    """Sort key restoring tile coherence for incoherent batches: 5-bit-per-
    axis Morton code of the origin (high 15 bits) then 5-bit-per-axis Morton
    code of the DIRECTION (low 15 bits). The kernel's any-lane pruning only
    pays off when a tile's rays agree on which boxes they can touch — the
    CUDA reference gets this from warp-coherent persistent threads; here a
    batch sort does the same job.

    Round-3 lesson: an earlier key used only the direction OCTANT (3 bits).
    Camera batches share one origin, so 1M primary rays collapsed onto <= 8
    distinct keys and "tiles" became random image-wide mixes — primary rays
    traced no faster than fully random ones. Fine direction bits give
    single-origin batches image-tile locality."""
    # default 3+7 from the round-4 sweep on 826k-tri bounce batches:
    # (obits, dbits) -> Mrays/s: (5,5) 0.87 [round-3 default], (7,3) 0.72,
    # (4,6) 1.15, (3,7) 1.68, (2,8) 1.32, (0,10) 0.52; primary rays also
    # improve 4.7 -> 8.1. Direction locality dominates because the kernel's
    # per-block culling unions over LANES — rays agreeing on direction share
    # a frustum even from a coarse origin cell, while fine origin cells with
    # mixed directions still touch everything in front of them.
    obits, dbits = _KEY_OBITS, _KEY_DBITS
    omax = float((1 << obits) - 1)
    dmax = float((1 << dbits) - 1)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    qi = (q * omax).astype(jnp.uint32)
    dq = jnp.clip((d + 1.0) * 0.5 * dmax, 0.0, dmax).astype(jnp.uint32)

    def spread(x):  # canonical 3-D Morton bit spread (<=10-bit inputs)
        x = (x | (x << 16)) & jnp.uint32(0x30000FF)
        x = (x | (x << 8)) & jnp.uint32(0x300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x9249249)
        return x

    m_o = spread(qi[:, 0]) | (spread(qi[:, 1]) << 1) | (spread(qi[:, 2]) << 2)
    m_d = spread(dq[:, 0]) | (spread(dq[:, 1]) << 1) | (spread(dq[:, 2]) << 2)
    return (m_o << jnp.uint32(3 * dbits)) | m_d


@functools.partial(jax.jit, static_argnames=("any_hit", "sort_rays", "refine"))
def intersect_clusters(cs: ClusterScene, o, d, t_min=1e-4, t_max=1e30,
                       any_hit: bool = False, sort_rays: bool = True,
                       refine: bool = True) -> Hit:
    """Trace a ray batch against a cluster-decomposed scene.

    `refine=False` skips the winner's exact t/u/v recompute (the 12
    per-lane Woop takes, ~25 ms at 1M lanes): the returned t is the
    in-kernel tag-quantized key and bary is zero. Callers on the fused
    shade-pack path recompute exact t/u/v from the pack's Woop columns
    instead (scene/shade_pack.pack_interaction)."""
    wlo, whi = cs.world_bounds
    if sort_rays:
        key = _coherence_key(wlo, whi, o, d)
        order = jnp.argsort(key)
        inv_order = jnp.argsort(order)
        tmin_s = t_min[order] if jnp.ndim(t_min) > 0 else t_min
        tmax_s = t_max[order] if jnp.ndim(t_max) > 0 else t_max
        res = intersect_clusters(cs, o[order], d[order], tmin_s, tmax_s,
                                 any_hit=any_hit, sort_rays=False,
                                 refine=refine)
        hit, dbgv = (res, None) if isinstance(res, Hit) else res
        hit = Hit(t=hit.t[inv_order], prim=hit.prim[inv_order],
                  bary=hit.bary[inv_order], valid=hit.valid[inv_order])
        return hit if dbgv is None else (hit, dbgv)
    B = o.shape[0]
    n_super = cs.cbox.shape[0] // SUPER_WAY
    ns_pad = cs.supT.shape[0]
    ct = cs.wmat.shape[2] // 3
    assert ct <= (1 << TRI_BITS)
    pad = (-B) % (LANES * ROWS)
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

    grid = Bp // (LANES * ROWS)
    kernel = functools.partial(_cluster_kernel, n_super=n_super, ct=ct,
                               any_hit=any_hit)
    oshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    oshape_i = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32)
    ospec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    t, code, dbg = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ns_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs.cbox.shape[0], 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # wmat stays in HBM
        ],
        out_specs=[ospec, ospec, ospec],
        out_shape=[oshape, oshape_i, oshape],
        scratch_shapes=[
            pltpu.VMEM((RING, 8, 3 * ct), jnp.float32),  # wscr
            pltpu.VMEM((SUPER_WAY, 1), jnp.float32),     # near_scr
            pltpu.VMEM((ns_pad, 1), jnp.float32),        # supn_scr
            pltpu.SMEM((QMAX,), jnp.int32),              # queue
            pltpu.SMEM((QMAX,), jnp.float32),            # qnear
            pltpu.SMEM((1,), jnp.int32),                 # nq
            pltpu.SMEM((1,), jnp.float32),               # tcap
            pltpu.VMEM((ROWS, LANES), jnp.float32),      # bt_scr
            pltpu.VMEM((ROWS, LANES), jnp.float32),      # bc_scr
            pltpu.SMEM((MAX_ORD,), jnp.int32),           # ord_id
            pltpu.SMEM((MAX_ORD,), jnp.float32),         # ord_near
            pltpu.SMEM((N_BUCKETS,), jnp.int32),         # bkt_n
            pltpu.SMEM((4,), jnp.int32),                 # ctr (debug)
            pltpu.SemaphoreType.DMA((RING,)),            # sem (wmat)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 4 * 3 * ct * 20 * Bp,  # ~20 clusters/tile heuristic
            bytes_accessed=Bp * 48 + int(cs.wmat.size) * 4,
            transcendentals=0,
        ),
    )(cs.supT, rays, cs.cbox, cs.wmat)

    _dbg_mode = _DEBUG_COUNTS
    t = t.reshape(-1)[:B]
    cluster = code.reshape(-1)[:B]
    valid = cluster >= 0
    if any_hit:
        return Hit(t=t, prim=jnp.where(valid, 0, -1),
                   bary=jnp.zeros((B, 2), jnp.float32), valid=valid)
    # decode (cluster, local tri) from the tagged t-key and recompute the
    # EXACT t/u/v from the winner's Woop rows (12 per-component takes — the
    # in-kernel t is quantized to ~2^-13 relative by the id tag, and the
    # MXU path is a 6-pass f32 approximation; this recompute also upgrades
    # precision to exact fp32)
    local = jax.lax.bitcast_convert_type(t, jnp.int32) & ((1 << TRI_BITS) - 1)
    c_safe = jnp.maximum(cluster, 0)
    code_full = c_safe * ct + jnp.where(valid, local, 0)
    prim = jnp.where(valid, cs.prim.reshape(-1)[code_full], -1)
    if not refine:
        hit = Hit(t=t, prim=prim, bary=jnp.zeros((B, 2), jnp.float32),
                  valid=valid)
        if _dbg_mode:
            return hit, dbg.reshape(-1, ROWS, LANES)[:, 0:3, 0]
        return hit
    wflat = cs.wmat.reshape(-1)
    base = c_safe * (8 * 3 * ct) + jnp.where(valid, local, 0)
    rows = jnp.stack(
        [jnp.take(wflat, base + k * (3 * ct) + r * ct, axis=0)
         for r in range(3) for k in range(4)], axis=-1,
    )  # (B, 12) = [r0(4), r1(4), r2(4)]
    from ..accel.traversal import intersect_woop

    te, ue, ve, _ = intersect_woop(rows, o, d, -jnp.inf, jnp.inf)
    t_out = jnp.where(valid, te, t)
    hit = Hit(t=t_out, prim=prim,
              bary=jnp.stack([jnp.where(valid, ue, 0.0),
                              jnp.where(valid, ve, 0.0)], -1), valid=valid)
    if _dbg_mode:
        return hit, dbg.reshape(-1, ROWS, LANES)[:, 0:3, 0]
    return hit
