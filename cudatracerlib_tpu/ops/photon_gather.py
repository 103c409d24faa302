"""Photon-major density estimation — the PPM eye-pass gather as a
query-block x photon-tile sweep with MXU reductions.

TPU-native replacement for the query-major neighbor gather
(accel/hashgrid.query_sphere + per-attribute (B, K) dynamic gathers), which
the round-4 profile priced at ~0.8 s per map per pass: every photon
attribute moved at ~10 cycles/element through XLA dynamic gathers
(BASELINE.md, VERDICT r4 item 2). Counterpart of the reference's grid range
query (SurfEstimators/EntryEstimator.h:25-59) — a linked-list walk per
query there; here the join runs photon-major:

  * photons are sorted by grid cell (one multi-operand lax.sort — no
    per-attribute permutation gathers) and packed into (n_tiles, PT, 16)
    HBM tiles with per-tile AABBs;
  * per 256-query block, every tile AABB is distance-tested against the
    block's query bounding box (vectorized, then a branchless scalar
    append builds the surviving-tile queue — the cluster_trace idiom);
  * surviving tiles stream HBM->VMEM through a RING-deep DMA pipeline and
    the pairwise work runs dense: d^2 and the normal agreement as
    broadcast VPU ops over (PT, BQ) tiles, the flux reduction as ONE
    bf16-split f32 matmul (4, PT) @ (PT, BQ) per tile.

Scope: the DIFFUSE-gather-surface estimate (f = albedo/pi does not depend
on the photon direction, so the per-pair BSDF eval factors out of the
kernel). Scenes whose smooth surfaces include glossy lobes keep the
query-major path (render/ppm.py dispatches statically).

The kernel returns per-query [sum w*flux_rgb, sum w] with
w = max(1 - d^2/r^2, 0) * [n_q . n_p > 0.7]; the caller applies the
Epanechnikov normalization 2/(pi r^2) and albedo/pi.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256       # queries per grid step
PT = 512       # photons per tile
RING = 8       # DMA pipeline depth
FAR = 1.0e15   # padding-position sentinel (FAR^2 stays finite in f32)
NORMAL_MIN_DOT = 0.7


def _split(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _kernel(q_ref, aabb_ref, ph_hbm, out_ref, wscr, sem, queue, surv_scr,
            *, n_tiles):
    # ---- query columns (BQ, 1) ----
    qcol = lambda c: q_ref[:, c:c + 1]
    r2 = q_ref[0, 6]

    # ---- block query AABB (cols 8-10: pos with invalid -> -FAR for max;
    # cols 0-2 carry invalid -> +FAR so they never shrink the min) ----
    blo = (jnp.min(qcol(0)), jnp.min(qcol(1)), jnp.min(qcol(2)))
    bhi = (jnp.max(qcol(8)), jnp.max(qcol(9)), jnp.max(qcol(10)))

    # ---- vectorized tile cull: squared AABB-AABB distance vs r^2 ----
    lo = aabb_ref[:, 0:3]
    hi = aabb_ref[:, 3:6]
    dist = jnp.zeros((aabb_ref.shape[0], 1), jnp.float32)
    for ax in range(3):
        gap = jnp.maximum(jnp.maximum(lo[:, ax:ax + 1] - bhi[ax],
                                      blo[ax] - hi[:, ax:ax + 1]), 0.0)
        dist = dist + gap * gap
    surv_scr[...] = (dist <= r2).astype(jnp.float32)

    # ---- branchless surviving-tile queue (conditional appends cost ~100
    # scalar cycles/iter; unconditional store + predicated bump ~15) ----
    def gather(j, n):
        take = surv_scr[j, 0] > 0.0
        queue[n] = j
        return n + take.astype(jnp.int32)

    n_q = jax.lax.fori_loop(0, n_tiles, gather, jnp.int32(0))

    def _dma(slot, c):
        return pltpu.make_async_copy(ph_hbm.at[c], wscr.at[slot],
                                     sem.at[slot])

    ones_row = jnp.ones((1, PT), jnp.float32)

    def mat(col):
        """(BQ, 1) query column -> dense (BQ, PT) tile via a K=1 MXU outer
        product (Mosaic's column-broadcast element-wise path is ~500x
        slower than its FLOPs; see cluster_trace._mat). Once per BLOCK,
        not per tile — query attrs are loop constants. hi/lo split: the
        DEFAULT bf16 rounding of positions (abs error ~4e-3 at unit scale)
        swamps d^2 at gather radii ~0.03 — w was off by orders of
        magnitude before the split."""
        h, l = _split(col)
        one = ones_row.astype(jnp.bfloat16)

        def mm(a):
            return jax.lax.dot_general(a, one, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        return mm(h) + mm(l)

    qxm, qym, qzm = mat(qcol(0)), mat(qcol(1)), mat(qcol(2))
    qnxm, qnym, qnzm = mat(qcol(3)), mat(qcol(4)), mat(qcol(5))
    q2m = qxm * qxm + qym * qym + qzm * qzm

    acc0 = jnp.zeros((BQ, 8), jnp.float32)

    def warm(i, _):
        @pl.when(i < n_q)
        def _():
            _dma(i, queue[i]).start()

        return 0

    jax.lax.fori_loop(0, RING, warm, 0)

    def body(i, acc):
        slot = jax.lax.rem(i, RING)
        _dma(slot, queue[i]).wait()
        ph = wscr[slot]                       # (16, PT); rows broadcast
        d2 = (ph[3:4, :] + q2m
              - 2.0 * (qxm * ph[0:1, :] + qym * ph[1:2, :]
                       + qzm * ph[2:3, :]))
        w = jnp.maximum(1.0 - d2 / r2, 0.0)   # Epanechnikov support
        ndot = (qnxm * ph[7:8, :] + qnym * ph[8:9, :] + qnzm * ph[9:10, :])
        w = jnp.where(ndot > NORMAL_MIN_DOT, w, 0.0)
        # photon direction on the query's front side (the BSDF eval's
        # wi_local.z > 0 test in the query-major path); wi == 0 (test
        # tiles built without directions) passes through
        wdot = (qnxm * ph[10:11, :] + qnym * ph[11:12, :]
                + qnzm * ph[12:13, :])
        w = jnp.where(wdot >= 0.0, w, 0.0)
        # flux reduction over photons (lanes): (BQ, PT) x (8, PT) -> (BQ, 8)
        # rows flux_rgb + ones (sum w). bf16-split 3-pass f32 (hi@hi +
        # hi@lo + lo@hi): DEFAULT would round flux AND weights to 8
        # mantissa bits.
        pw = jnp.concatenate(
            [ph[4:7, :], ones_row,
             jnp.zeros((4, PT), jnp.float32)], axis=0)      # (8, PT)
        pwh, pwl = _split(pw)
        wh, wl = _split(w)

        def mm(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        contrib = mm(wh, pwh) + (mm(wh, pwl) + mm(wl, pwh))  # (BQ, 8)

        @pl.when(i + RING < n_q)
        def _():
            _dma(slot, queue[i + RING]).start()

        return acc + contrib

    acc = jax.lax.fori_loop(0, n_q, body, acc0)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=())
def photon_density_tpu(tiles, aabbs, q_pos, q_n, q_valid, radius):
    """Per-query [flux_r, flux_g, flux_b, sum_w] — see module docstring.

    tiles: (n_tiles, 16, PT) f32 (build_photon_tiles); aabbs (n_tiles, 8);
    q_pos/q_n (B, 3); q_valid (B,); radius scalar."""
    B = q_pos.shape[0]
    n_tiles = tiles.shape[0]
    Bp = (B + BQ - 1) // BQ * BQ
    r2 = jnp.maximum(radius * radius, 1e-20)

    pos_min = jnp.where(q_valid[:, None], q_pos, FAR)
    pos_max = jnp.where(q_valid[:, None], q_pos, -FAR)
    cols = jnp.zeros((Bp, 16), jnp.float32)
    cols = cols.at[:B, 0:3].set(pos_min)
    cols = cols.at[:B, 3:6].set(q_n)
    cols = cols.at[:, 6].set(r2)
    cols = cols.at[:B, 8:11].set(pos_max)
    cols = cols.at[B:, 0:3].set(FAR)
    cols = cols.at[B:, 8:11].set(-FAR)

    out = pl.pallas_call(
        functools.partial(_kernel, n_tiles=n_tiles),
        grid=(Bp // BQ,),
        in_specs=[
            pl.BlockSpec((BQ, 16), lambda i: (i, 0)),
            pl.BlockSpec((n_tiles, 8), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BQ, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RING, 16, PT), jnp.float32),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SMEM((max(n_tiles, 8),), jnp.int32),
            pltpu.VMEM((n_tiles, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(100e6),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * 20 * PT * 16,
            bytes_accessed=Bp * 64 + int(tiles.size) * 4,
            transcendentals=0,
        ),
    )(cols, aabbs, tiles)
    return out[:B, 0:3], out[:B, 3]


def build_photon_tiles(pos, power, normal, valid, box_min, box_max,
                       res: int, wi=None):
    """Sort photons by grid cell and pack into kernel tiles.

    ONE multi-operand lax.sort moves every attribute with the key (no
    per-attribute permutation gathers). Returns (tiles (n_tiles, 16, PT)
    f32, aabbs (n_tiles, 8) f32). `wi` (P, 3): photon incoming direction
    for the front-side test (zeros disable it)."""
    P = pos.shape[0]
    if wi is None:
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), pos.shape)
    box_min = jnp.asarray(box_min, jnp.float32)
    box_max = jnp.asarray(box_max, jnp.float32)
    inv_cell = res / jnp.maximum(box_max - box_min, 1e-9)
    q = jnp.clip(jnp.floor((pos - box_min) * inv_cell).astype(jnp.int32),
                 0, res - 1)
    cid = (q[:, 0] * res + q[:, 1]) * res + q[:, 2]
    cid = jnp.where(valid, cid, res ** 3)     # invalid sort to the tail

    ops = (cid, pos[:, 0], pos[:, 1], pos[:, 2],
           power[:, 0], power[:, 1], power[:, 2],
           normal[:, 0], normal[:, 1], normal[:, 2],
           valid.astype(jnp.float32),
           wi[:, 0], wi[:, 1], wi[:, 2])
    s = jax.lax.sort(ops, num_keys=1)
    sv = s[10] > 0.5
    sx = jnp.where(sv, s[1], FAR)
    sy = jnp.where(sv, s[2], FAR)
    sz = jnp.where(sv, s[3], FAR)
    p2 = sx * sx + sy * sy + sz * sz

    Pp = (P + PT - 1) // PT * PT
    pad = lambda x, v: jnp.pad(x, (0, Pp - P), constant_values=v)
    attrs = [pad(sx, FAR), pad(sy, FAR), pad(sz, FAR),
             pad(p2, FAR * FAR),
             pad(jnp.where(sv, s[4], 0.0), 0.0),
             pad(jnp.where(sv, s[5], 0.0), 0.0),
             pad(jnp.where(sv, s[6], 0.0), 0.0),
             pad(s[7], 0.0), pad(s[8], 0.0), pad(s[9], 0.0),
             pad(s[11], 0.0), pad(s[12], 0.0), pad(s[13], 0.0)]
    attrs += [jnp.zeros((Pp,), jnp.float32)] * 3
    # (n_tiles, 16, PT): attribute ROWS with photons on the lane dim (the
    # DMA'd minor dimension must be 128-aligned)
    tiles = jnp.stack(attrs, axis=0).reshape(16, Pp // PT, PT) \
               .transpose(1, 0, 2)

    vm = pad(sv.astype(jnp.float32), 0.0).reshape(Pp // PT, 1, PT)
    pos_t = tiles[:, 0:3, :]
    lo = jnp.min(jnp.where(vm > 0, pos_t, FAR), axis=2)    # (n_tiles, 3)
    hi = jnp.max(jnp.where(vm > 0, pos_t, -FAR), axis=2)
    aabbs = jnp.concatenate(
        [lo, hi, jnp.zeros((Pp // PT, 2), jnp.float32)], axis=1)
    return tiles, aabbs
