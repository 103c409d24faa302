"""Fused shade-gather: one-hot MXU contraction replacing per-lane gathers.

The round-4 profile (BASELINE.md) measured the glossy bounce spread across
~8 XLA stages whose shared cost is per-lane dynamic gathers at ~10
cycles/element — make_interaction (~25 takes), the winner Woop decode (12
takes), gather_mat_params (24-field select chains). The same data moved as
one-hot MXU contractions is 10-40x cheaper per element (measured round 4 on
the env CDF). This module is the structural answer (VERDICT r4 item 1): ALL
per-triangle shading attributes are packed into ONE (Tp, C) table at trace
time, and a single Pallas kernel gathers every column for the whole ray
batch as a blocked one-hot matmul:

    out[b, :] = onehot(idx[b]) @ table          (B, C) in one kernel pass

    * the one-hot tile ((BR, BT) bf16, exact: entries are 0/1) is built on
      the VPU from a broadcasted iota compare and never touches HBM;
    * the table is pre-split into (hi, lo) bf16 pairs (hi = bf16(x),
      lo = bf16(x - hi)): each product has exactly ONE nonzero term, so the
      f32 accumulation is exact per part and hi + lo reconstructs ~17
      mantissa bits — int columns (ids < 2^16) reconstruct EXACTLY;
    * the full split table lives in VMEM across the whole grid (the block
      index map is constant, so Pallas fetches it once), which caps the
      applicable table size at ~16k rows — the mid-size-scene band the
      cluster intersector serves (big scenes are flat-shaded; see
      scene/bigscene.py).

Counterpart of the reference reading TriangleData/Material inline in the
megakernel (Kernel/TraceHelper.cu:274-307 fillDG + Engine/Material.h:38) —
in-register there, through the MXU here.

The op is linear in the table, so the custom VJP is a scatter-add of the
output cotangent (exact); gradients w.r.t. material/vertex tables keep
flowing for inverse rendering.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 512      # rays per grid step
BT = 512      # table rows per inner matmul tile
MAX_ROWS = 16384   # table rows above which the VMEM-resident design is off


def _kernel(idx_ref, table_ref, out_ref, *, n_tiles, c):
    idx = idx_ref[:, 0]                                   # (BR,)

    def tile(t, acc):
        base = t * BT
        col = jax.lax.broadcasted_iota(jnp.int32, (BR, BT), 1) + base
        oh = (col == idx[:, None]).astype(jnp.bfloat16)   # (BR, BT) exact
        tb = table_ref[pl.ds(base, BT), :]                # (BT, 2c) bf16
        return acc + jnp.dot(oh, tb, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n_tiles, tile, jnp.zeros((BR, 2 * c), jnp.float32))
    # COLUMN-major output (C, BR): consumers slice out[col] -> contiguous
    # (B,) vectors. A (B, C) output forced every downstream (B, 1)/(B, 3)
    # temp into 128-lane-padded T(8,128) tiles — 42-128x HBM expansion per
    # temp, which OOMed the glossy config at 1M lanes.
    out_ref[:, :] = (acc[:, :c] + acc[:, c:]).T           # hi + lo


@functools.partial(jax.jit, static_argnames=())
def _gather_tpu(table, idx):
    Tr, C = table.shape
    B = idx.shape[0]
    Tp = (Tr + BT - 1) // BT * BT
    Bp = (B + BR - 1) // BR * BR
    hi = table.astype(jnp.bfloat16)
    lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    split = jnp.concatenate([hi, lo], axis=1)             # (Tr, 2C)
    split = jnp.pad(split, ((0, Tp - Tr), (0, 0)))
    idx_p = jnp.pad(jnp.clip(idx, 0, Tr - 1), (0, Bp - B))[:, None]

    out = pl.pallas_call(
        functools.partial(_kernel, n_tiles=Tp // BT, c=C),
        grid=(Bp // BR,),
        in_specs=[
            pl.BlockSpec((BR, 1), lambda i: (i, 0)),
            pl.BlockSpec((Tp, 2 * C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((C, BR), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((C, Bp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(100e6),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Tp * 2 * C,
            bytes_accessed=Bp * (4 + 4 * C) + Tp * 4 * C,
            transcendentals=0,
        ),
    )(idx_p, split)
    return out[:, :B]


@jax.custom_vjp
def packed_gather(table, idx):
    """out[:, b] = table[clip(idx[b]), :] — (Tr, C) f32 x (B,) int32 ->
    (C, B) COLUMN-major (out[c] is a contiguous (B,) per-column vector).

    TPU: one-hot MXU kernel (~17-bit mantissa on float columns, exact on
    int-valued columns < 2^16). CPU/fallback: plain takes. Linear in
    `table`, so grads scatter-add through exactly.
    """
    return _gather_fwd_value(table, idx)


def _gather_fwd_value(table, idx):
    if (jax.devices()[0].platform not in ("cpu",)
            and table.shape[0] <= MAX_ROWS):
        return _gather_tpu(table, idx)
    from ..scene.scene import gather_rows

    return gather_rows(table, jnp.clip(idx, 0, table.shape[0] - 1)).T


def _gather_fwd(table, idx):
    return _gather_fwd_value(table, idx), (table.shape, idx)


def _gather_bwd(res, g):
    shape, idx = res
    grad = jnp.zeros(shape, g.dtype).at[
        jnp.clip(idx, 0, shape[0] - 1)].add(g.T)
    return grad, None


packed_gather.defvjp(_gather_fwd, _gather_bwd)
