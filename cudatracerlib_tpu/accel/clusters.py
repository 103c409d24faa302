"""Cluster decomposition of a BVH for stream-style TPU traversal.

TPU-native redesign of the traversal data layout (SURVEY.md §7 "hard parts"):
instead of per-ray pointer chasing (which TPUs cannot do efficiently), the
scene is cut into *clusters* of <= CLUSTER_TRIS triangles (contiguous
subtrees of the SAH BVH, so they are spatially tight), clusters are sorted on
a Morton curve and grouped into *supers* of SUPER_WAY clusters. The traversal
kernel (ops/cluster_trace.py) culls supers -> clusters with interval/slab
tests over coherent 128-ray tiles and then runs the Woop test of a whole
cluster against the whole tile as a pair of K=4 matmuls on the MXU — the
triangle data streams HBM -> VMEM -> MXU with no scalar-core involvement
(round 2's kernel fed triangles through per-component scalar loads, which
capped it at ~0.7 Mrays/s; see ops/cluster_trace.py).

Data layout per cluster (the MXU form of the Woop test):
  wmat[c] : (8, 3*CT) float32, wmat[c, k, row*CT + i] = Woop row `row` (u=0,
            v=1, w=2) component k (x, y, z, const) of triangle i. Rows 4..7
            are zero padding to the sublane tile. For ray origins O = (4, R)
            rows (ox, oy, oz, 1) and directions D = (4, R) rows (dx, dy, dz,
            0):
               P = wmat[c,:4].T @ O   -> (3*CT, R): u0 | v0 | w0 blocks
               Q = wmat[c,:4].T @ D   -> (3*CT, R): ud | vd | wd blocks
               t = -w0 / wd;  u = u0 + t*ud;  v = v0 + t*vd
            identical math to Kernel/TraceHelper.cu:638-685, restructured so
            the 4-deep contractions run on the MXU and everything else is
            (CT, R) element-wise VPU work.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH, LEAF_SIZE

CLUSTER_TRIS = 128   # padded triangles per cluster (lane-tile aligned)
SUPER_WAY = 64       # clusters per super


class ClusterScene(NamedTuple):
    """Pytree of cluster-decomposed geometry (device arrays)."""

    supT: jnp.ndarray       # (NS_pad, 8) super boxes sublane-major
                            # (lo.xyz, hi.xyz, 2 pad); empty = inverted.
                            # Sublane-major so the kernel can run EXACT
                            # per-ray slab tests with boxes on sublanes and
                            # rays on lanes — the round-3 diagnostic showed
                            # interval/frustum culling passes ~40x more
                            # clusters than the exact union on bounce tiles
    cbox: jnp.ndarray       # (NC_pad, 128) cluster boxes, same layout in
                            # lanes 0..5 (rest zero: DMA slices must be
                            # lane-tile aligned); a super's clusters are the
                            # contiguous window cbox[s*SUPER_WAY:(s+1)*SUPER_WAY]
    wmat: jnp.ndarray       # (NC_pad, 8, 3*CLUSTER_TRIS) MXU Woop blocks
    prim: jnp.ndarray       # (NC_pad, CLUSTER_TRIS) int32 -> bvh-order tri id
    n_clusters: jnp.ndarray  # () int32 (real clusters before padding)

    @property
    def world_bounds(self):
        lo = jnp.min(self.supT[:, 0:3], axis=0)
        hi = jnp.max(jnp.where(self.supT[:, 3:6] < -1e29, -jnp.inf,
                               self.supT[:, 3:6]), axis=0)
        return lo, hi


def _subtree_ranges(nodes: np.ndarray, root: int):
    """For every node, the [begin, end) padded-tri range, via reverse
    iteration (the builder emits parents before children)."""
    M = nodes.shape[0]
    codes = nodes[:, 12:14].view(np.int32)
    begin = np.zeros(M, np.int64)
    end = np.zeros(M, np.int64)

    def leaf_range(code):
        first = -(code + 1)
        return first, first + LEAF_SIZE

    for i in range(M - 1, -1, -1):
        c0, c1 = codes[i, 0], codes[i, 1]
        b0, e0 = leaf_range(c0) if c0 < 0 else (begin[c0], end[c0])
        b1, e1 = leaf_range(c1) if c1 < 0 else (begin[c1], end[c1])
        begin[i] = min(b0, b1)
        end[i] = max(e0, e1)
    return begin, end


MAX_CLUSTERS = 16384  # cbox stays VMEM-resident in the kernel (<= 8 MB)


def build_clusters(bvh: BVH, host: dict | None = None,
                   with_host: bool = False):
    """host: optional {'nodes','woop','root','tris'} numpy dict from
    build_bvh(..., with_host=True) — avoids device readbacks.

    The cluster size doubles from CLUSTER_TRIS until the cluster count fits
    MAX_CLUSTERS (the kernel keeps all cluster boxes in VMEM)."""
    if host is not None:
        nodes, woop, root = host["nodes"], host["woop"], int(host["root"])
    else:
        nodes = np.asarray(jax.device_get(bvh.nodes))
        woop = np.asarray(jax.device_get(bvh.woop))
        root = int(np.asarray(bvh.root_code))
    ct = CLUSTER_TRIS
    while woop.shape[0] / ct > MAX_CLUSTERS * 0.9:
        ct *= 2
    codes = nodes[:, 12:14].view(np.int32)
    begin, end = _subtree_ranges(nodes, max(root, 0))

    # ---- cut: BFS from root; a node becomes a cluster when its padded
    # range fits CLUSTER_TRIS ----
    cl_begin: list[int] = []
    cl_end: list[int] = []
    cl_lo: list[np.ndarray] = []
    cl_hi: list[np.ndarray] = []

    def node_box(i):
        lo = np.minimum(nodes[i, 0:3], nodes[i, 6:9])
        hi = np.maximum(nodes[i, 3:6], nodes[i, 9:12])
        return lo, hi

    def child_box(i, which):
        s = 0 if which == 0 else 6
        return nodes[i, s:s + 3], nodes[i, s + 3:s + 6]

    def emit(b, e, lo, hi):
        cl_begin.append(int(b))
        cl_end.append(int(e))
        cl_lo.append(lo)
        cl_hi.append(hi)

    stack = []
    if root < 0:
        first = -(root + 1)
        tri_lo = woop.shape[0]
        emit(first, min(first + LEAF_SIZE, tri_lo),
             *node_box(0) if nodes.shape[0] else
             (np.zeros(3, np.float32), np.ones(3, np.float32)))
    else:
        stack.append(root)
    while stack:
        i = stack.pop()
        if end[i] - begin[i] <= ct:
            emit(begin[i], end[i], *node_box(i))
            continue
        for which in (0, 1):
            c = codes[i, which]
            if c < 0:
                first = -(c + 1)
                lo, hi = child_box(i, which)
                emit(first, first + LEAF_SIZE, lo, hi)
            elif end[c] - begin[c] <= ct:
                lo, hi = child_box(i, which)
                emit(begin[c], end[c], lo, hi)
            else:
                stack.append(c)

    n_real = len(cl_begin)
    b_arr = np.asarray(cl_begin, np.int64)
    e_arr = np.asarray(cl_end, np.int64)
    lo_all = np.stack(cl_lo).astype(np.float32)
    hi_all = np.stack(cl_hi).astype(np.float32)

    # ---- Morton order on cluster centroids for spatial grouping ----
    cent = 0.5 * (lo_all + hi_all)
    cmin = cent.min(0)
    cext = np.maximum(cent.max(0) - cmin, 1e-9)
    q = np.clip(((cent - cmin) / cext * 1023).astype(np.int64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    order = np.argsort(morton, kind="stable")
    b_arr, e_arr = b_arr[order], e_arr[order]
    lo_all, hi_all = lo_all[order], hi_all[order]

    n_sup = (n_real + SUPER_WAY - 1) // SUPER_WAY
    nc_pad = n_sup * SUPER_WAY

    # ---- triangle gather + MXU layout, fully vectorized ----
    cnt = (e_arr - b_arr)[:, None]                       # (NCr, 1)
    lane = np.arange(ct, dtype=np.int64)[None, :]
    idx = np.where(lane < cnt, b_arr[:, None] + lane, b_arr[:, None])
    gathered = woop[idx]                                 # (NCr, CT, 12)
    wm = gathered.reshape(n_real, ct, 3, 4)
    wm = np.ascontiguousarray(wm.transpose(0, 3, 2, 1))  # (NCr, 4, 3, CT)
    wmat = np.zeros((nc_pad, 8, 3 * ct), np.float32)
    wmat[:n_real, :4] = wm.reshape(n_real, 4, 3 * ct)
    prim = np.zeros((nc_pad, ct), np.int32)
    prim[:n_real] = idx.astype(np.int32)

    # ---- boxes, sublane-major (see ClusterScene docstring) ----
    # Boxes are padded by 0.2% + 1e-5 so the kernel's box arithmetic can run
    # the MXU at DEFAULT (bf16-multiply) precision and stay CONSERVATIVE:
    # bf16 rounding moves a plane by <= 0.4%, always inside the padding.
    ext = (hi_all - lo_all) * 2e-3 + np.abs(lo_all) * 4e-3 + 1e-5
    ext_h = (hi_all - lo_all) * 2e-3 + np.abs(hi_all) * 4e-3 + 1e-5
    boxes6 = np.concatenate([np.full((nc_pad, 3), 1e30, np.float32),
                             np.full((nc_pad, 3), -1e30, np.float32)], axis=1)
    boxes6[:n_real, 0:3] = lo_all - ext
    boxes6[:n_real, 3:6] = hi_all + ext_h
    cbox = np.zeros((nc_pad, 128), np.float32)
    cbox[:, 0:6] = boxes6

    ns_pad = max(((n_sup + 7) // 8) * 8, 8)
    supT = np.zeros((ns_pad, 8), np.float32)
    supT[:, 0:3] = 1e30
    supT[:, 3:6] = -1e30
    real3 = boxes6.reshape(n_sup, SUPER_WAY, 6)
    supT[:n_sup, 0:3] = real3[:, :, 0:3].min(axis=1)
    supT[:n_sup, 3:6] = np.where(
        (real3[:, :, 0] < 1e29).any(axis=1)[:, None],
        real3[:, :, 3:6].max(axis=1), -1e30,
    )

    cs = ClusterScene(
        supT=jnp.asarray(supT),
        cbox=jnp.asarray(cbox),
        wmat=jnp.asarray(wmat),
        prim=jnp.asarray(prim),
        n_clusters=jnp.asarray(np.int32(n_real)),
    )
    if with_host:  # host copies for the scene npz cache (no device readbacks)
        return cs, dict(supT=supT, cbox=cbox, wmat=wmat,
                        prim=prim, n_clusters=np.int32(n_real))
    return cs
