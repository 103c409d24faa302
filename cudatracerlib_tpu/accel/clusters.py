"""Cluster decomposition of a BVH for stream-style TPU traversal.

TPU-native redesign of the traversal data layout (SURVEY.md §7 "hard parts"):
instead of per-ray pointer chasing (which TPUs cannot do efficiently), the
scene is cut into *clusters* of <= CLUSTER_TRIS triangles (contiguous
subtrees of the SAH BVH, so they are spatially tight), clusters are sorted on
a Morton curve and grouped into *supers* of SUPER_WAY clusters. The traversal
kernel (ops/cluster_trace.py) then culls supers -> clusters -> triangles with
dense VPU math over coherent ray tiles, DMA-ing only the touched clusters'
Woop data — the memory-traffic-minimizing ray-stream formulation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH, LEAF_SIZE

CLUSTER_TRIS = 128   # padded triangles per cluster (lane-tile aligned)
SUPER_WAY = 64       # clusters per super
PACKET_TRIS = 16     # triangles per packet (packet-AABB-gated sweep)
N_PACKETS = CLUSTER_TRIS // PACKET_TRIS


class ClusterScene(NamedTuple):
    """Pytree of cluster-decomposed geometry (device arrays)."""

    super_boxes: jnp.ndarray    # (NS, 6) [lo, hi]
    cluster_boxes: jnp.ndarray  # (NS * SUPER_WAY, 6), padded with empty boxes
    cluster_boxes_cm: jnp.ndarray  # (8, NC2) component-major (lo.xyz, hi.xyz,
                                   # pad), NC2 = 128-aligned — frustum pre-cull
    woop: jnp.ndarray           # (NS * SUPER_WAY, 16, CLUSTER_TRIS) — component-major,
                                #  padded to 16 rows for tile-aligned DMA
    prim: jnp.ndarray           # (NS * SUPER_WAY, CLUSTER_TRIS) int32 -> bvh-order tri id
    n_clusters: jnp.ndarray     # () int32 (real clusters before padding)


def _subtree_ranges(nodes: np.ndarray, root: int):
    """For every node, the [begin, end) padded-tri range and box, via iterative
    traversal of the flat child codes."""
    M = nodes.shape[0]
    codes = nodes[:, 12:14].view(np.int32)
    begin = np.zeros(M, np.int64)
    end = np.zeros(M, np.int64)

    # post-order: children before parents; child index > parent index in the
    # emit order? The builder emits parent BEFORE children, so iterate reversed.
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


def build_clusters(bvh: BVH, host: dict | None = None) -> ClusterScene:
    """host: optional {'nodes','woop','root'} numpy dict from build_bvh(...,
    with_host=True) — avoids pulling device arrays back over the interconnect."""
    if host is not None:
        nodes, woop, root = host["nodes"], host["woop"], int(host["root"])
    else:
        nodes = np.asarray(jax.device_get(bvh.nodes))
        woop = np.asarray(jax.device_get(bvh.woop))
        root = int(np.asarray(bvh.root_code))
    P = woop.shape[0]
    codes = nodes[:, 12:14].view(np.int32)
    begin, end = _subtree_ranges(nodes, max(root, 0))

    # cut: BFS from root; a node becomes a cluster when its padded range fits
    clusters = []  # (begin, end, box_lo, box_hi)

    def node_box(i):
        lo = np.minimum(nodes[i, 0:3], nodes[i, 6:9])
        hi = np.maximum(nodes[i, 3:6], nodes[i, 9:12])
        return lo, hi

    def child_box(i, which):
        s = 0 if which == 0 else 6
        return nodes[i, s:s + 3], nodes[i, s + 3:s + 6]

    stack = []
    if root < 0:
        first = -(root + 1)
        clusters.append((first, first + LEAF_SIZE,
                         woop[first:first + LEAF_SIZE, :].reshape(-1, 12), None))
    else:
        stack.append(root)
    while stack:
        i = stack.pop()
        if end[i] - begin[i] <= CLUSTER_TRIS:
            lo, hi = node_box(i)
            clusters.append((int(begin[i]), int(end[i]), lo, hi))
            continue
        for which in (0, 1):
            c = codes[i, which]
            if c < 0:
                first = -(c + 1)
                lo, hi = child_box(i, which)
                clusters.append((int(first), int(first + LEAF_SIZE), lo, hi))
            else:
                if end[c] - begin[c] <= CLUSTER_TRIS:
                    lo, hi = child_box(i, which)
                    clusters.append((int(begin[c]), int(end[c]), lo, hi))
                else:
                    stack.append(c)

    n_real = len(clusters)
    # Morton order on cluster centroids for spatial grouping into supers
    lo_all = np.stack([c[2] for c in clusters])
    hi_all = np.stack([c[3] for c in clusters])
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

    n_sup = (n_real + SUPER_WAY - 1) // SUPER_WAY
    nc_pad = n_sup * SUPER_WAY

    cl_boxes = np.zeros((nc_pad, 6), np.float32)
    cl_boxes[:, 0:3] = 1e30
    cl_boxes[:, 3:6] = -1e30
    cl_woop = np.zeros((nc_pad, CLUSTER_TRIS, 12), np.float32)
    cl_prim = np.zeros((nc_pad, CLUSTER_TRIS), np.int32)
    # per-packet AABBs (world space), inverted for empty/padded packets so
    # the kernel's any-lane packet gate skips them outright
    pk_lo = np.full((nc_pad, N_PACKETS, 3), 1e30, np.float32)
    pk_hi = np.full((nc_pad, N_PACKETS, 3), -1e30, np.float32)
    tris_leaf = host.get("tris") if host is not None else None
    for slot, ci in enumerate(order):
        b, e, lo, hi = clusters[ci]
        cl_boxes[slot, 0:3] = lo
        cl_boxes[slot, 3:6] = hi
        cnt = e - b
        cl_woop[slot, :cnt] = woop[b:e]
        cl_prim[slot, :cnt] = np.arange(b, e)
        if cnt < CLUSTER_TRIS:  # pad by repeating the first triangle
            cl_woop[slot, cnt:] = woop[b]
            cl_prim[slot, cnt:] = b
        if tris_leaf is not None:
            for p in range((cnt + PACKET_TRIS - 1) // PACKET_TRIS):
                seg = tris_leaf[b + p * PACKET_TRIS:
                                b + min((p + 1) * PACKET_TRIS, cnt)]
                pk_lo[slot, p] = seg.reshape(-1, 3).min(0)
                pk_hi[slot, p] = seg.reshape(-1, 3).max(0)
        else:  # no vertex data: gate degrades to the cluster box (always on)
            pk_lo[slot, :] = lo
            pk_hi[slot, :] = hi
    # transpose to component-major and pad 12 -> 16 rows: HBM slices must be
    # sublane-tile (8) aligned for the kernel's per-cluster DMA. Row 12
    # carries the packet AABBs: [lo_x(P), lo_y(P), lo_z(P), hi_x(P), hi_y(P),
    # hi_z(P)] at N_PACKETS stride (ops/cluster_trace.py packet gate).
    cl_woop = np.ascontiguousarray(cl_woop.transpose(0, 2, 1))
    cl_woop = np.concatenate(
        [cl_woop, np.zeros((nc_pad, 4, CLUSTER_TRIS), np.float32)], axis=1
    )
    assert 6 * N_PACKETS <= CLUSTER_TRIS
    cl_woop[:, 12, 0 * N_PACKETS:1 * N_PACKETS] = pk_lo[:, :, 0]
    cl_woop[:, 12, 1 * N_PACKETS:2 * N_PACKETS] = pk_lo[:, :, 1]
    cl_woop[:, 12, 2 * N_PACKETS:3 * N_PACKETS] = pk_lo[:, :, 2]
    cl_woop[:, 12, 3 * N_PACKETS:4 * N_PACKETS] = pk_hi[:, :, 0]
    cl_woop[:, 12, 4 * N_PACKETS:5 * N_PACKETS] = pk_hi[:, :, 1]
    cl_woop[:, 12, 5 * N_PACKETS:6 * N_PACKETS] = pk_hi[:, :, 2]

    sup_boxes = np.zeros((n_sup, 6), np.float32)
    for s in range(n_sup):
        seg = cl_boxes[s * SUPER_WAY:(s + 1) * SUPER_WAY]
        real = seg[:, 0] < 1e29
        if real.any():
            sup_boxes[s, 0:3] = seg[real, 0:3].min(0)
            sup_boxes[s, 3:6] = seg[real, 3:6].max(0)
        else:
            sup_boxes[s, 0:3] = 1e30
            sup_boxes[s, 3:6] = -1e30

    nc2 = ((nc_pad + 127) // 128) * 128
    cl_cm = np.zeros((8, nc2), np.float32)
    cl_cm[0:3, :] = 1e30          # empty boxes never pass the frustum test
    cl_cm[3:6, :] = -1e30
    cl_cm[0:6, :nc_pad] = cl_boxes.T

    return ClusterScene(
        super_boxes=jnp.asarray(sup_boxes),
        cluster_boxes=jnp.asarray(cl_boxes),
        cluster_boxes_cm=jnp.asarray(cl_cm),
        woop=jnp.asarray(cl_woop),
        prim=jnp.asarray(cl_prim),
        n_clusters=jnp.asarray(np.int32(n_real)),
    )
