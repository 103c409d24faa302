"""Instance-level TLAS: per-instance transforms at traversal time.

Counterpart of the reference's two-level scene BVH
(Engine/SceneBVH_device.h:9-16 — per-node transform + inverse arrays;
Engine/DynamicScene.cpp:480-556 — update cycle; SceneTypes/Node.h:13), which
transforms the ray into each instance's object space at the TLAS leaf
(Kernel/TraceHelper.cu:528-712) instead of duplicating geometry.

TPU translation: the instance list is STRUCTURAL — a tuple of per-mesh
`InstanceGroup`s aligned with a tuple of per-mesh `BlasEntry`s, so the
instance loop unrolls at trace time (static shapes everywhere; no dynamic
TLAS walk). Each instance intersects the full ray batch against its mesh's
BLAS with the ray mapped by the instance's world->object affine transform —
an affine map preserves the ray parameter, so object-space t IS world-space
t and best-hit merging needs no rescaling. The running best t feeds each
subsequent BLAS call's t_max, so the cluster kernel's internal early-out
prunes across instances (nearest-first would prune best; instances are
swept in creation order).

Memory is O(meshes), not O(instances x mesh): the win the reference's TLAS
exists for. Compile/trace time is O(total instances); this path is built
for moderate instance counts (tens), the flattening path (scene/dynamic.py)
remains the default for few-instance scenes where duplication is cheap.

The winning instance rides the hit record without changing `Hit`:
`prim_global = inst_index * T_pad + prim_local`, with T_pad the largest
BLAS padded-triangle count (static). `make_interaction` decodes it and maps
normals/tangents object->world per lane.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import traversal as traversal_mod
from ..accel.bvh import BVH
from ..accel.clusters import ClusterScene
from ..accel.traversal import Hit


class BlasEntry(NamedTuple):
    """One unique mesh's bottom-level acceleration structure."""

    bvh: BVH
    clusters: ClusterScene | None


class InstanceGroup(NamedTuple):
    """All instances of one mesh (aligned index-wise with the blas tuple).

    Arrays are per-instance; `prim_base` is the mesh's row offset into the
    concatenated object-space shading tables (an array so it stays a pytree
    leaf; its value is per-mesh, replicated per instance)."""

    to_object: jnp.ndarray   # (Ik, 3, 4) world->object affine rows
    to_world: jnp.ndarray    # (Ik, 3, 4) object->world affine rows
    mat_id: jnp.ndarray      # (Ik,) int32 per-instance material
    prim_base: jnp.ndarray   # (Ik,) int32 shading-row offset of this mesh


def instance_tpad(blas: tuple) -> int:
    """Static per-instance prim stride (largest padded BLAS tri count)."""
    return max(int(e.bvh.woop.shape[0]) for e in blas)


def _xform_point(M, p):
    return p @ M[:, :3].T + M[:, 3]


def _xform_dir(M, d):
    return d @ M[:, :3].T


def _intersect_blas(entry: BlasEntry, o, d, t_min, t_max, any_hit):
    """Size-dispatched BLAS intersect (mirrors scene.scene_intersect)."""
    platform = jax.devices()[0].platform
    mode = traversal_mod.force_intersect_mode()
    use_cluster = (mode == "cluster"
                   or (not mode and entry.clusters is not None))
    if use_cluster and entry.clusters is not None and platform != "cpu":
        from ..ops.cluster_trace import intersect_clusters

        sg = jax.lax.stop_gradient
        raw = intersect_clusters(sg(entry.clusters), sg(o), sg(d), sg(t_min),
                                 sg(t_max), any_hit=any_hit)
        if any_hit:
            return raw
        return traversal_mod.refine_hit(entry.bvh, o, d, raw)
    return traversal_mod.intersect_auto(entry.bvh, o, d, t_min, t_max,
                                        any_hit=any_hit)


def intersect_instances(blas: tuple, groups: tuple, o, d, t_min, t_max,
                        any_hit: bool = False) -> Hit:
    """Two-level intersect: unrolled instance loop over BLAS calls.

    Returns a Hit whose `prim` packs (instance index, local prim) as
    `inst * T_pad + prim_local` (decode with `instance_tpad`)."""
    B = o.shape[0]
    tpad = instance_tpad(blas)
    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (B,)) + 0.0
    best_prim = jnp.full((B,), -1, jnp.int32)
    best_bary = jnp.zeros((B, 2), jnp.float32)
    found = jnp.zeros((B,), bool)
    inst = 0
    for entry, grp in zip(blas, groups):
        for i in range(grp.to_object.shape[0]):
            M = grp.to_object[i]
            oo = _xform_point(M, o)
            od = _xform_dir(M, d)
            h = _intersect_blas(entry, oo, od, t_min,
                                t_max if any_hit else best_t, any_hit)
            if any_hit:
                found = found | h.valid
            else:
                better = h.valid & (h.t < best_t)
                best_t = jnp.where(better, h.t, best_t)
                best_prim = jnp.where(better, inst * tpad + h.prim, best_prim)
                best_bary = jnp.where(better[:, None], h.bary, best_bary)
                found = found | better
            inst += 1
    if any_hit:
        return Hit(t=jnp.where(found, t_min, t_max),
                   prim=jnp.where(found, 0, -1),
                   bary=jnp.zeros((B, 2), jnp.float32), valid=found)
    return Hit(t=best_t, prim=best_prim, bary=best_bary, valid=found)


def flat_instance_arrays(groups: tuple):
    """(to_object (I,3,4), to_world (I,3,4), mat_id (I,), prim_base (I,))
    concatenated in the packed-inst-index order."""
    cat = lambda f: jnp.concatenate([getattr(g, f) for g in groups], axis=0)
    return cat("to_object"), cat("to_world"), cat("mat_id"), cat("prim_base")


def decode_hit(groups: tuple, tpad: int, hit: Hit):
    """(inst_id, local_prim, shading_row) from a packed instanced Hit."""
    prim = jnp.maximum(hit.prim, 0)
    inst = prim // tpad
    local = prim - inst * tpad
    _, _, _, prim_base = flat_instance_arrays(groups)
    from .scene import small_gather

    row = small_gather(prim_base, inst) + local
    return inst, local, row


def build_instance_groups(records, prim_bases):
    """Host-side constructor. `records`: per mesh, a list of
    (to_world (4,4) float64, mat_id int); `prim_bases`: per mesh int row
    offset into the concatenated shading tables."""
    groups = []
    for recs, base in zip(records, prim_bases):
        tw = np.stack([np.asarray(m, np.float64)[:3, :4] for m, _ in recs])
        to_obj = []
        for m, _ in recs:
            m4 = np.asarray(m, np.float64)
            inv = np.linalg.inv(m4)
            to_obj.append(inv[:3, :4])
        groups.append(InstanceGroup(
            to_object=jnp.asarray(np.stack(to_obj), jnp.float32),
            to_world=jnp.asarray(tw, jnp.float32),
            mat_id=jnp.asarray(np.asarray([mid for _, mid in recs], np.int32)),
            prim_base=jnp.asarray(
                np.full(len(recs), base, np.int32)),
        ))
    return tuple(groups)
