"""DynamicScene: the mutable host-side scene database.

Counterpart of reference ``Engine/DynamicScene.{h,cpp}`` (DynamicScene.h:40 —
owns all streams; CreateNode/CreateLight/CreateVolume/setEnvironementMap;
UpdateScene flushes dirty ranges + rebuilds the scene BVH,
DynamicScene.cpp:480-556) and the instance `Node` concept
(SceneTypes/Node.h:13).

TPU design: mutation happens host-side on numpy staging arrays; `update()` is
the single host->device boundary — it rebuilds the BVH (native C++ builder),
re-derives clusters/light CDF and emits a fresh immutable Scene pytree (the
KernelDynamicScene analogue). Instances are flattened at update time
(transform baked into vertices): replication costs memory but keeps traversal
single-level — the TPU-side TLAS is the cluster decomposition itself.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import bsdf as B
from . import lights as L
from .scene import Materials, Scene, build_scene
from .sensors import Camera
from .textures import Textures


@dataclass
class MeshHandle:
    mesh_id: int
    vertices: np.ndarray          # (T, 3, 3)
    normals: Optional[np.ndarray]
    uvs: Optional[np.ndarray]


@dataclass
class NodeHandle:
    """An instanced mesh placement (reference Node: mesh idx + material set)."""

    node_id: int
    mesh_id: int
    to_world: np.ndarray          # (4, 4)
    mat_record: dict
    light_radiance: Optional[np.ndarray] = None  # area emitter on this node


class DynamicScene:
    def __init__(self):
        self._meshes: dict[int, MeshHandle] = {}
        self._nodes: dict[int, NodeHandle] = {}
        self._lights: list[dict] = []
        self._env_map: Optional[np.ndarray] = None
        self._camera = Camera.look_at([0, -5, 1], [0, 0, 1])
        self._tex_records: list[dict] = [{"type": 0, "color_a": [0.7] * 3}]
        self._next_id = 0
        self._dirty = True
        self._scene: Optional[Scene] = None

    # ---- creation API (reference CreateNode/CreateLight/...) ----

    def create_mesh(self, vertices, normals=None, uvs=None) -> MeshHandle:
        self._next_id += 1
        h = MeshHandle(self._next_id, np.asarray(vertices, np.float32), normals, uvs)
        self._meshes[h.mesh_id] = h
        self._dirty = True
        return h

    def create_node(self, mesh: MeshHandle, to_world=None,
                    mat_record: Optional[dict] = None) -> NodeHandle:
        self._next_id += 1
        h = NodeHandle(
            self._next_id, mesh.mesh_id,
            np.asarray(to_world if to_world is not None else np.eye(4), np.float64),
            dict(mat_record or {"bsdf_type": B.DIFFUSE, "tex_albedo": 0}),
        )
        self._nodes[h.node_id] = h
        self._dirty = True
        return h

    def remove_node(self, node: NodeHandle) -> None:
        self._nodes.pop(node.node_id, None)
        self._dirty = True

    def set_node_transform(self, node: NodeHandle, to_world) -> None:
        node.to_world = np.asarray(to_world, np.float64)
        self._dirty = True

    def create_light(self, record: dict) -> int:
        self._lights.append(dict(record))
        self._dirty = True
        return len(self._lights) - 1

    def make_node_emissive(self, node: NodeHandle, radiance) -> None:
        """Attach an area emitter to a node (reference createShape+emitter)."""
        node.light_radiance = np.asarray(radiance, np.float32)
        self._dirty = True

    def set_environment_map(self, env: np.ndarray, radiance=(1.0, 1.0, 1.0)) -> None:
        self._env_map = np.asarray(env, np.float32)
        self.create_light({"type": L.INFINITE, "radiance": radiance})

    def set_camera(self, camera: Camera) -> None:
        self._camera = camera
        self._dirty = True

    def add_texture(self, record: dict) -> int:
        self._tex_records.append(dict(record))
        self._dirty = True
        return len(self._tex_records) - 1

    # ---- update cycle (reference UpdateScene) ----

    def update(self) -> Scene:
        """Flush all mutations into a fresh device Scene pytree."""
        if not self._dirty and self._scene is not None:
            return self._scene
        parts, norms, uvs, mids = [], [], [], []
        mat_records: list[dict] = []
        light_records = [dict(r) for r in self._lights]
        for node in self._nodes.values():
            mesh = self._meshes[node.mesh_id]
            m = node.to_world
            v = (mesh.vertices.reshape(-1, 3) @ m[:3, :3].T + m[:3, 3]).reshape(
                -1, 3, 3).astype(np.float32)
            n = mesh.normals
            if n is not None:
                nm = np.linalg.inv(m[:3, :3]).T
                n = (np.asarray(n).reshape(-1, 3) @ nm.T).reshape(-1, 3, 3)
                n = (n / np.maximum(np.linalg.norm(n, -1, keepdims=True), 1e-12)
                     ).astype(np.float32)
            rec = dict(node.mat_record)
            if node.light_radiance is not None:
                rec["emission"] = node.light_radiance
                rec["light_id"] = len(light_records)
                light_records.append({
                    "type": L.AREA_LIGHT, "radiance": node.light_radiance,
                    "tris": v,
                })
            mid = len(mat_records)
            mat_records.append(rec)
            parts.append(v)
            norms.append(n)
            uvs.append(mesh.uvs)
            mids.extend([mid] * len(v))

        if not parts:
            raise ValueError("DynamicScene has no nodes")
        vertices = np.concatenate(parts)
        normals = (np.concatenate([n if n is not None else _face_n(p)
                                   for n, p in zip(norms, parts)]))
        all_uvs = np.concatenate([u if u is not None else _default_uv(len(p))
                                  for u, p in zip(uvs, parts)])
        self._scene = build_scene(
            vertices, normals, all_uvs, np.asarray(mids, np.int32),
            Materials.build(mat_records), Textures.build(self._tex_records),
            light_records, self._camera, env_map=self._env_map,
        )
        self._dirty = False
        return self._scene


def _face_n(v):
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return np.repeat(n[:, None, :], 3, axis=1).astype(np.float32)


def _default_uv(t):
    uv = np.zeros((t, 3, 2), np.float32)
    uv[:, 1, 0] = 1.0
    uv[:, 2, 1] = 1.0
    return uv
