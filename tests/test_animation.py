"""Skinning + BVH refit tests (reference AnimatedMesh/BVHRebuilder parity)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.accel import traversal as tr
from cudatracerlib_tpu.accel.bvh import build_bvh
from cudatracerlib_tpu.accel.refit import (build_refit_plan, refit_bvh,
                                           woop_transform_device)
from cudatracerlib_tpu.accel.bvh import woop_transform


class TestWoopDevice:
    def test_matches_host(self):
        rng = np.random.default_rng(0)
        tris = rng.normal(size=(200, 3, 3)).astype(np.float32)
        host = woop_transform(tris[:, 0], tris[:, 1], tris[:, 2])
        dev = np.asarray(woop_transform_device(jnp.asarray(tris)))
        np.testing.assert_allclose(dev, host, rtol=2e-3, atol=2e-3)


class TestRefit:
    def test_refit_matches_rebuild(self):
        rng = np.random.default_rng(1)
        T = 500
        c = rng.uniform(0, 1, (T, 1, 3))
        tris = (c + rng.uniform(-0.05, 0.05, (T, 3, 3))).astype(np.float32)
        bvh, host = build_bvh(tris, with_host=True)
        plan = build_refit_plan(host["nodes"], host["root"])

        # deform: translate + nonuniform stretch
        order = np.asarray(bvh.tri_index)
        deformed = tris * np.array([1.3, 0.8, 1.0], np.float32) + 0.2
        deformed_leaf = jnp.asarray(deformed[order])

        bvh_refit = refit_bvh(bvh, plan, deformed_leaf)

        B = 1024
        o = jnp.asarray(rng.uniform(-0.3, 1.6, (B, 3)).astype(np.float32))
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)

        h_refit = tr.intersect(bvh_refit, o, d)
        h_truth = tr.intersect_brute_force(bvh_refit, o, d)
        assert (np.asarray(h_refit.valid) == np.asarray(h_truth.valid)).all()
        m = np.asarray(h_refit.valid)
        np.testing.assert_allclose(
            np.asarray(h_refit.t)[m], np.asarray(h_truth.t)[m], rtol=1e-3
        )


class TestSkinning:
    def test_two_bone_rotation(self):
        from cudatracerlib_tpu.scene import bsdf as B
        from cudatracerlib_tpu.scene import lights as L
        from cudatracerlib_tpu.scene.animation import (animate_scene,
                                                       make_skinned,
                                                       skin_vertices)
        from cudatracerlib_tpu.scene.scene import Materials, build_scene
        from cudatracerlib_tpu.scene.sensors import Camera
        from cudatracerlib_tpu.scene.shapes import box
        from cudatracerlib_tpu.scene.scene import Scene

        # beam along +x in [0, 2]: bone 0 owns x<1, bone 1 owns x>=1
        tris = box([0, -0.1, -0.1], [2, 0.1, 0.1])
        mats = Materials.build([{"bsdf_type": B.DIFFUSE}])
        from cudatracerlib_tpu.scene.textures import Textures

        scene = build_scene(
            tris, None, None, np.zeros(len(tris), np.int32), mats,
            Textures.build([{"type": 0, "color_a": [0.5] * 3}]),
            [{"type": L.CONSTANT_ENV, "radiance": [1, 1, 1]}],
            Camera.look_at([1, -4, 0.5], [1, 0, 0]),
        )
        # rig in leaf order
        verts = np.asarray(scene.shading.verts)
        w_b1 = np.clip(verts[..., 0] / 2.0, 0, 1)  # weight toward bone 1 by x
        bone_ids = np.zeros(verts.shape[:2] + (4,), np.int32)
        bone_ids[..., 1] = 1
        weights = np.zeros(verts.shape[:2] + (4,), np.float32)
        weights[..., 0] = 1 - w_b1
        weights[..., 1] = w_b1
        from cudatracerlib_tpu.accel.bvh import build_bvh

        _, host = build_bvh(tris, with_host=True)
        mesh = make_skinned(scene, host["nodes"], host["root"], bone_ids,
                            weights, np.stack([np.eye(4)] * 2))

        # pose: bone 1 rotates 90deg about z at origin -> beam tip bends to +y
        R = np.eye(4, dtype=np.float32)
        R[:2, :2] = [[0, -1], [1, 0]]
        pose = jnp.asarray(np.stack([np.eye(4, dtype=np.float32), R]))
        skinned = np.asarray(skin_vertices(mesh, pose))
        # tip vertices (x ~ 2 at rest) move toward +y
        tip = skinned[np.asarray(verts[..., 0] > 1.9)]
        assert tip[:, 1].mean() > 1.0, tip[:, 1].mean()

        s2 = animate_scene(scene, mesh, pose)
        # box lanes only: lanes 12-13 are int32 child codes bitcast as float
        assert np.isfinite(np.asarray(s2.bvh.nodes)[:, :12]).all()
        # world bounds must cover the bent tip
        assert float(s2.bvh.world_max[1]) > 1.0
