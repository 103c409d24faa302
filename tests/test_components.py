"""Tests for DynamicScene, material lib, dispersion, samplers, realtime tracers."""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.math import dispersion
from cudatracerlib_tpu.sampling.samplers import (HALTON, SOBOL, STRATIFIED,
                                                 SequenceTable)
from cudatracerlib_tpu.scene import bsdf as B
from cudatracerlib_tpu.scene import lights as L
from cudatracerlib_tpu.scene import material_lib
from cudatracerlib_tpu.scene.dynamic import DynamicScene
from cudatracerlib_tpu.scene.sensors import Camera
from cudatracerlib_tpu.scene.shapes import box, quad


class TestDynamicScene:
    def test_create_update_render(self):
        from cudatracerlib_tpu.render.path_tracer import PTConfig, render

        ds = DynamicScene()
        floor = ds.create_mesh(quad([-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]))
        cube = ds.create_mesh(box([-0.4, -0.4, 0], [0.4, 0.4, 0.8]))
        ds.create_node(floor)
        n_cube = ds.create_node(cube)
        lamp = ds.create_mesh(quad([-0.5, -0.5, 3], [0.5, -0.5, 3], [0.5, 0.5, 3], [-0.5, 0.5, 3])[:, ::-1])
        n_lamp = ds.create_node(lamp)
        ds.make_node_emissive(n_lamp, [15.0, 15.0, 12.0])
        ds.set_camera(Camera.look_at([0, -5, 2], [0, 0, 0.5]))
        scene = ds.update()
        img = np.asarray(render(scene, 24, 24, 4, 0, PTConfig(max_depth=3)))
        assert np.isfinite(img).all() and img.mean() > 0.001

        # mutate: move the cube, re-update (incremental update cycle)
        m = np.eye(4)
        m[0, 3] = 1.0
        ds.set_node_transform(n_cube, m)
        scene2 = ds.update()
        img2 = np.asarray(render(scene2, 24, 24, 4, 0, PTConfig(max_depth=3)))
        assert np.abs(img2 - img).max() > 1e-4  # image changed

        # remove node
        ds.remove_node(n_cube)
        scene3 = ds.update()
        assert scene3.bvh.woop.shape[0] < scene2.bvh.woop.shape[0]

    def test_instancing_shares_mesh(self):
        ds = DynamicScene()
        cube = ds.create_mesh(box([0, 0, 0], [1, 1, 1]))
        for i in range(3):
            m = np.eye(4)
            m[0, 3] = 2.0 * i
            ds.create_node(cube, m)
        ds.create_light({"type": L.CONSTANT_ENV, "radiance": [1, 1, 1]})
        scene = ds.update()
        assert scene.bvh.tri_index.shape[0] >= 36  # 3 instances x 12 tris


class TestMaterialLib:
    def test_conductor_lookup(self):
        eta, k = material_lib.conductor("au")
        assert eta.shape == (3,) and k.shape == (3,)
        with pytest.raises(KeyError):
            material_lib.conductor("unobtainium")

    def test_ior_and_media(self):
        assert abs(material_lib.ior("glass") - 1.5046) < 1e-4
        ss, sa, eta = material_lib.medium("marble")
        assert ss.shape == (3,) and eta == 1.5


class TestDispersion:
    def test_cauchy_monotonic(self):
        n = np.asarray(dispersion.rgb_ior_cauchy("bk7"))
        # blue bends more than red
        assert n[2] > n[1] > n[0]
        assert abs(n[1] - 1.518) < 5e-3

    def test_sellmeier_close_to_cauchy(self):
        n_s = float(dispersion.sellmeier_ior(0.55, *dispersion.SELLMEIER_BK7))
        assert abs(n_s - 1.5185) < 2e-3


class TestSequences:
    @pytest.mark.parametrize("kind", [STRATIFIED, HALTON, SOBOL])
    def test_uniform_and_stratified(self, kind):
        tab = SequenceTable.build(kind, 256, 4)
        t = np.asarray(tab.table)
        assert t.shape == (256, 4)
        assert t.min() >= 0 and t.max() < 1
        # mean close to 0.5, better-than-random discrepancy for halton dim0
        np.testing.assert_allclose(t.mean(axis=0), 0.5, atol=0.06)

    def test_halton_low_discrepancy(self):
        tab = SequenceTable.build(HALTON, 1024, 2)
        t = np.asarray(tab.table)[:, 0]
        # star discrepancy proxy: max gap between sorted points ~ 1/n
        gaps = np.diff(np.sort(t))
        assert gaps.max() < 8.0 / 1024

    def test_rotation_decorrelates_pixels(self):
        tab = SequenceTable.build(HALTON, 64, 2)
        a = np.asarray(tab.sample(jnp.uint32(1), jnp.arange(64), 0))
        b = np.asarray(tab.sample(jnp.uint32(2), jnp.arange(64), 0))
        assert np.abs(a - b).max() > 0.01


class TestRealtime:
    def test_fast_and_game(self):
        from cudatracerlib_tpu.render.realtime import (GTConfig, render_fast,
                                                       render_game)
        from cudatracerlib_tpu.scene.shapes import cornell_box

        scene = cornell_box()
        img, depth = render_fast(scene, 32, 32)
        img, depth = np.asarray(img), np.asarray(depth)
        assert np.isfinite(img).all() and (depth > 0).mean() > 0.7

        psf = None
        means = []
        for f in range(3):
            frame, psf = render_game(scene, psf, 32, 32, f,
                                     GTConfig(radius=0.1, max_gather=8))
            means.append(float(np.asarray(frame).mean()))
        assert all(np.isfinite(m) for m in means)
        assert means[0] > 0.01
