"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Covers BASELINE §2.8: DP over rays/pixels, film psum, gradient all-reduce,
and the config-5 sharded photon (light) pass with photon all-gather.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.parallel.shard import (make_mesh, make_sharded_ppm,
                                              make_sharded_render,
                                              make_train_step,
                                              replicate_scene)
from cudatracerlib_tpu.render.path_tracer import PTConfig, render
from cudatracerlib_tpu.render.ppm import PPMConfig, render_ppm_pass
from cudatracerlib_tpu.scene.shapes import cornell_box


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


def block_mean(img, b=4):
    h, w, _ = img.shape
    return img.reshape(h // b, b, w // b, b, 3).mean((1, 3))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
class TestShardedRender:
    def test_matches_single_device(self, cornell):
        W = H = 32
        cfg = PTConfig(max_depth=4, rr_start=99)
        mesh = make_mesh(n_dp=4, n_sp=2)
        scene = replicate_scene(cornell, mesh)
        fn = make_sharded_render(mesh, W, H, 8, cfg)
        img_s = np.asarray(fn(scene, jnp.uint32(3)))
        img_1 = np.asarray(render(cornell, W, H, 8, 3, cfg))
        # same estimator, different RNG partitioning: statistical agreement
        rel = np.abs(block_mean(img_s) - block_mean(img_1)).sum() / np.abs(
            block_mean(img_1)).sum()
        assert np.isfinite(img_s).all()
        assert rel < 0.15, rel


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
class TestShardedPPM:
    def test_photon_allgather_matches_single_device(self, cornell):
        W = H = 32
        cfg = PPMConfig(base=PTConfig(max_depth=5, rr_start=2),
                        n_photons=1 << 14, radius0=0.08, max_gather=160,
                        grid_res=12)
        mesh = make_mesh(n_dp=4, n_sp=2)
        scene = replicate_scene(cornell, mesh)
        fn = make_sharded_ppm(mesh, W, H, 4, cfg)

        from cudatracerlib_tpu.render.ppm import progressive_radius

        img_s = np.zeros((H, W, 3))
        img_1 = np.zeros((H, W, 3))
        n = 3
        for i in range(n):
            r = progressive_radius(jnp.float32(cfg.radius0), jnp.float32(i))
            img_s += np.asarray(fn(scene, jnp.uint32(i), r)) / n
            img_1 += np.asarray(
                render_ppm_pass(cornell, W, H, 4, i, i, cfg)) / n
        rel = np.abs(block_mean(img_s) - block_mean(img_1)).sum() / np.abs(
            block_mean(img_1)).sum()
        assert np.isfinite(img_s).all()
        assert rel < 0.2, rel


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
class TestShardedTraining:
    def test_loss_decreases(self, cornell):
        W = H = 16
        mesh = make_mesh(n_dp=8, n_sp=1)
        scene = replicate_scene(cornell, mesh)
        cfg = PTConfig(max_depth=3, rr_start=99)
        target = np.asarray(render(cornell, W, H, 16, 0, cfg))
        # perturb the albedo; training should pull the loss down
        pert = scene._replace(
            textures=scene.textures._replace(
                color_a=scene.textures.color_a * 0.5))
        step = make_train_step(mesh, W, H, 8, jnp.asarray(target), lr=0.2,
                               config=cfg)
        losses = []
        s = pert
        for i in range(6):
            s, loss = step(s, jnp.uint32(100 + i))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses
