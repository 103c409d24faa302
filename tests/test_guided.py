"""Path-guiding tests: histogram training, sampling exactness, unbiasedness.

The guided estimator must match the plain path tracer for ANY guiding
content (one-sample MIS correctness) — that is the main gate.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.render.guided import (Guiding, _dir_to_uv,
                                             _guided_pdf, _guided_sample,
                                             _uv_to_dir, make_guiding,
                                             render_guided, train_guiding)
from cudatracerlib_tpu.render.path_tracer import PTConfig, render
from cudatracerlib_tpu.scene.shapes import cornell_box


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


def block_mean(img, b=4):
    h, w, _ = img.shape
    return img.reshape(h // b, b, w // b, b, 3).mean((1, 3))


class TestDirectionMap:
    def test_roundtrip_and_area(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(1000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        uv = _dir_to_uv(jnp.asarray(d.astype(np.float32)))
        d2 = np.asarray(_uv_to_dir(uv))
        np.testing.assert_allclose(d2, d, atol=1e-3)
        # equal-area: uniform uv -> uniform directions (z uniform in [-1, 1])
        uvs = jnp.asarray(rng.uniform(size=(20000, 2)).astype(np.float32))
        z = np.asarray(_uv_to_dir(uvs))[:, 2]
        assert abs(z.mean()) < 0.02
        assert abs((z > 0.5).mean() - 0.25) < 0.02


class TestTraining:
    def test_histogram_populates(self, cornell):
        g = make_guiding(cornell, res=6)
        cfg = PTConfig(max_depth=5, rr_start=2)
        g = train_guiding(cornell, g, 1 << 14, 0, cfg)
        h = np.asarray(g.hist)
        assert h.sum() > 0
        assert (h >= 0).all()
        # many cells should have data in a closed box
        assert (h.sum(1) > 0).mean() > 0.05

    def test_sample_pdf_consistency(self, cornell):
        g = make_guiding(cornell, res=4)
        g = train_guiding(cornell, g, 1 << 14, 1, PTConfig(max_depth=5, rr_start=2))
        rng = np.random.default_rng(2)
        # pick points in populated cells
        p = jnp.asarray(rng.uniform([-0.9, 0.1, 0.1], [0.9, 1.9, 1.9],
                                    (512, 3)).astype(np.float32))
        u1 = jnp.asarray(rng.uniform(size=512).astype(np.float32))
        u2 = jnp.asarray(rng.uniform(size=(512, 2)).astype(np.float32))
        d, pdf_s, usable = _guided_sample(g, p, u1, u2)
        pdf_e = _guided_pdf(g, p, d)
        m = np.asarray(usable)
        np.testing.assert_allclose(np.asarray(pdf_s)[m], np.asarray(pdf_e)[m],
                                   rtol=1e-4)
        # sampled directions are unit
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d)[m], axis=1), 1.0, atol=1e-4)


class TestGuidedUnbiased:
    def test_matches_path_tracer(self, cornell):
        W = H = 32
        cfg = PTConfig(max_depth=5, rr_start=99)
        g = make_guiding(cornell, res=6)
        for i in range(2):
            g = train_guiding(cornell, g, 1 << 14, i, PTConfig(max_depth=5, rr_start=2))
        img_g = np.zeros((H, W, 3))
        img_p = np.zeros((H, W, 3))
        n = 4
        for i in range(n):
            img_g += np.asarray(render_guided(cornell, g, W, H, 16, i, cfg)) / n
            img_p += np.asarray(render(cornell, W, H, 16, i + 100, cfg)) / n
        rel = np.abs(block_mean(img_g) - block_mean(img_p)).sum() / np.abs(
            block_mean(img_p)).sum()
        assert np.isfinite(img_g).all()
        assert rel < 0.1, rel

    def test_empty_guiding_matches_pt(self, cornell):
        # a = 0 everywhere (no data): guided walk degenerates to pure BSDF
        W = H = 24
        cfg = PTConfig(max_depth=4, rr_start=99)
        g = make_guiding(cornell, res=4)
        img_g = np.asarray(render_guided(cornell, g, W, H, 32, 3, cfg))
        img_p = np.asarray(render(cornell, W, H, 32, 3, cfg))
        rel = np.abs(block_mean(img_g) - block_mean(img_p)).sum() / np.abs(
            block_mean(img_p)).sum()
        assert rel < 0.08, rel
