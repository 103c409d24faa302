"""BDPT / VCM cross-validation against the unidirectional path tracer
(render/bdpt.py, render/vcm.py; reference Integrators/Bidirectional/).

All three estimators are unbiased for the same transport, so their
converged images must agree — the round-5 gate for the pack-fused
connection sites."""
import numpy as np
import jax.numpy as jnp

from cudatracerlib_tpu.render.bdpt import BDPTConfig, render_bdpt
from cudatracerlib_tpu.render.path_tracer import PTConfig, render
from cudatracerlib_tpu.render.vcm import VCMConfig, render_vcm
from cudatracerlib_tpu.scene.shapes import cornell_box


def _avg(fn, n, seed0):
    img = None
    for s in range(n):
        x = np.asarray(fn(s + seed0))
        img = x if img is None else img + x
    return img / n


class TestBidirectional:
    def test_bdpt_matches_pt(self):
        scene = cornell_box()
        cfg = PTConfig(max_depth=4, rr_start=99)
        pt = _avg(lambda s: render(scene, 48, 48, 8, s, cfg), 12, 0)
        bd = _avg(lambda s: render_bdpt(scene, 48, 48, 8, s,
                                        BDPTConfig(base=cfg)), 12, 500)
        a = pt.reshape(12, 4, 12, 4, 3).mean((1, 3))
        b = bd.reshape(12, 4, 12, 4, 3).mean((1, 3))
        rel = np.abs(a - b).sum() / np.abs(a).sum()
        assert rel < 0.12, f"BDPT vs PT disagree: rel={rel}"

    def test_vcm_matches_pt(self):
        scene = cornell_box()
        cfg = PTConfig(max_depth=4, rr_start=99)
        pt = _avg(lambda s: render(scene, 48, 48, 8, s, cfg), 12, 0)
        vc = _avg(lambda s: render_vcm(scene, 48, 48, 8, s, s,
                                       VCMConfig(base=cfg)), 12, 900)
        a = pt.reshape(12, 4, 12, 4, 3).mean((1, 3))
        b = vc.reshape(12, 4, 12, 4, 3).mean((1, 3))
        rel = np.abs(a - b).sum() / np.abs(a).sum()
        assert rel < 0.15, f"VCM vs PT disagree: rel={rel}"
