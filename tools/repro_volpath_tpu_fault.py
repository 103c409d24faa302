"""Minimal repro for the XLA:TPU whole-program volpath fault (round 4).

Signature (bisected in round 4, commit d8d298e): a volumetric path-tracing
program that compiles >= 4 bounces of {heterogeneous-grid distance sampling
via delta-tracking + surface intersection} into ONE XLA program crashes the
TPU worker (process-fatal, not a Python exception) on TPU v5e. The fault is
independent of the intersector (Pallas dense, XLA while-loop oracle, brute
force), of lax.scan vs unrolled bounces, and of the tracking loop form
(lax.while_loop vs fixed-trip lax.scan, CT_TRACK_SCAN). The IDENTICAL math
dispatched as one jit program per bounce (render_vol_stepwise) runs clean —
which is the shipped workaround (bench.py config 4).

Usage:
    python tools/repro_volpath_tpu_fault.py          # safe: stepwise only
    python tools/repro_volpath_tpu_fault.py --fused  # EXPECT WORKER CRASH

Run `--fused` only to re-test the upstream fault (e.g. after a libtpu/XLA
update); if it ever completes cleanly, the workaround can be retired —
flip bench_volume back to the fused renderer and delete this script.
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax.numpy as jnp

from cudatracerlib_tpu.render.path_tracer import PTConfig, specialize_config
from cudatracerlib_tpu.render.volpath import render_vol, render_vol_stepwise
from cudatracerlib_tpu.scene import media as M
from cudatracerlib_tpu.scene.shapes import cornell_box


def build():
    scene = cornell_box()
    lo = np.asarray(scene.bvh.world_min)
    hi = np.asarray(scene.bvh.world_max)
    rng = np.random.default_rng(0)
    dens = rng.random((8, 8, 8)).astype(np.float32) + 0.5
    medium = M.Media.build([
        dict(type=M.GRID, sigma_a=[0.05] * 3, sigma_s=[0.5] * 3,
             box_min=lo + 0.05, box_max=hi - 0.05, phase_g=0.3,
             density=dens)
    ])
    cfg = specialize_config(scene, PTConfig(max_depth=5))  # >= 4 triggers
    return scene, medium, cfg


def main():
    fused = "--fused" in sys.argv
    scene, medium, cfg = build()
    if fused:
        print("compiling the FUSED >=4-bounce volpath program "
              "(round-4 signature: TPU worker crash, no Python traceback)",
              flush=True)
        img = render_vol(scene, medium, 32, 32, 2, 0, cfg)
        print("fused mean:", float(np.asarray(img).mean()))
        print("FUSED PATH COMPLETED — the upstream fault appears fixed; "
              "consider retiring render_vol_stepwise as the bench path.")
    else:
        img = render_vol_stepwise(scene, medium, 32, 32, 2, 1, 0, cfg)
        print("stepwise mean:", float(np.asarray(img).mean()),
              "(clean, as expected)")


if __name__ == "__main__":
    main()
