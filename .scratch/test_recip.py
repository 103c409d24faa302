import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.render.path_tracer import PTConfig
from cudatracerlib_tpu.render.wavefront import render_wavefront_with_counters
from cudatracerlib_tpu.scene.shapes import glossy_scene

scene = glossy_scene()
cfg = PTConfig(max_depth=5)
img, ctr = render_wavefront_with_counters(scene, 256, 256, 80, 0, cfg)
np.asarray(img)[:1]
ts = []
for s in (7, 8):
    t0 = time.perf_counter()
    im2, _ = render_wavefront_with_counters(scene, 256, 256, 80, s, cfg)
    np.asarray(im2)[:1]
    ts.append(time.perf_counter() - t0)
rays = float(ctr["n_rays"])
print(f"glossy wavefront: {rays/min(ts)/1e6:.2f} Mrays/s (mean {float(np.asarray(img).mean()):.5f})")
