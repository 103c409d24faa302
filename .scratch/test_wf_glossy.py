import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax.numpy as jnp
from cudatracerlib_tpu.render.path_tracer import PTConfig
from cudatracerlib_tpu.render.wavefront import render_wavefront_with_counters
from cudatracerlib_tpu.scene.shapes import glossy_scene

scene = glossy_scene()
cfg = PTConfig(max_depth=5)
W = H = 256; spp = 16
# 5 passes worth of supply in ONE wavefront run: spp=80
img, ctr = render_wavefront_with_counters(scene, W, H, spp*5, 0, cfg)
img = np.asarray(img); rays = float(ctr["n_rays"]); iters = int(ctr["n_iters"])
print("mean:", img.mean(), "rays:", rays, "iters:", iters)

def run(seed=7):
    r, c = render_wavefront_with_counters(scene, W, H, spp*5, seed, cfg)[0], None
    np.asarray(r)[:1]
ts = []
for _ in range(3):
    t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
print("times:", [round(t,3) for t in ts], "->", round(rays/min(ts)/1e6, 2), "Mrays/s")
