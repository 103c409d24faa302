import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
from cudatracerlib_tpu.render.path_tracer import PTConfig
from cudatracerlib_tpu.render.wavefront import render_wavefront_with_counters
from cudatracerlib_tpu.scene.shapes import glossy_scene

scene = glossy_scene()
cfg = PTConfig(max_depth=5)
W = H = 256; spp = 80
for cap in (1 << 20, 1 << 21):
    img, ctr = render_wavefront_with_counters(scene, W, H, spp, 0, cfg, capacity=cap)
    np.asarray(img)[:1]
    ts = []
    for s in (7, 8):
        t0 = time.perf_counter()
        im2, c2 = render_wavefront_with_counters(scene, W, H, spp, s, cfg, capacity=cap)
        np.asarray(im2)[:1]
        ts.append(time.perf_counter() - t0)
    rays = float(ctr["n_rays"])
    print(f"cap={cap>>20}M: iters={int(ctr['n_iters'])} -> {rays/min(ts)/1e6:.2f} Mrays/s")
