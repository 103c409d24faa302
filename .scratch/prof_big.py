import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax.numpy as jnp
from cudatracerlib_tpu.render.path_tracer import PTConfig
from cudatracerlib_tpu.render.wavefront import render_wavefront_with_counters
from cudatracerlib_tpu.scene.bigscene import build_big_scene

scene = build_big_scene()
cfg = PTConfig(max_depth=5)
W = H = 512; spp = 16
t0 = time.perf_counter()
img, ctr = render_wavefront_with_counters(scene, W, H, spp, 0, cfg)
img = np.asarray(img)
print(f"warm+compile {time.perf_counter()-t0:.1f}s  iters={int(ctr['n_iters'])} rays={float(ctr['n_rays'])/1e6:.1f}M")
ts = []
for s in (7, 8):
    t0 = time.perf_counter()
    im2, c2 = render_wavefront_with_counters(scene, W, H, spp, s, cfg)
    np.asarray(im2)[:1]
    ts.append(time.perf_counter() - t0)
rays = float(ctr['n_rays'])
print(f"times {['%.2f'%t for t in ts]} -> {rays/min(ts)/1e6:.2f} Mrays/s  ({rays/1e6:.1f}M rays, {int(ctr['n_iters'])} iters, {min(ts)/int(ctr['n_iters'])*1000:.0f} ms/iter)")
