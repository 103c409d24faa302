import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from cudatracerlib_tpu.render.path_tracer import PTConfig, render_counted, render_progressive
from cudatracerlib_tpu.scene.shapes import glossy_scene
from cudatracerlib_tpu.scene import shade_pack

if len(sys.argv) > 1 and sys.argv[1] == "nopack":
    shade_pack.pack_enabled = lambda *a, **k: False

scene = glossy_scene()
cfg = PTConfig(max_depth=5)
img, rays = render_counted(scene, 256, 256, 16, 3, cfg)
img = np.asarray(img)
print("rays:", float(rays), "mean:", img.mean(), "var:", img.var())

def run(seed=np.uint32(7)):
    r = render_progressive(scene, 256, 256, 16, 5, seed, cfg)
    np.asarray(r)[:1]
run(np.uint32(0))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
print("pass5 times:", [round(t,3) for t in ts], "->", round(float(rays)*5/min(ts)/1e6, 2), "Mrays/s")
np.save(".scratch/pack_img.npy" if len(sys.argv)<=1 else ".scratch/nopack_img.npy", img)
