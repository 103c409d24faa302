import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from cudatracerlib_tpu.render.path_tracer import PTConfig, render_counted
from cudatracerlib_tpu.scene.shapes import glossy_scene
from cudatracerlib_tpu.scene import shade_pack

scene = glossy_scene()
cfg = PTConfig(max_depth=5)

# --- without pack (disable) ---
orig = shade_pack.pack_enabled
shade_pack.pack_enabled = lambda *a, **k: False
img0, rays0 = render_counted(scene, 256, 256, 16, 3, cfg)
img0 = np.asarray(img0)
shade_pack.pack_enabled = orig

# --- with pack ---
img1, rays1 = render_counted(scene, 256, 256, 16, 3, cfg)
img1 = np.asarray(img1)

print("rays:", float(rays0), float(rays1))
print("mean:", img0.mean(), img1.mean())
d = np.abs(img0 - img1)
print("max abs diff:", d.max(), "mean abs diff:", d.mean())
