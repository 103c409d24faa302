import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cudatracerlib_tpu.render import ppm as ppm_mod
if len(sys.argv) > 1 and sys.argv[1] == "old":
    ppm_mod.ppm_uses_kernel = lambda cfg: False
from cudatracerlib_tpu.render.ppm import PPMConfig, render_ppm_pass
from cudatracerlib_tpu.scene.shapes import caustic_scene

scene = caustic_scene()
imgs = []
for s in range(3):
    imgs.append(np.asarray(render_ppm_pass(scene, 96, 96, 2, s, 1, PPMConfig())))
img = np.mean(imgs, 0)
tag = "old" if len(sys.argv) > 1 else "new"
np.save(f".scratch/ppm_{tag}.npy", img)
print(tag, "mean:", img.mean(), "p99:", np.percentile(img, 99))
