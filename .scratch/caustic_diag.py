import numpy as np
import jax.numpy as jnp

from cudatracerlib_tpu.render.ppm import (PPMConfig, render_ppm_pass,
                                          trace_photons)
from cudatracerlib_tpu.render.path_tracer import PTConfig, specialize_config
from cudatracerlib_tpu.scene.shapes import caustic_scene

scene = caustic_scene()
W = H = 48
base = PPMConfig(n_photons=1 << 15, radius0=0.25)
single_cfg = base._replace(caustic_map=False)
floor = slice(int(0.55 * H), H)
lum = lambda a: (0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2])

cfg = specialize_config(scene, PTConfig(max_depth=6, rr_start=2))
pm = trace_photons(scene, 1 << 15, jnp.uint32(7), cfg)
n_c = int(jnp.sum(pm.valid & pm.caustic))
n_t = int(jnp.sum(pm.valid))
print(f"photons: {n_t} valid, {n_c} caustic ({100*n_c/max(n_t,1):.1f}%)")

ref = np.zeros((H, W, 3), np.float32)
for s in range(4):
    ref += np.asarray(render_ppm_pass(scene, W, H, 1, 100 + s, 80,
                                      single_cfg)) / 4
img_single = np.asarray(render_ppm_pass(scene, W, H, 1, 7, 2, single_cfg))
img_split = np.asarray(render_ppm_pass(
    scene, W, H, 1, 7, 2, base._replace(caustic_map=True,
                                        caustic_radius_scale=0.4)))
for name, img in (("ref(p80)", ref), ("single(p2)", img_single),
                  ("split.4(p2)", img_split)):
    fl = lum(img)[floor]
    print(f"{name}: floor mean={fl.mean():.4f} max={fl.max():.4f} "
          f"full mean={lum(img).mean():.4f}")
