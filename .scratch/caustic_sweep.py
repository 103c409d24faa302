import numpy as np

from cudatracerlib_tpu.render.ppm import PPMConfig, render_ppm_pass
from cudatracerlib_tpu.scene.shapes import caustic_scene

scene = caustic_scene()
W = H = 48
base = PPMConfig(n_photons=1 << 15, radius0=0.25)
single_cfg = base._replace(caustic_map=False)

ref = np.zeros((H, W, 3), np.float32)
for s in range(3):
    ref += np.asarray(render_ppm_pass(scene, W, H, 1, 50 + s, 40, single_cfg)) / 3

floor = slice(int(0.55 * H), H)
lum = lambda a: (0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2])

img_single = np.asarray(render_ppm_pass(scene, W, H, 1, 7, 2, single_cfg))
err_single = float(((lum(img_single) - lum(ref)) ** 2)[floor].mean())
print(f"single: {err_single:.5f}")

for scale in (0.3, 0.4, 0.5, 0.6, 0.7, 0.8):
    cfg = base._replace(caustic_map=True, caustic_radius_scale=scale)
    img = np.asarray(render_ppm_pass(scene, W, H, 1, 7, 2, cfg))
    err = float(((lum(img) - lum(ref)) ** 2)[floor].mean())
    print(f"split scale={scale}: {err:.5f}  {'WIN' if err < err_single else 'lose'}")
