import numpy as np

from cudatracerlib_tpu.render.ppm import PPMConfig, render_ppm_pass
from cudatracerlib_tpu.scene.shapes import caustic_scene

scene = caustic_scene()
W = H = 48
base = PPMConfig(n_photons=1 << 15, radius0=0.25)
single_cfg = base._replace(caustic_map=False)

floor = slice(int(0.55 * H), H)
lum = lambda a: (0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2])

# identity check: split at scale=1.0 should equal single
img1 = np.asarray(render_ppm_pass(scene, W, H, 1, 7, 2,
                                  base._replace(caustic_map=True,
                                                caustic_radius_scale=1.0)))
img0 = np.asarray(render_ppm_pass(scene, W, H, 1, 7, 2, single_cfg))
print("identity maxdiff:", float(np.abs(img1 - img0).max()),
      "rel:", float(np.abs(img1 - img0).sum() / (np.abs(img0).sum() + 1e-9)))

# converged reference: late pass, several seeds, single estimator
ref = np.zeros((H, W, 3), np.float32)
NREF = 6
for s in range(NREF):
    ref += np.asarray(render_ppm_pass(scene, W, H, 1, 100 + s, 80,
                                      single_cfg)) / NREF

# average NAVG pass-2 renders to suppress variance, then compare bias
NAVG = 12
acc_single = np.zeros((H, W, 3), np.float32)
for s in range(NAVG):
    acc_single += np.asarray(render_ppm_pass(scene, W, H, 1, s, 2,
                                             single_cfg)) / NAVG
err_single = float(((lum(acc_single) - lum(ref)) ** 2)[floor].mean())
print(f"single avg{NAVG}: {err_single:.5f}")
for scale in (0.4, 0.6):
    cfg = base._replace(caustic_map=True, caustic_radius_scale=scale)
    acc = np.zeros((H, W, 3), np.float32)
    for s in range(NAVG):
        acc += np.asarray(render_ppm_pass(scene, W, H, 1, s, 2, cfg)) / NAVG
    err = float(((lum(acc) - lum(ref)) ** 2)[floor].mean())
    print(f"split scale={scale} avg{NAVG}: {err:.5f}  "
          f"{'WIN' if err < err_single else 'lose'}")
