import numpy as np

from cudatracerlib_tpu.render.path_tracer import PTConfig, render
from cudatracerlib_tpu.render.ppm import PPMConfig, render_ppm_pass, progressive_radius
from cudatracerlib_tpu.scene.shapes import caustic_scene

scene = caustic_scene()
W = H = 48
floor = slice(int(0.55 * H), H)
lum = lambda a: (0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2])

# unbiased PT ground truth
ref = np.zeros((H, W, 3), np.float32)
N = 8
for s in range(N):
    ref += np.asarray(render(scene, W, H, 256, s,
                             PTConfig(max_depth=8, rr_start=4))) / N
fl = lum(ref)[floor]
print(f"PT ref: floor mean={fl.mean():.4f} max={fl.max():.4f}")

base = PPMConfig(n_photons=1 << 15, radius0=0.25)
single_cfg = base._replace(caustic_map=False)
split_cfg = base._replace(caustic_map=True, caustic_radius_scale=0.4)

# accumulate PPM like the real algorithm: average passes 0..P-1
for P in (4, 10):
    for name, cfg in (("single", single_cfg), ("split.4", split_cfg)):
        acc = np.zeros((H, W, 3), np.float32)
        for i in range(P):
            acc += np.asarray(render_ppm_pass(scene, W, H, 1, i, i, cfg)) / P
        err = float(((lum(acc) - lum(ref)) ** 2)[floor].mean())
        flm = lum(acc)[floor]
        print(f"P={P} {name}: floorMSE={err:.5f} mean={flm.mean():.4f} "
              f"max={flm.max():.4f}")
print("radius at pass 9:", float(progressive_radius(0.25, 9)))
