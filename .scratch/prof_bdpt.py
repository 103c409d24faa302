import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.render import bdpt as bdpt_mod
from cudatracerlib_tpu.render.bdpt import BDPTConfig, render_bdpt_counted, _trace_light_subpath
from cudatracerlib_tpu.render.path_tracer import specialize_config
from cudatracerlib_tpu.scene.shapes import caustic_scene

scene = caustic_scene()
W = H = 128; spp = 4; B = W*H*spp
cfg = BDPTConfig()
base = specialize_config(scene, cfg.base)

def timeit(fn, label, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {min(ts)*1000:8.1f} ms")
    return min(ts)

# full
img, rays = render_bdpt_counted(scene, W, H, spp, 0, cfg)
print("rays:", float(rays), "B:", B)
t_full = timeit(lambda: np.asarray(render_bdpt_counted(scene, W, H, spp, 7, cfg)[0])[:1], "full BDPT pass")

# light subpath alone
lw = jax.jit(lambda seed: _trace_light_subpath(scene, B, seed, base, cfg.s_max))
_ = jax.block_until_ready(lw(jnp.uint32(0)))
t_light = timeit(lambda: jax.block_until_ready(lw(jnp.uint32(7))), "light subpath (store S_MAX)")

# s_max=1: one stored vertex -> 1 connection per eye bounce instead of S_MAX
cfg1 = BDPTConfig(base=cfg.base, s_max=1)
img1, _ = render_bdpt_counted(scene, W, H, spp, 0, cfg1)
t_s1 = timeit(lambda: np.asarray(render_bdpt_counted(scene, W, H, spp, 7, cfg1)[0])[:1], "full pass s_max=1")
print(f"-> connections cost (s_max {cfg.s_max} vs 1): {(t_full-t_s1)*1000:.1f} ms")
print(f"-> eye walk + splat residue: {(t_s1 - t_light)*1000:.1f} ms")
