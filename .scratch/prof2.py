import sys; sys.path.insert(0, "/root/repo")
import time, os, numpy as np, jax, jax.numpy as jnp
import cudatracerlib_tpu.accel.clusters as C
import cudatracerlib_tpu.ops.cluster_trace as CT
from cudatracerlib_tpu.scene.bigscene import build_big_scene

scene = build_big_scene(200_000, seed=0)
cs = scene.clusters
B = 1 << 18
rng = np.random.default_rng(0)
lo = np.asarray(scene.bvh.world_min); hi = np.asarray(scene.bvh.world_max)
eye = lo + (hi - lo) * np.array([0.5, -0.3, 0.9])
tgt = lo + (hi - lo) * rng.uniform(0.2, 0.8, (B, 3))
d = tgt - eye; d /= np.linalg.norm(d, axis=-1, keepdims=True)
o = jnp.asarray(np.tile(eye, (B, 1)).astype(np.float32))
d = jnp.asarray(d.astype(np.float32))

def timeit(label, fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    best = min(ts)
    print(f"{label}: {best*1e3:.1f} ms -> {B/best/1e6:.2f} Mrays/s")

def sync(h): np.asarray(h.t[:1])
timeit("packets on ", lambda: sync(CT.intersect_clusters(cs, o, d, sort_rays=False)))
