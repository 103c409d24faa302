import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
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
# direction-morton sort on host (proxy for a direction-aware coherence key)
q = ((d * 0.5 + 0.5) * 255).astype(np.int64)
def spread(x):
    x=(x|(x<<16))&0x030000FF; x=(x|(x<<8))&0x0300F00F
    x=(x|(x<<4))&0x030C30C3; x=(x|(x<<2))&0x09249249; return x
mort = (spread(q[:,0])<<2)|(spread(q[:,1])<<1)|spread(q[:,2])
d_sorted = d[np.argsort(mort)]
o = jnp.asarray(np.tile(eye, (B, 1)).astype(np.float32))
dj = jnp.asarray(d_sorted.astype(np.float32))

def timeit(label, fn, n=3):
    fn(); ts=[]
    for _ in range(n):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    best=min(ts); print(f"{label}: {best*1e3:.1f} ms -> {B/best/1e6:.2f} Mrays/s")
def sync(h): np.asarray(h.t[:1])
timeit("dir-sorted point-origin", lambda: sync(CT.intersect_clusters(cs, o, dj, sort_rays=False)))
# also a true camera strip: pixel-ordered 512x512 frame seg
import cudatracerlib_tpu.scene.sensors as sensors
W=H=512; spp=1
pid = jnp.arange(B, dtype=jnp.uint32) % (W*H)
px = (pid % W).astype(jnp.float32); py = (pid // W).astype(jnp.float32)
uv = jnp.stack([(px+0.5)/W, (py+0.5)/H], -1)
oc, dc, _ = sensors.sample_ray(scene.camera, uv, jnp.zeros((B,2)))
timeit("camera scanline strip  ", lambda: sync(CT.intersect_clusters(cs, oc, dc, sort_rays=False)))
