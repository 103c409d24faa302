import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.bigscene import build_big_scene
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters, _coherence_key

scene = build_big_scene(800_000, seed=0)
cs = scene.clusters
B = 1 << 20
rng = np.random.default_rng(0)

# camera-like coherent rays: from a point, toward scene
lo = np.asarray(scene.bvh.world_min); hi = np.asarray(scene.bvh.world_max)
eye = lo + (hi - lo) * np.array([0.5, -0.3, 0.9])
tgt = lo + (hi - lo) * rng.uniform(0.2, 0.8, (B, 3))
d_coh = tgt - eye; d_coh /= np.linalg.norm(d_coh, axis=-1, keepdims=True)
o_coh = jnp.asarray(np.tile(eye, (B, 1)).astype(np.float32))
d_coh = jnp.asarray(d_coh.astype(np.float32))

# incoherent bounce-like rays: random origins in scene, random dirs
o_inc = jnp.asarray(rng.uniform(lo, hi, (B, 3)).astype(np.float32))
d_inc = rng.normal(size=(B, 3)); d_inc /= np.linalg.norm(d_inc, axis=-1, keepdims=True)
d_inc = jnp.asarray(d_inc.astype(np.float32))

def timeit(label, fn, n=3):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    best = min(ts)
    print(f"{label}: {best*1e3:.1f} ms -> {B/best/1e6:.2f} Mrays/s")

def sync(h): np.asarray(h.t[:1])

timeit("coherent closest", lambda: sync(intersect_clusters(cs, o_coh, d_coh)))
timeit("coherent anyhit ", lambda: sync(intersect_clusters(cs, o_coh, d_coh, any_hit=True)))
timeit("incoher closest ", lambda: sync(intersect_clusters(cs, o_inc, d_inc)))
timeit("incoher nosort  ", lambda: sync(intersect_clusters(cs, o_inc, d_inc, sort_rays=False)))
# cost of sort machinery alone
key_f = jax.jit(lambda o, d: jnp.argsort(_coherence_key(cs, o, d)))
timeit("argsort only    ", lambda: np.asarray(key_f(o_inc, d_inc)[:1]))
