import time, os, functools, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.bigscene import build_big_scene
from cudatracerlib_tpu.scene.scene import make_interaction
from cudatracerlib_tpu.scene import sensors
from cudatracerlib_tpu.sampling.rng import Sampler
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters

scene = build_big_scene()
cs = scene.clusters
W=H=512; spp=4
n = W*H*spp
pix = jnp.arange(n, dtype=jnp.uint32) % (W*H)
smp = Sampler.create(jnp.uint32(0), pix, jnp.arange(n, dtype=jnp.uint32)//(W*H))
smp, jit2 = smp.next_2d()
px = (pix % W).astype(jnp.float32); py = (pix // W).astype(jnp.float32)
uv = jnp.stack([(px + jit2[:,0])/W, (py + jit2[:,1])/H], -1)
smp, uap = smp.next_2d()
o, d, _ = sensors.sample_ray(scene.camera, uv, uap)

@functools.partial(jax.jit, static_argnames=("k",))
def chain(o, d, k):
    def body(carry, _):
        oo, t_prev = carry
        # true data dependency between iterations, value-neutral
        oo = oo + (t_prev * 0.0)[:, None]
        h = intersect_clusters(cs, oo, d)
        return (oo, jnp.nan_to_num(h.t, posinf=0.0)), None
    (oo, t), _ = jax.lax.scan(body, (o, jnp.zeros(o.shape[0])), None, length=k)
    return t

def timeit(o, d, label):
    t1 = chain(o, d, 1); np.asarray(t1[:1])
    t8 = chain(o, d, 5); np.asarray(t8[:1])
    ts1, ts5 = [], []
    for _ in range(3):
        t0=time.time(); np.asarray(chain(o, d, 1)[:1]); ts1.append(time.time()-t0)
        t0=time.time(); np.asarray(chain(o, d, 5)[:1]); ts5.append(time.time()-t0)
    dt = (min(ts5)-min(ts1))/4
    B = o.shape[0]
    print(f"{label}: {B/dt/1e6:.1f} Mrays/s marginal ({min(ts1):.3f}s vs {min(ts5):.3f}s)", flush=True)
    return dt

timeit(o, d, "primary")

h = intersect_clusters(cs, o, d)
it = make_interaction(scene, o, d, h, flat=True)
smp, u2 = smp.next_2d()
r = jnp.sqrt(u2[:,0]); phi = 2*np.pi*u2[:,1]
local = jnp.stack([r*jnp.cos(phi), r*jnp.sin(phi), jnp.sqrt(1-u2[:,0])], -1)
d2 = it.frame.to_world(local)
o2 = it.p + it.n_geo*1e-3
m = np.asarray(h.valid)
o2_np, d2_np = np.asarray(o2)[m], np.asarray(d2)[m]
B2 = (len(o2_np)//1024)*1024
timeit(jnp.asarray(o2_np[:B2]), jnp.asarray(d2_np[:B2]), "bounce")
