import time, os, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.bigscene import build_big_scene
from cudatracerlib_tpu.scene.scene import make_interaction
from cudatracerlib_tpu.scene import sensors
from cudatracerlib_tpu.sampling.rng import Sampler
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters
ABLATE=0
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
hit = jax.block_until_ready(intersect_clusters(cs, o, d))
if isinstance(hit, tuple): hit = hit[0]
it = make_interaction(scene, o, d, hit, flat=True)
smp, u2 = smp.next_2d()
r = jnp.sqrt(u2[:,0]); phi = 2*np.pi*u2[:,1]
local = jnp.stack([r*jnp.cos(phi), r*jnp.sin(phi), jnp.sqrt(1-u2[:,0])], -1)
d2 = it.frame.to_world(local)
o2 = it.p + it.n_geo*1e-3
m = np.asarray(hit.valid)
o2_np, d2_np = np.asarray(o2)[m], np.asarray(d2)[m]
B2 = (len(o2_np)//1024)*1024
o2j, d2j = jnp.asarray(o2_np[:B2]), jnp.asarray(d2_np[:B2])
import os
res = jax.block_until_ready(intersect_clusters(cs, o2j, d2j))
if os.environ.get("CT_DEBUG_COUNTS"):
    h2, dbg = res
    d = np.asarray(dbg)
    print("# qsum/tile mean %.0f p90 %.0f max %.0f | nsur mean %.0f p90 %.0f" % (
        d[:,0].mean(), np.percentile(d[:,0],90), d[:,0].max(), d[:,1].mean(), np.percentile(d[:,1],90)), flush=True)
    raise SystemExit
ts=[]
for _ in range(3):
    t0=time.time(); h2 = jax.block_until_ready(intersect_clusters(cs, o2j, d2j)); ts.append(time.time()-t0)
print(f"ABLATE={ABLATE}: bounce {B2/min(ts)/1e6:.2f} Mrays/s ({min(ts):.3f}s)", flush=True)
