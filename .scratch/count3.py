import numpy as np, jax, jax.numpy as jnp, os
from cudatracerlib_tpu.scene.bigscene import build_big_scene
from cudatracerlib_tpu.scene.scene import make_interaction
from cudatracerlib_tpu.scene import sensors
from cudatracerlib_tpu.sampling.rng import Sampler
import cudatracerlib_tpu.ops.cluster_trace as CTm
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters, _coherence_key

scene = build_big_scene()
cs = scene.clusters
W=H=512; spp=4; n=W*H*spp
pix = jnp.arange(n, dtype=jnp.uint32)%(W*H)
smp = Sampler.create(jnp.uint32(0), pix, jnp.arange(n,dtype=jnp.uint32)//(W*H))
smp, j2 = smp.next_2d()
uv = jnp.stack([((pix%W).astype(jnp.float32)+j2[:,0])/W, ((pix//W).astype(jnp.float32)+j2[:,1])/H],-1)
smp, ua = smp.next_2d()
o, d, _ = sensors.sample_ray(scene.camera, uv, ua)

def stats(o, d, label):
    wlo, whi = cs.world_bounds
    key = _coherence_key(wlo, whi, o, d)
    order = jnp.argsort(key)
    # call unsorted variant directly on sorted rays so dbg corresponds
    h, dbgv = intersect_clusters(cs, o[order], d[order], sort_rays=False)
    dv = np.asarray(jax.block_until_ready(dbgv))
    print(f"{label}: queued mean {dv[:,0].mean():.0f} p90 {np.percentile(dv[:,0],90):.0f} | swept mean {dv[:,1].mean():.0f} | supers mean {dv[:,2].mean():.0f}", flush=True)
    return h, order

os.environ["CT_DEBUG_COUNTS"]="1"
h, order = stats(o, d, "primary")
h_u, _ = intersect_clusters(cs, o, d)
it = make_interaction(scene, o, d, h_u, flat=True)
smp, u2 = smp.next_2d()
r = jnp.sqrt(u2[:,0]); phi = 2*np.pi*u2[:,1]
local = jnp.stack([r*jnp.cos(phi), r*jnp.sin(phi), jnp.sqrt(1-u2[:,0])],-1)
d2 = it.frame.to_world(local); o2 = it.p + it.n_geo*1e-3
m = np.asarray(h_u.valid)
B2 = (int(m.sum())//8192)*8192
stats(jnp.asarray(np.asarray(o2)[m][:B2]), jnp.asarray(np.asarray(d2)[m][:B2]), "bounce")
