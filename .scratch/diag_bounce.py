import time, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.bigscene import build_big_scene
from cudatracerlib_tpu.scene.scene import scene_intersect, make_interaction
from cudatracerlib_tpu.scene import sensors
from cudatracerlib_tpu.sampling.rng import Sampler
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters, _coherence_key
from cudatracerlib_tpu.math.frame import Frame

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
t0=time.time(); hit = jax.block_until_ready(intersect_clusters(cs, o, d)); t1=time.time()
print(f"primary {n} rays: {(t1-t0):.2f}s warm?", flush=True)
for _ in range(2):
    t0=time.time(); hit = jax.block_until_ready(intersect_clusters(cs, o, d)); t1=time.time()
print(f"primary: {n/(t1-t0)/1e6:.1f} Mrays/s hitrate {float(hit.valid.mean()):.3f}", flush=True)

# bounce batch: cosine sample around the hit normal
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
t0=time.time(); h2 = jax.block_until_ready(intersect_clusters(cs, o2j, d2j)); t1=time.time()
print(f"bounce compile+run {(t1-t0):.2f}", flush=True)
for _ in range(2):
    t0=time.time(); h2 = jax.block_until_ready(intersect_clusters(cs, o2j, d2j)); t1=time.time()
print(f"bounce: {B2/(t1-t0)/1e6:.2f} Mrays/s hitrate {float(h2.valid.mean()):.3f}", flush=True)

# ---- tile statistics in numpy: after sort, per-128 tile count clusters passing
# (a) interval frustum test, (b) union of per-ray exact box tests
key = np.asarray(_coherence_key(*(np.asarray(x) for x in cs.world_bounds), o2j, d2j))
order = np.argsort(key)
os_, ds_ = o2_np[:B2][order], d2_np[:B2][order]
inv = 1.0/np.where(np.abs(ds_)<1e-20, 1e-20, ds_)
cb = np.asarray(cs.cbox)[:, :6]
real = cb[:,0] < 1e29
lo_c, hi_c = cb[:,0:3], cb[:,3:6]
Tn = B2//128
sel = np.random.default_rng(0).choice(Tn, 64, replace=False)
int_counts, exact_counts = [], []
for tix in sel:
    sl = slice(tix*128, (tix+1)*128)
    o_t, i_t = os_[sl], inv[sl]
    ol, oh = o_t.min(0), o_t.max(0)
    il, ih = i_t.min(0), i_t.max(0)
    # interval test
    near = np.full(len(cb), -np.inf); far = np.full(len(cb), np.inf)
    for ax in range(3):
        ps = [(lo_c[:,ax]-ol[ax])*il[ax], (lo_c[:,ax]-ol[ax])*ih[ax],
              (lo_c[:,ax]-oh[ax])*il[ax], (lo_c[:,ax]-oh[ax])*ih[ax],
              (hi_c[:,ax]-ol[ax])*il[ax], (hi_c[:,ax]-ol[ax])*ih[ax],
              (hi_c[:,ax]-oh[ax])*il[ax], (hi_c[:,ax]-oh[ax])*ih[ax]]
        ps = np.stack(ps)
        near = np.maximum(near, ps.min(0)); far = np.minimum(far, ps.max(0))
    int_ok = real & (near <= far) & (near < 60.0)
    # exact union
    t0x = (lo_c[None,:,:] - o_t[:,None,:]) * i_t[:,None,:]
    t1x = (hi_c[None,:,:] - o_t[:,None,:]) * i_t[:,None,:]
    nr = np.maximum(np.minimum(t0x,t1x).max(-1), 1e-4)
    fr = np.maximum(t0x,t1x).min(-1)
    ex_ok = real[None,:] & (nr <= fr)
    int_counts.append(int_ok.sum()); exact_counts.append(ex_ok.any(0).sum())
print("clusters/tile interval: mean %.0f p90 %.0f max %d" % (np.mean(int_counts), np.percentile(int_counts,90), np.max(int_counts)), flush=True)
print("clusters/tile exact-union: mean %.0f p90 %.0f" % (np.mean(exact_counts), np.percentile(exact_counts,90)), flush=True)
print("clusters/ray exact (sample): %.1f" % (ex_ok.sum(1).mean()), flush=True)
