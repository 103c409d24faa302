import time, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.bigscene import build_big_scene
from cudatracerlib_tpu.accel import traversal
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters

t0=time.time()
scene = build_big_scene()
print("build", round(time.time()-t0,1), "tris", scene.shading.verts.shape[0],
      "supers", scene.clusters.scb.shape[0], flush=True)
cs = scene.clusters
lo = np.asarray(scene.bvh.world_min); hi = np.asarray(scene.bvh.world_max)
B = 1<<20
rng = np.random.default_rng(0)

# camera-like coherent rays
# fall back: primary rays from the scene camera via pixel grid
W=H=1024
px, py = np.meshgrid(np.arange(W), np.arange(H))
# simple pinhole reproduction: use scene.camera

rays_o = np.broadcast_to(np.array([0.0,-24.0,6.0],np.float32), (B,3)).copy()
ang1 = rng.uniform(-0.45,0.45,B); ang2 = rng.uniform(-0.25,0.25,B)
d_cam = np.stack([np.sin(ang1), np.cos(ang1)*np.cos(ang2), np.sin(ang2)*0.5-0.2], -1).astype(np.float32)
d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)

# incoherent rays: random origins in box, random dirs
o_inc = rng.uniform(lo, hi, (B,3)).astype(np.float32)
d_inc = rng.normal(0,1,(B,3)).astype(np.float32); d_inc/=np.linalg.norm(d_inc,axis=1,keepdims=True)

def bench(name, o, d, any_hit=False):
    pass
    o=jnp.asarray(o); d=jnp.asarray(d)
    f = lambda: jax.block_until_ready(intersect_clusters(cs, o, d, any_hit=any_hit))
    t0=time.time(); h=f(); print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
    ts=[]
    for _ in range(3):
        t0=time.time(); h=f(); ts.append(time.time()-t0)
    dt=min(ts)
    hr = float(jnp.mean(h.valid.astype(jnp.float32)))
    print(f"{name}: {B/dt/1e6:.2f} Mrays/s  hitrate {hr:.3f} (reps {[round(x,4) for x in ts]})", flush=True)
    return h

h1 = bench("coherent", rays_o, d_cam)
h2 = bench("incoherent", o_inc, d_inc)
h3 = bench("coherent-anyhit", rays_o, d_cam, any_hit=True)

# correctness vs lockstep oracle on subsample (oracle on CPU to avoid TPU lockstep)
cpu = jax.devices("cpu")[0]
N=8192
with jax.default_device(cpu):
    bvh_cpu = jax.device_put(scene.bvh, cpu)
    ho = traversal.intersect(bvh_cpu, jnp.asarray(o_inc[:N]), jnp.asarray(d_inc[:N]))
    vo = np.asarray(ho.valid); to_=np.asarray(ho.t)
vc = np.asarray(h2.valid)[:N]; tc = np.asarray(h2.t)[:N]
print("incoherent valid match:", (vc==vo).mean(), flush=True)
m = vc&vo
print("t allclose:", np.allclose(tc[m], to_[m], rtol=1e-3, atol=1e-3), "max dt", float(np.abs(tc[m]-to_[m]).max()) if m.any() else 0)
