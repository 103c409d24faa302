import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.bigscene import build_big_scene
import cudatracerlib_tpu.scene.sensors as sensors

scene = build_big_scene(200_000, seed=0)
cs = scene.clusters
B = 1 << 18
W=H=512
pid = np.arange(B, dtype=np.uint32) % (W*H)
px = (pid % W).astype(np.float32); py = (pid // W).astype(np.float32)
uv = jnp.stack([jnp.asarray((px+0.5)/W), jnp.asarray((py+0.5)/H)], -1)
o, d, _ = sensors.sample_ray(scene.camera, uv, jnp.zeros((B,2)))
o = np.asarray(o); d = np.asarray(d)

boxes = np.asarray(cs.cluster_boxes)  # (NC,6)
NC = boxes.shape[0]
real = boxes[:,0] < 1e29
TILE = 1024
nt = B // TILE
counts = []
pk_counts = []
for t in range(0, nt, 16):  # sample every 16th tile
    ot = o[t*TILE:(t+1)*TILE]; dt = d[t*TILE:(t+1)*TILE]
    inv = 1.0/np.where(np.abs(dt)<1e-20, 1e-20, dt)
    t0 = (boxes[None,:,0:3]-ot[:,None])*inv[:,None]
    t1 = (boxes[None,:,3:6]-ot[:,None])*inv[:,None]
    near = np.maximum(np.minimum(t0,t1).max(-1), 1e-4)
    far  = np.maximum(t0,t1).min(-1)
    hit = (near<=far) & real[None,:]
    counts.append(hit.any(0).sum())
counts = np.array(counts)
print("clusters (200k tris):", NC, "real", real.sum())
print("any-lane clusters/tile (no t-tightening): mean %.0f p50 %.0f max %.0f" %
      (counts.mean(), np.median(counts), counts.max()))
