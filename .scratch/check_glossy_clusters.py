import time, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.shapes import glossy_scene
from cudatracerlib_tpu.scene.scene import scene_intersect
from cudatracerlib_tpu.accel import traversal
t0=time.time()
scene = glossy_scene()
print("scene built", round(time.time()-t0,1), "tris", scene.shading.verts.shape[0],
      "clusters", None if scene.clusters is None else scene.clusters.cluster_boxes.shape[0], flush=True)
B = 65536
rng = np.random.default_rng(0)
o = np.tile(np.array([0.3,-5.5,2.2], np.float32), (B,1)) + rng.normal(0,.01,(B,3)).astype(np.float32)
d = rng.normal(0,1,(B,3)).astype(np.float32); d/=np.linalg.norm(d,axis=1,keepdims=True)
o_j, d_j = jnp.asarray(o), jnp.asarray(d)
t0=time.time()
hit = scene_intersect(scene, o_j, d_j)
jax.block_until_ready(hit)
print("cluster intersect compile+run", round(time.time()-t0,1), "hits", int(hit.valid.sum()), flush=True)
t0=time.time()
hit2 = scene_intersect(scene, o_j, d_j); jax.block_until_ready(hit2)
print("warm", round(time.time()-t0,4), flush=True)
# correctness vs brute force on a subsample
hb = traversal.intersect_brute_force(scene.bvh, o_j[:4096], d_j[:4096])
ok_valid = bool(jnp.all(hb.valid == hit.valid[:4096]))
ok_t = bool(jnp.all(jnp.abs(jnp.where(hb.valid, hb.t - hit.t[:4096], 0.0)) < 1e-3))
print("vs brute: valid", ok_valid, "t", ok_t, flush=True)
