import time, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.shapes import glossy_scene
from cudatracerlib_tpu.accel import traversal
t0=time.time()
scene = glossy_scene()
print("scene built", round(time.time()-t0,1), "tris", scene.shading.verts.shape[0], flush=True)
B = 65536
rng = np.random.default_rng(0)
o = np.array([0.3,-5.5,2.2], np.float32) + rng.normal(0, .01, (B,3)).astype(np.float32)
d = rng.normal(0,1,(B,3)).astype(np.float32); d/= np.linalg.norm(d,axis=1,keepdims=True)
t0=time.time()
hit = traversal.intersect(scene.bvh, jnp.asarray(o), jnp.asarray(d))
jax.block_until_ready(hit)
print("lockstep intersect ok", round(time.time()-t0,1), "hits", int(hit.valid.sum()), flush=True)
t0=time.time()
hit = traversal.intersect(scene.bvh, jnp.asarray(o), jnp.asarray(d))
jax.block_until_ready(hit)
print("warm", round(time.time()-t0,3), flush=True)
