import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from cudatracerlib_tpu.scene.bigscene import build_big_scene
from cudatracerlib_tpu.accel import traversal
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters
import cudatracerlib_tpu.scene.scene as S

scene = build_big_scene(60_000, seed=1)
B = 8192
rng = np.random.default_rng(0)
lo = np.asarray(scene.bvh.world_min); hi = np.asarray(scene.bvh.world_max)
o = jnp.asarray(rng.uniform(lo - 1, hi + 1, (B, 3)).astype(np.float32))
d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

hit_c = intersect_clusters(scene.clusters, o, d)
hit_o = traversal.intersect(scene.bvh, o, d)
vc = np.asarray(hit_c.valid); vo = np.asarray(hit_o.valid)
tc = np.asarray(hit_c.t); to = np.asarray(hit_o.t)
print("valid match:", (vc == vo).mean())
m = vc & vo
print("t allclose:", np.allclose(tc[m], to[m], rtol=1e-4, atol=1e-4),
      "max dt", np.abs(tc[m]-to[m]).max() if m.any() else 0)
# any-hit
ha_c = intersect_clusters(scene.clusters, o, d, any_hit=True)
print("anyhit vs closest valid:", (np.asarray(ha_c.valid) == vo).mean())
