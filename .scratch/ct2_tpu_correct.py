import numpy as np, jax, jax.numpy as jnp, time
from cudatracerlib_tpu.accel import traversal
from cudatracerlib_tpu.accel.bvh import build_bvh
from cudatracerlib_tpu.accel.clusters import build_clusters
from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters
import sys
sys.path.insert(0, "/root/repo/tests")
from test_pallas import _scene_tris, _rays
tris = _scene_tris()
bvh, host = build_bvh(tris, with_host=True)
cs = build_clusters(bvh, host=host)
print("clusters", cs.cbox.shape[0], "supers", cs.scb.shape[0], flush=True)
o, d = _rays(tris, 1024)
t0=time.time()
hit = jax.block_until_ready(intersect_clusters(cs, o, d))
print("tpu run", round(time.time()-t0,1), flush=True)
oracle = traversal.intersect_brute_force(bvh, o, d)
vc, vo = np.asarray(hit.valid), np.asarray(oracle.valid)
print("valid match:", (vc==vo).mean(), "hits", vc.sum(), vo.sum(), flush=True)
m = vc&vo
tc, to_ = np.asarray(hit.t)[m], np.asarray(oracle.t)[m]
if m.any():
    print("t max err:", float(np.abs(tc-to_).max()), flush=True)
