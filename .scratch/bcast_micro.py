import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
N=152; LANES=128; REP=500

def make(variant):
    def kern(box_ref, ray_ref, out_ref):
        ox=ray_ref[0:1]; idx=ray_ref[1:2]; tmin=ray_ref[2:3]; tmax=ray_ref[3:4]
        def body(i, acc):
            lo = box_ref[:, 0:1]; hi = box_ref[:, 3:4]
            loy = box_ref[:, 1:2]; hiy = box_ref[:, 4:5]
            loz = box_ref[:, 2:3]; hiz = box_ref[:, 5:6]
            if variant == "bcast_first":
                lo = jnp.broadcast_to(lo, (N, LANES)); hi = jnp.broadcast_to(hi, (N, LANES))
                loy = jnp.broadcast_to(loy, (N, LANES)); hiy = jnp.broadcast_to(hiy, (N, LANES))
                loz = jnp.broadcast_to(loz, (N, LANES)); hiz = jnp.broadcast_to(hiz, (N, LANES))
            t0x=(lo-ox)*idx; t1x=(hi-ox)*idx
            t0y=(loy-ox)*idx; t1y=(hiy-ox)*idx
            t0z=(loz-ox)*idx; t1z=(hiz-ox)*idx
            near=jnp.maximum(jnp.maximum(jnp.minimum(t0x,t1x),jnp.minimum(t0y,t1y)),jnp.maximum(jnp.minimum(t0z,t1z),tmin))
            far=jnp.minimum(jnp.minimum(jnp.maximum(t0x,t1x),jnp.maximum(t0y,t1y)),jnp.minimum(jnp.maximum(t0z,t1z),tmax))
            m=jnp.min(jnp.where(near<=far,near,3e30),axis=1,keepdims=True)
            return acc + jnp.sum(m)
        out_ref[0,0] = jax.lax.fori_loop(0, REP, body, 0.0)
    return kern

def run(variant):
    box = jnp.asarray(np.random.rand(N, 128).astype(np.float32))
    ray = jnp.asarray(np.random.rand(8, LANES).astype(np.float32)+0.5)
    f = pl.pallas_call(make(variant),
        out_shape=jax.ShapeDtypeStruct((1,1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
    g = jax.jit(lambda a,b: f(a,b))
    np.asarray(g(box,ray))
    ts=[]
    for _ in range(3):
        t0=time.time(); np.asarray(g(box,ray)); ts.append(time.time()-t0)
    print(f"{variant}: {min(ts)/REP*1e6:.2f} us per (152,128) slab pass", flush=True)

run("plain"); run("bcast_first")
