import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CT=128; LANES=128
N_SWEEP = 2000

def make_kernel(prec, packed, elementwise=True):
    def kern(w_ref, rays_ref, t_ref):
        ox=rays_ref[0:1]; oy=rays_ref[1:2]; oz=rays_ref[2:3]
        dx=rays_ref[3:4]; dy=rays_ref[4:5]; dz=rays_ref[5:6]
        tmin=rays_ref[6:7]; tmax=rays_ref[7:8]
        t_ref[...] = tmax
        o4 = jnp.concatenate([ox,oy,oz,jnp.ones((1,LANES),jnp.float32)],0)
        d4 = jnp.concatenate([dx,dy,dz,jnp.zeros((1,LANES),jnp.float32)],0)
        od8 = jnp.concatenate([o4,d4],0)
        def body(i,_):
            w = w_ref[0:4,:]
            if packed:
                w8 = w_ref[...]  # (8, 768): [W|0 ; 0|W] premade outside? here just reuse
                PQ = jax.lax.dot_general(w8, od8, (((0,),(0,)),((),())),
                                         precision=prec, preferred_element_type=jnp.float32)
                P = PQ[:3*CT]; Q = PQ[:3*CT]
            else:
                P = jax.lax.dot_general(w, o4, (((0,),(0,)),((),())),
                                        precision=prec, preferred_element_type=jnp.float32)
                Q = jax.lax.dot_general(w, d4, (((0,),(0,)),((),())),
                                        precision=prec, preferred_element_type=jnp.float32)
            if not elementwise:
                t_ref[...] = jnp.minimum(t_ref[...], P[0:1,:]+Q[0:1,:])
                return 0
            w0 = P[2*CT:3*CT]; wd = Q[2*CT:3*CT]
            wd = jnp.where(jnp.abs(wd)<1e-20, 1e-20, wd)
            t = -w0/wd
            ok = (t>tmin)&(t<t_ref[...])
            u = P[0:CT]+t*Q[0:CT]; v = P[CT:2*CT]+t*Q[CT:2*CT]
            ok = ok&(u>=0)&(v>=0)&(u+v<=1)
            tm = jnp.where(ok,t,3e30)
            cm = jnp.min(tm,axis=0,keepdims=True)
            t_ref[...] = jnp.where(cm<t_ref[...],cm,t_ref[...])
            return 0
        jax.lax.fori_loop(0, N_SWEEP, body, 0)
    return kern

def run(name, prec, packed, elementwise=True):
    M = 768 if packed else 384
    w = jnp.asarray(np.random.rand(8, M).astype(np.float32))
    rays = jnp.asarray(np.random.rand(8, LANES).astype(np.float32)+0.5)
    f = pl.pallas_call(make_kernel(prec, packed, elementwise),
        out_shape=jax.ShapeDtypeStruct((1,LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    g = jax.jit(lambda a,b: f(a,b))
    jax.block_until_ready(g(w,rays))
    ts=[]
    for _ in range(3):
        t0=time.time(); jax.block_until_ready(g(w,rays)); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)/N_SWEEP*1e9:.0f} ns/sweep", flush=True)

P = jax.lax.Precision
run("2mm HIGHEST + elem", P.HIGHEST, False)
run("2mm HIGHEST matmul-only", P.HIGHEST, False, elementwise=False)
pass
run("2mm DEFAULT + elem", P.DEFAULT, False)
run("packed8 HIGHEST + elem", P.HIGHEST, True)
pass
