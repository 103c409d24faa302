import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
CT=128; LANES=128; N=2000; RING=16
P = jax.lax.Precision

def make(variant):
    def kern(w_ref, rays_ref, t_ref):
        ox=rays_ref[0:1]; oy=rays_ref[1:2]; oz=rays_ref[2:3]
        dx=rays_ref[3:4]; dy=rays_ref[4:5]; dz=rays_ref[5:6]
        tmin=rays_ref[6:7]; tmax=rays_ref[7:8]
        t_ref[...] = tmax
        o4 = jnp.concatenate([ox,oy,oz,jnp.ones((1,LANES),jnp.float32)],0)
        d4 = jnp.concatenate([dx,dy,dz,jnp.zeros((1,LANES),jnp.float32)],0)
        iota = jax.lax.broadcasted_iota(jnp.int32,(CT,LANES),0)
        def sweep(w):
            Pm = jax.lax.dot_general(w, o4, (((0,),(0,)),((),())), precision=P.HIGHEST, preferred_element_type=jnp.float32)
            Q = jax.lax.dot_general(w, d4, (((0,),(0,)),((),())), precision=P.HIGHEST, preferred_element_type=jnp.float32)
            w0=Pm[2*CT:]; wd=Q[2*CT:]
            wd=jnp.where(jnp.abs(wd)<1e-20,1e-20,wd)
            t=-w0/wd
            ok=(t>tmin)&(t<t_ref[...])
            u=Pm[:CT]+t*Q[:CT]; v=Pm[CT:2*CT]+t*Q[CT:2*CT]
            ok=ok&(u>=0)&(v>=0)&(u+v<=1)
            tm=jnp.where(ok,t,3e30)
            cm=jnp.min(tm,axis=0,keepdims=True)
            imp=cm<t_ref[...]
            sel=(tm==cm)&ok
            win=jnp.max(jnp.where(sel,iota,-1),axis=0,keepdims=True)
            sel2=sel&(iota==win)
            ub=jnp.sum(jnp.where(sel2,u,0.),axis=0,keepdims=True)
            t_ref[...]=jnp.where(imp,cm+0.0*ub,t_ref[...])
        def body(i,_):
            if variant=="static":
                sweep(w_ref[0, 0:4, :])
            elif variant=="dynslot":
                slot = jax.lax.rem(i, RING)
                sweep(w_ref[slot, 0:4, :])
            elif variant=="dynslot_when":
                slot = jax.lax.rem(i, RING)
                @pl.when(i >= 0)
                def _():
                    sweep(w_ref[slot, 0:4, :])
            return 0
        jax.lax.fori_loop(0, N, body, 0)
    return kern

def run(variant):
    w = jnp.asarray(np.random.rand(RING, 8, 384).astype(np.float32))
    rays = jnp.asarray(np.random.rand(8, LANES).astype(np.float32)+0.5)
    f = pl.pallas_call(make(variant),
        out_shape=jax.ShapeDtypeStruct((1,LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    g = jax.jit(lambda a,b: f(a,b))
    jax.block_until_ready(g(w,rays))
    ts=[]
    for _ in range(3):
        t0=time.time(); jax.block_until_ready(g(w,rays)); ts.append(time.time()-t0)
    print(f"{variant}: {min(ts)/N*1e9:.0f} ns/sweep", flush=True)

run("static"); run("dynslot"); run("dynslot_when")
