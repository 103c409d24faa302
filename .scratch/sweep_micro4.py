import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
CT=128; LANES=128; N=2000; RING=16
PR = jax.lax.Precision
TRI_BITS=10; id_mask=(1<<TRI_BITS)-1
NC=2048

def make(variant):
    def kern(rays_ref, qref, wmat_hbm, t_ref, c_ref, wscr, anym, sem):
        ox=rays_ref[0:1]; oy=rays_ref[1:2]; oz=rays_ref[2:3]
        dx=rays_ref[3:4]; dy=rays_ref[4:5]; dz=rays_ref[5:6]
        tmin=rays_ref[6:7]; tmax=rays_ref[7:8]
        t_ref[...] = tmax
        c_ref[...] = jnp.full((1,LANES), -1.0, jnp.float32)
        o4 = jnp.concatenate([ox,oy,oz,jnp.ones((1,LANES),jnp.float32)],0)
        d4 = jnp.concatenate([dx,dy,dz,jnp.zeros((1,LANES),jnp.float32)],0)
        iota = jax.lax.broadcasted_iota(jnp.int32,(CT,LANES),0)
        def _dma(slot, c):
            return pltpu.make_async_copy(wmat_hbm.at[c], wscr.at[slot], sem.at[slot])
        def sweep(slot, c, bt, bc):
            w = wscr[slot, 0:4, :]
            Pm = jax.lax.dot_general(w, o4, (((0,),(0,)),((),())), precision=PR.HIGHEST, preferred_element_type=jnp.float32)
            Q = jax.lax.dot_general(w, d4, (((0,),(0,)),((),())), precision=PR.HIGHEST, preferred_element_type=jnp.float32)
            w0=Pm[2*CT:]; wd=Q[2*CT:]
            wd=jnp.where(jnp.abs(wd)<1e-20,1e-20,wd)
            t=-w0/wd
            ok=(t>tmin)&(t<bt)
            u=Pm[:CT]+t*Q[:CT]; v=Pm[CT:2*CT]+t*Q[CT:2*CT]
            ok=ok&(u>=0)&(v>=0)&(u+v<=1)
            key = pltpu.bitcast((pltpu.bitcast(t, jnp.int32) & ~id_mask) | iota, jnp.float32)
            tm=jnp.where(ok,key,3e30)
            cm=jnp.min(tm,axis=0,keepdims=True)
            imp=cm<bt
            return (jnp.where(imp,cm,bt), jnp.where(imp,c.astype(jnp.float32),bc))
        n_q = qref[256]
        def warm(i,_):
            @pl.when(i < n_q)
            def _():
                _dma(i, qref[i % 256]).start()
            return 0
        jax.lax.fori_loop(0, RING, warm, 0)
        def body(i,carry):
            bt,bc=carry
            slot=jax.lax.rem(i,RING)
            _dma(slot, qref[i % 256]).wait()
            @pl.when(jax.lax.rem(i, RING//2) == RING//2-1)
            def _():
                anym[0] = jnp.max(bt)
            bt,bc = sweep(slot, qref[i % 256], bt, bc)
            @pl.when(i + RING < n_q)
            def _():
                _dma(slot, qref[(i + RING) % 256]).start()
            return (bt,bc)
        bt,bc = jax.lax.fori_loop(0,n_q,body,(t_ref[...],c_ref[...]))
        t_ref[...] = bt
        c_ref[...] = bc
    return kern

def run(variant):
    wmat = jnp.asarray(np.random.rand(NC, 8, 384).astype(np.float32))
    rays = jnp.asarray(np.random.rand(8, LANES).astype(np.float32)+0.5)
    q = jnp.concatenate([np.random.default_rng(0).integers(0, NC, 256).astype(np.int32), jnp.full((1,), N, jnp.int32)])
    f = pl.pallas_call(make(variant),
        out_shape=[jax.ShapeDtypeStruct((1,LANES), jnp.float32)]*2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        scratch_shapes=[pltpu.VMEM((RING,8,3*CT), jnp.float32),
                        pltpu.SMEM((1,), jnp.float32),
                        pltpu.SemaphoreType.DMA((RING,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    g = jax.jit(lambda a,b,c: f(a,b,c))
    jax.block_until_ready(g(rays,q,wmat))
    ts=[]
    for _ in range(3):
        t0=time.time(); jax.block_until_ready(g(rays,q,wmat)); ts.append(time.time()-t0)
    print(f"{variant}: {min(ts)/N*1e9:.0f} ns/sweep", flush=True)

run("full")
