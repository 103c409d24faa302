import functools, time, numpy as np, jax, jax.numpy as jnp
B = 1<<20
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-20,20,(B,3)).astype(np.float32))
d = jnp.asarray(rng.normal(0,1,(B,3)).astype(np.float32))
key = jnp.asarray(rng.integers(0, 1<<30, B).astype(np.uint32))
wmat = jnp.asarray(rng.random((9664*8*384,)).astype(np.float32))

def timeit(f, name):
    g1 = jax.jit(lambda *a: jax.lax.scan(lambda c,_:(f(a[0],a[1],a[2],c)*0+c+1,None), jnp.float32(0), None, length=1)[0])
    g5 = jax.jit(lambda *a: jax.lax.scan(lambda c,_:(f(a[0],a[1],a[2],c)*0+c+1,None), jnp.float32(0), None, length=5)[0])
    np.asarray(g1(o,d,key)[None][:1]); np.asarray(g5(o,d,key)[None][:1])
    t0=time.time(); np.asarray(g1(o,d,key)[None][:1]); t1=time.time()-t0
    t0=time.time(); np.asarray(g5(o,d,key)[None][:1]); t5=time.time()-t0
    print(f"{name}: {(t5-t1)/4*1e3:.1f} ms", flush=True)

def f_sort(o, d, k, c):
    k2 = key ^ c.astype(jnp.uint32)
    order = jnp.argsort(k2)
    inv = jnp.argsort(order)
    return o[order][0,0] + inv[0].astype(jnp.float32)

def f_sort_gather(o, d, k, c):
    k2 = key ^ c.astype(jnp.uint32)
    order = jnp.argsort(k2)
    inv = jnp.argsort(order)
    os_, ds_ = o[order], d[order]
    # unsort 5 result fields
    t = os_[:,0]; pr = ds_[:,0]; u = os_[:,1]; v = os_[:,2]; val = ds_[:,1]
    return t[inv][0] + pr[inv][0] + u[inv][0] + v[inv][0] + val[inv][0]

def f_rays_prep(o, d, k, c):
    comps = [o[:,0]+c, o[:,1], o[:,2], d[:,0], d[:,1], d[:,2], o[:,0]*0, o[:,0]*0+1]
    rays = jnp.stack(comps).reshape(8, B//128, 128).transpose(1,0,2)
    return rays[0,0,0]

def f_recompute(o, d, k, c):
    base = (key % (9664*128)).astype(jnp.int32)*0 + (key % 9000000).astype(jnp.int32)
    rows = jnp.stack([jnp.take(wmat, base + k*384 + r*128, axis=0) for r in range(3) for k in range(4)], axis=-1)
    return rows[0].sum() + c

timeit(f_sort, "2x argsort + 1 gather")
timeit(f_sort_gather, "2x argsort + o/d gathers + 5 unsort gathers")
timeit(f_rays_prep, "rays stack/reshape/transpose")
timeit(f_recompute, "12-take recompute gather")
