import functools, time, numpy as np, jax, jax.numpy as jnp
B = 1<<20
rng = np.random.default_rng(0)
tab8 = jnp.asarray(rng.random((B, 8)).astype(np.float32))
idx = jnp.asarray(rng.permutation(B).astype(np.int32))
wmat = jnp.asarray(rng.random((37_000_000,)).astype(np.float32))

def timeit(f, name):
    g = jax.jit(lambda c: jax.lax.scan(lambda a,_:(a+f(c+a.astype(jnp.int32)*0),None), jnp.float32(0), None, length=5)[0])
    g1 = jax.jit(lambda c: jax.lax.scan(lambda a,_:(a+f(c+a.astype(jnp.int32)*0),None), jnp.float32(0), None, length=1)[0])
    np.asarray(g1(idx)[None][:1]); np.asarray(g(idx)[None][:1])
    t0=time.time(); np.asarray(g1(idx)[None][:1]); t1=time.time()-t0
    t0=time.time(); np.asarray(g(idx)[None][:1]); t5=time.time()-t0
    print(f"{name}: {(t5-t1)/4*1e3:.1f} ms", flush=True)

timeit(lambda ix: jnp.sum(tab8[ix]), "row gather (B,8)[idx]")
timeit(lambda ix: sum(jnp.sum(jnp.take(tab8[:, k], ix)) for k in range(8)), "8x per-component takes")
timeit(lambda ix: jnp.sum(jnp.take(tab8[:, 0], ix)), "1x component take (B,)")
timeit(lambda ix: sum(jnp.sum(jnp.take(wmat, ix + k*B)) for k in range(12)), "12x takes from 37M table")
timeit(lambda ix: jnp.sum(jnp.take(tab8.reshape(-1), (ix[:, None]*8 + jnp.arange(8)[None, :]).reshape(-1))), "flat row-expand take")
