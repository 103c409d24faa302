import functools, time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def run(grid, blocks_per_step):
    Bp = 1<<20
    rows = Bp // 128
    rays = jnp.asarray(np.random.rand(rows, 8, 128).astype(np.float32))
    def kern(r_ref, t_ref, c_ref, d_ref):
        t_ref[...] = r_ref[:, 7, :] * 2.0
        c_ref[...] = jnp.zeros_like(t_ref[...], jnp.int32)
        d_ref[...] = r_ref[:, 0, :]
    RB = (rows // grid)
    spec_in = pl.BlockSpec((RB, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(kern, grid=(grid,),
        in_specs=[spec_in],
        out_specs=[ospec, ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((rows,128), jnp.float32),
                   jax.ShapeDtypeStruct((rows,128), jnp.int32),
                   jax.ShapeDtypeStruct((rows,128), jnp.float32)])
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(r, k):
        def body(c, _):
            t, _, _ = f(r + c[:, None, None] * 0.0)
            return t[:, 0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(rows), None, length=k)
        return acc
    np.asarray(chain(rays, 1)[:1]); np.asarray(chain(rays, 5)[:1])
    t0=time.time(); np.asarray(chain(rays,1)[:1]); t1=time.time()-t0
    t0=time.time(); np.asarray(chain(rays,5)[:1]); t5=time.time()-t0
    print(f"grid={grid}: {(t5-t1)/4*1e3:.2f} ms per call = {(t5-t1)/4/grid*1e6:.1f} us/step", flush=True)

run(1024, 1)
run(32, 32)
