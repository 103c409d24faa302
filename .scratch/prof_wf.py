import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cudatracerlib_tpu.render import wavefront as wf
from cudatracerlib_tpu.render.path_tracer import PTConfig, specialize_config
from cudatracerlib_tpu.scene.shapes import glossy_scene
from cudatracerlib_tpu.scene import sensors
from cudatracerlib_tpu.sampling.rng import Sampler

scene = glossy_scene()
cfg = specialize_config(scene, PTConfig(max_depth=5))
C = 1 << 20
W = H = 256; spp = 80
total = W*H*spp
n_px = W*H

pool = wf._Pool(
    o=jnp.zeros((C,3)), d=jnp.broadcast_to(jnp.asarray([0.,0.,1.]), (C,3)),
    throughput=jnp.ones((C,3)), L=jnp.ones((C,3))*0.1,
    pixel=jnp.arange(C, dtype=jnp.int32) % n_px, depth=jnp.zeros((C,), jnp.int32),
    state=jnp.arange(C, dtype=jnp.uint32), prev_pdf=jnp.zeros((C,)),
    prev_delta=jnp.ones((C,), bool), eta_scale=jnp.ones((C,)),
    path_len=jnp.zeros((C,)), alive=(jnp.arange(C) % 2 == 0),
)
film_rgb = jnp.zeros((n_px, 3)); film_w = jnp.zeros((n_px,))

def refill_flush(c, p, film_rgb, film_w):
    dead = ~p.alive
    rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    new_id = jnp.int32(1000) + rank + (c*1e-20).astype(jnp.int32)
    take = dead & (new_id < total)
    flush = dead & (p.pixel >= 0)
    film_rgb2 = film_rgb.at[jnp.where(flush, p.pixel, n_px), :].add(
        jnp.where(flush[:, None], p.L, 0.0), mode="drop")
    film_w2 = film_w.at[jnp.where(flush, p.pixel, n_px)].add(
        jnp.where(flush, 1.0, 0.0), mode="drop")
    pix_n, o_n, d_n, state_n = wf._camera_ray(scene, jnp.maximum(new_id, 0), jnp.uint32(1), W, H, spp)
    p2 = wf._Pool(
        o=jnp.where(take[:, None], o_n, p.o),
        d=jnp.where(take[:, None], d_n, p.d),
        throughput=jnp.where(take[:, None], 1.0, p.throughput),
        L=jnp.where(take[:, None], 0.0, p.L),
        pixel=jnp.where(take, pix_n, jnp.where(dead, -1, p.pixel)),
        depth=jnp.where(take, 0, p.depth),
        state=jnp.where(take, state_n, p.state),
        prev_pdf=jnp.where(take, 0.0, p.prev_pdf),
        prev_delta=jnp.where(take, True, p.prev_delta),
        eta_scale=jnp.where(take, 1.0, p.eta_scale),
        path_len=jnp.where(take, 0.0, p.path_len),
        alive=p.alive | take,
    )
    return c + film_rgb2[0,0]*1e-20 + film_w2[0]*1e-20 + p2.o[0,0]*1e-20 + p2.state[0].astype(jnp.float32)*1e-30

@functools.partial(jax.jit, static_argnums=0)
def run(n):
    def f(c, _):
        return refill_flush(c, pool, film_rgb, film_w), None
    c, _ = jax.lax.scan(f, jnp.float32(0), None, length=n)
    return c
np.asarray(run(2)); np.asarray(run(12))
t0=time.perf_counter(); np.asarray(run(2)); t2=time.perf_counter()-t0
t0=time.perf_counter(); np.asarray(run(12)); t12=time.perf_counter()-t0
print(f"refill+flush+pool-where marginal: {(t12-t2)/10*1000:.2f} ms")
