import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cudatracerlib_tpu.render.path_tracer import PTConfig, specialize_config, surface_bounce, _select_light, _offset_ray
from cudatracerlib_tpu.scene.shapes import glossy_scene
from cudatracerlib_tpu.scene import scene as scene_mod, sensors, lights as lights_mod, bsdf as bsdf_mod, shade_pack as sp
from cudatracerlib_tpu.ops.shade_gather import packed_gather
from cudatracerlib_tpu.sampling.rng import Sampler

scene = glossy_scene()
cfg = specialize_config(scene, PTConfig(max_depth=5))
B = 1 << 20
W = H = 256
pix = jnp.arange(B, dtype=jnp.uint32) % (W*H)
smp = Sampler.create(jnp.uint32(0), pix, pix*0)
smp, j2 = smp.next_2d()
px = (pix % W).astype(jnp.float32); py = (pix // W).astype(jnp.float32)
uv = jnp.stack([(px + j2[:,0])/W, (py + j2[:,1])/H], -1)
smp, uap = smp.next_2d()
o, d, _ = sensors.sample_ray(scene.camera, uv, uap)
pack = sp.build_shade_pack(scene)
hit0 = scene_mod.scene_intersect(scene, o, d, refine=False)
row0 = packed_gather(pack, jnp.maximum(hit0.prim, 0))
it0 = sp.pack_interaction(row0, o, d, hit0)
mp0 = sp.pack_mat_params(scene, row0, it0.uv, cfg.tex_types)
wo_l0 = it0.frame.to_local(-d)
row0, it0, mp0, wo_l0 = jax.block_until_ready((row0, it0, mp0, wo_l0))

def marginal(name, body, n1=2, n2=10):
    @functools.partial(jax.jit, static_argnums=0)
    def run(n):
        def f(c, _):
            out = body(c)
            return out, None
        c, _ = jax.lax.scan(f, jnp.float32(0.0), None, length=n)
        return c
    np.asarray(run(n1)); np.asarray(run(n2))
    t0=time.perf_counter(); np.asarray(run(n1)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); np.asarray(run(n2)); t2=time.perf_counter()-t0
    print(f"{name:34s} {(t2-t1)/(n2-n1)*1000:8.1f} ms")

# 1 closest (refine=False)
def f_closest(c):
    h = scene_mod.scene_intersect(scene, o + c*1e-9, d, refine=False)
    return c + h.t[0]*1e-20
marginal("closest-hit raw", f_closest)

# 2 any-hit
def f_any(c):
    v = scene_mod.scene_occluded(scene, it0.p + c*1e-9, d)
    return c + v[0]*1e-20
marginal("any-hit", f_any)

# 3 pack gather + interaction + params
def f_pack(c):
    r = packed_gather(pack, jnp.maximum(hit0.prim, 0) + (c*1e-20).astype(jnp.int32))
    it = sp.pack_interaction(r, o, d, hit0)
    mp = sp.pack_mat_params(scene, r, it.uv, cfg.tex_types)
    return c + it.p[0,0]*1e-20 + mp.albedo[0,0]*1e-20
marginal("pack gather+fillDG+params", f_pack)

# 4 NEE (sample_direct + eval + occl excluded)
smp2, u_sel = smp.next_1d()
smp2, u_l2 = smp2.next_2d()
def f_nee(c):
    lsel, lpmf, _ = _select_light(scene, u_sel + c*1e-12)
    ds, Lrad = lights_mod.sample_direct(scene.lights, lsel, it0.p, u_l2, active=cfg.light_types)
    f_l, pdf_b_l = bsdf_mod.eval_bsdf(mp0, wo_l0, it0.frame.to_local(ds.d), active=cfg.bsdf_types)
    return c + f_l[0,0]*1e-20 + pdf_b_l[0]*1e-20
marginal("NEE sample+eval (no occl)", f_nee)

# 5 env eval + pdf
def f_env(c):
    env_ids = jnp.broadcast_to(jnp.maximum(scene.env_light_id, 0), (B,))
    eL = lights_mod.eval_env(scene.lights, env_ids, d + c*1e-12)
    ep = lights_mod.pdf_env_dir(scene.lights, env_ids, d + c*1e-12)
    return c + eL[0,0]*1e-20 + ep[0]*1e-20
marginal("eval_env+pdf_env", f_env)

# 6 sample_bsdf
smp3, u_b2 = smp2.next_2d()
smp3, u_b1 = smp3.next_1d()
def f_samp(c):
    bs = bsdf_mod.sample_bsdf(mp0, wo_l0, u_b2 + c*1e-12, u_b1, active=cfg.bsdf_types)
    return c + bs.wi[0,0]*1e-20
marginal("sample_bsdf", f_samp)

# 7 RNG 6 draws
def f_rng(c):
    s = Sampler(state=smp.state + (c*1e-20).astype(jnp.uint32))
    tot = 0.0
    for _ in range(3):
        s, u = s.next_2d()
        tot = tot + u[0,0]
    return c + tot*1e-20
marginal("RNG 6 draws", f_rng)

# 8 film scatter
film = jnp.zeros((W*H, 3))
Lw = jnp.abs(d)
def f_film(c):
    f2 = film.at[pix.astype(jnp.int32), :].add(Lw + c*1e-12)
    return c + f2[0,0]*1e-20
marginal("film scatter-add 1M->65k", f_film)

# 9 full surface_bounce composed
def f_bounce(c):
    out = surface_bounce(scene, cfg, o=o + c*1e-9, d=d, active=jnp.ones((B,), bool),
                         throughput=jnp.ones((B,3)), prev_pdf=jnp.zeros((B,)),
                         prev_delta=jnp.ones((B,), bool), eta_scale=jnp.ones((B,)),
                         path_len=jnp.zeros((B,)), sampler=smp, depth=jnp.int32(1),
                         pack=pack)
    return c + out.L_add[0,0]*1e-20 + out.o[0,0]*1e-20
marginal("FULL surface_bounce (pack)", f_bounce, 1, 5)
