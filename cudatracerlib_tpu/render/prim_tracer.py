"""PrimTracer: single-bounce AOV / debug renderer.

Counterpart of reference ``Integrators/PrimTracer.{h,cu}`` and its 15 draw
modes (PrimTracer.h:7-9: linear depth, D3D depth, normals, UVs, barycentrics,
first-hit emission/BSDF/direct light...). One jitted function returns a dict
of AOV images — the TPU-native analogue of the reference's per-mode kernels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel import traversal
from ..math import montecarlo as mc
from ..sampling.rng import Sampler
from ..scene import bsdf as bsdf_mod
from ..scene import lights as lights_mod
from ..scene import sensors
from ..scene import scene as scene_mod
from ..scene.scene import Scene, gather_mat_params, make_interaction


@partial(jax.jit, static_argnames=("width", "height"))
def render_aovs(scene: Scene, width: int, height: int, seed=0):
    """Render first-hit AOVs at 1 spp (pixel centers)."""
    n_px = width * height
    pid = jnp.arange(n_px, dtype=jnp.uint32)
    px = (pid % width).astype(jnp.float32)
    py = (pid // width).astype(jnp.float32)
    uv = jnp.stack([(px + 0.5) / width, (py + 0.5) / height], axis=-1)
    smp = Sampler.create(seed, pid, 0)
    smp, u_ap = smp.next_2d()
    o, d, _ = sensors.sample_ray(scene.camera, uv, u_ap)

    hit = traversal.intersect(scene.bvh, o, d)
    it = make_interaction(scene, o, d, hit)
    v = it.valid[..., None]

    depth = jnp.where(it.valid, hit.t, 0.0)
    normal_g = jnp.where(v, it.n_geo * 0.5 + 0.5, 0.0)
    normal_s = jnp.where(v, it.frame.n * 0.5 + 0.5, 0.0)
    uv_aov = jnp.where(v, jnp.concatenate([it.uv, jnp.zeros_like(it.uv[..., :1])], -1), 0.0)
    bary = jnp.concatenate([hit.bary, jnp.zeros_like(hit.bary[..., :1])], -1)
    bary = jnp.where(v, bary, 0.0)
    mat = jnp.where(it.valid, it.mat_id.astype(jnp.float32), -1.0)
    prim = jnp.where(it.valid, it.prim.astype(jnp.float32), -1.0)

    # first-hit albedo + emission
    mp = gather_mat_params(scene, it)
    albedo = jnp.where(v, mp.albedo, 0.0)
    mat_light = scene.materials.light_id[it.mat_id]
    lid = jnp.maximum(mat_light, 0)
    Le = lights_mod.eval_area_emission(scene.lights, lid, it.n_geo, -d)
    Le = jnp.where((mat_light >= 0)[..., None] & v, Le, 0.0)

    # one-sample direct lighting (draw mode "first hit direct")
    smp, u_sel = smp.next_1d()
    smp, u_l2 = smp.next_2d()
    if scene.n_lights > 0:
        lsel, lpmf, _ = mc.sample_discrete(scene.light_cdf, u_sel)
        ds, Lrad = lights_mod.sample_direct(scene.lights, lsel, it.p, u_l2)
        wo_l = it.frame.to_local(-d)
        wi_l = it.frame.to_local(ds.d)
        f_l, _ = bsdf_mod.eval_bsdf(mp, wo_l, wi_l)
        sh_o = it.p + it.n_geo * jnp.sign(
            jnp.sum(it.n_geo * ds.d, -1, keepdims=True)
        ) * 1e-3
        blocked = scene_mod.scene_occluded(scene, sh_o, ds.d, 1e-3, ds.dist - 2e-3)
        pdf = jnp.where(ds.measure == 2, 1.0, ds.pdf) * lpmf
        direct = f_l * Lrad / jnp.maximum(pdf, 1e-12)[..., None]
        direct = jnp.where((it.valid & ~blocked & (pdf > 0))[..., None], direct, 0.0)
    else:
        direct = jnp.zeros_like(albedo)

    def img3(x):
        return x.reshape(height, width, 3)

    def img1(x):
        return x.reshape(height, width)

    return {
        "depth": img1(depth),
        "normal_geo": img3(normal_g),
        "normal_sh": img3(normal_s),
        "uv": img3(uv_aov),
        "bary": img3(bary),
        "mat_id": img1(mat),
        "prim_id": img1(prim),
        "albedo": img3(albedo),
        "emission": img3(Le),
        "direct": img3(direct),
    }
