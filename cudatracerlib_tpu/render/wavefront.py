"""Wavefront path tracer: persistent ray pool with refill-on-death.

TPU-native counterpart of the reference WavefrontPathTracer
(Integrators/PseudoRealtime/WavefrontPathTracer.{h,cu}) + DoubleRayBuffer
(Kernel/DoubleRayBuffer.h). Design translation (SURVEY.md §7):

  * the CUDA atomic ray queues become a fixed-capacity SoA pool;
  * "compaction" is refill-on-death: every iteration, lanes whose path
    terminated are immediately re-seeded with the next unconsumed camera ray
    (prefix-sum assignment, the deterministic analogue of the reference's
    atomic-counter fetch WavefrontPathTracer.cu:17-49);
  * one iteration = intersect(all lanes) -> shade -> NEE shadow ray ->
    bsdf sample -> RR, i.e. the reference's per-depth kernel chain
    (generate / intersect / iterate) fused into one jitted step;
  * the loop is a `lax.while_loop` that runs until the camera-ray supply is
    exhausted and every lane has died. Lane utilization stays ~100% versus the
    megakernel's exponential die-off, which is exactly the wavefront win once
    warp divergence is off the table.

This is the intended engine for BVH-bound scenes (BASELINE config 3).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel import traversal
from ..image import film as film_mod
from ..math import montecarlo as mc
from ..sampling.rng import Sampler, hash_combine
from ..scene import bsdf as bsdf_mod
from ..scene import lights as lights_mod
from ..scene import sensors
from ..scene import scene as scene_mod
from ..scene.scene import Scene, gather_mat_params, make_interaction
from .path_tracer import (
    PTConfig,
    _light_select_pmf,
    _offset_ray,
    _select_light,
    specialize_config,
)


class _Pool(NamedTuple):
    o: jnp.ndarray           # (C, 3)
    d: jnp.ndarray           # (C, 3)
    throughput: jnp.ndarray  # (C, 3)
    L: jnp.ndarray           # (C, 3) accumulated radiance of the current path
    pixel: jnp.ndarray       # (C,) int32 flat pixel id (-1 = empty lane)
    depth: jnp.ndarray       # (C,) int32 current bounce index
    state: jnp.ndarray       # (C,) uint32 sampler state
    prev_pdf: jnp.ndarray    # (C,)
    prev_delta: jnp.ndarray  # (C,) bool
    alive: jnp.ndarray       # (C,) bool


class _WFState(NamedTuple):
    pool: _Pool
    next_ray: jnp.ndarray    # () int32 — next camera-ray id to hand out
    film_rgb: jnp.ndarray    # (H*W, 3)
    film_w: jnp.ndarray      # (H*W,)
    iters: jnp.ndarray       # ()


def _camera_ray(scene: Scene, ray_id, seed, width, height, spp):
    """Decode ray id -> (pixel, o, d, sampler_state). ray_id: (K,) int32."""
    n_px = width * height
    pixel = (ray_id % n_px).astype(jnp.uint32)
    sample = (ray_id // n_px).astype(jnp.uint32)
    smp = Sampler.create(seed, pixel, sample)
    smp, jitter = smp.next_2d()
    px = (pixel % width).astype(jnp.float32)
    py = (pixel // width).astype(jnp.float32)
    uv = jnp.stack([(px + jitter[:, 0]) / width, (py + jitter[:, 1]) / height], -1)
    smp, u_ap = smp.next_2d()
    o, d, _ = sensors.sample_ray(scene.camera, uv, u_ap)
    return pixel.astype(jnp.int32), o, d, smp.state


@partial(jax.jit, static_argnames=("width", "height", "spp", "config", "capacity"))
def _wavefront_impl(scene: Scene, width: int, height: int, spp: int, seed,
                    config: PTConfig, capacity: int):
    C = capacity
    total = width * height * spp
    n_px = width * height

    empty_pool = _Pool(
        o=jnp.zeros((C, 3)), d=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (C, 3)),
        throughput=jnp.zeros((C, 3)), L=jnp.zeros((C, 3)),
        pixel=jnp.full((C,), -1, jnp.int32), depth=jnp.zeros((C,), jnp.int32),
        state=jnp.zeros((C,), jnp.uint32),
        prev_pdf=jnp.zeros((C,)), prev_delta=jnp.ones((C,), bool),
        alive=jnp.zeros((C,), bool),
    )
    init = _WFState(
        pool=empty_pool,
        next_ray=jnp.int32(0),
        film_rgb=jnp.zeros((n_px, 3)),
        film_w=jnp.zeros((n_px,)),
        iters=jnp.int32(0),
    )

    lt = config.light_types
    has_env_static = lt is None or (lights_mod.INFINITE in lt) or (lights_mod.CONSTANT_ENV in lt)
    has_area_static = lt is None or (lights_mod.AREA_LIGHT in lt)

    def cond(st: _WFState):
        return ((st.next_ray < total) | jnp.any(st.pool.alive)) & (
            st.iters < config.max_depth + total // C + 64
        )

    def step(st: _WFState) -> _WFState:
        p = st.pool

        # ---- refill dead lanes with fresh camera rays (prefix-sum assign,
        #      the deterministic DoubleRayBuffer insert) ----
        dead = ~p.alive
        rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        new_id = st.next_ray + rank
        take = dead & (new_id < total)
        # flush finished paths' radiance to the film before reuse
        flush = dead & (p.pixel >= 0)
        film_rgb = st.film_rgb.at[jnp.where(flush, p.pixel, n_px), :].add(
            jnp.where(flush[:, None], jnp.nan_to_num(p.L, nan=0.0, posinf=0.0, neginf=0.0), 0.0),
            mode="drop",
        )
        film_w = st.film_w.at[jnp.where(flush, p.pixel, n_px)].add(
            jnp.where(flush, 1.0, 0.0), mode="drop"
        )
        n_taken = jnp.sum(take.astype(jnp.int32))

        pix_n, o_n, d_n, state_n = _camera_ray(scene, jnp.maximum(new_id, 0), seed,
                                               width, height, spp)
        pool = _Pool(
            o=jnp.where(take[:, None], o_n, p.o),
            d=jnp.where(take[:, None], d_n, p.d),
            throughput=jnp.where(take[:, None], 1.0, p.throughput),
            L=jnp.where(take[:, None], 0.0, p.L),
            pixel=jnp.where(take, pix_n, jnp.where(dead, -1, p.pixel)),
            depth=jnp.where(take, 0, p.depth),
            state=jnp.where(take, state_n, p.state),
            prev_pdf=jnp.where(take, 0.0, p.prev_pdf),
            prev_delta=jnp.where(take, True, p.prev_delta),
            alive=p.alive | take,
        )
        p = pool

        # ---- intersect all lanes ----
        hit = scene_mod.scene_intersect(scene, p.o, p.d)
        it = make_interaction(scene, p.o, p.d, hit)
        found = hit.valid & p.alive
        L = p.L
        s = Sampler(state=p.state)

        # ---- env + emission (MIS) ----
        if has_env_static:
            env_ids = jnp.broadcast_to(jnp.maximum(scene.env_light_id, 0), (C,))
            env_L = lights_mod.eval_env(scene.lights, env_ids, p.d)
            w_env = jnp.where(
                p.prev_delta | ~jnp.asarray(config.direct), 1.0,
                mc.mis_weight(p.prev_pdf,
                              lights_mod.pdf_env_dir(scene.lights, env_ids, p.d)
                              * _light_select_pmf(scene, env_ids)))
            escaped = p.alive & ~hit.valid & (scene.env_light_id >= 0)
            L = L + jnp.where(escaped[:, None], p.throughput * env_L * w_env[:, None], 0.0)

        if has_area_static:
            mat_light = scene.materials.light_id[it.mat_id]
            emissive = found & (mat_light >= 0)
            lid = jnp.maximum(mat_light, 0)
            Le = lights_mod.eval_area_emission(scene.lights, lid, it.n_geo, -p.d)
            pdf_hit = lights_mod.pdf_direct_area(scene.lights, lid, p.o, it.p, it.n_geo) \
                * _light_select_pmf(scene, lid)
            w_hit = jnp.where(p.prev_delta | ~jnp.asarray(config.direct), 1.0,
                              mc.mis_weight(p.prev_pdf, pdf_hit))
            L = L + jnp.where(emissive[:, None], p.throughput * Le * w_hit[:, None], 0.0)

        # ---- NEE ----
        mp = gather_mat_params(scene, it, config.tex_types)
        wo_local = it.frame.to_local(-p.d)
        s, u_sel = s.next_1d()
        s, u_l2 = s.next_2d()
        if config.direct and scene.n_lights > 0:
            lsel, lpmf, _ = _select_light(scene, u_sel)
            lpmf = jax.lax.stop_gradient(lpmf)
            ds, Lrad = lights_mod.sample_direct(scene.lights, lsel, it.p, u_l2,
                                                active=config.light_types)
            f_l, pdf_b_l = bsdf_mod.eval_bsdf(mp, wo_local, it.frame.to_local(ds.d),
                                              active=config.bsdf_types)
            sh_o = _offset_ray(it.p, it.n_geo, ds.d, config.ray_eps)
            blocked = scene_mod.scene_occluded(scene, sh_o, ds.d, config.ray_eps,
                                         ds.dist - 2.0 * config.ray_eps)
            is_delta_l = ds.measure == 2
            pdf_l = jnp.where(is_delta_l, 1.0, jax.lax.stop_gradient(ds.pdf)) * lpmf
            w_nee = jnp.where(is_delta_l, 1.0, mc.mis_weight(pdf_l, pdf_b_l))
            contrib = p.throughput * f_l * Lrad * (w_nee / jnp.maximum(pdf_l, 1e-12))[:, None]
            ok = found & ~blocked & (ds.pdf > 0) & (lpmf > 0)
            L = L + jnp.where(ok[:, None], contrib, 0.0)

        # ---- bsdf sample + RR ----
        s, u_b2 = s.next_2d()
        s, u_b1 = s.next_1d()
        bs = bsdf_mod.sample_bsdf(mp, wo_local, u_b2, u_b1, active=config.bsdf_types)
        wi_world = it.frame.to_world(bs.wi)
        throughput = p.throughput * bs.weight
        cont = found & (bs.pdf > 0) & (jnp.max(jnp.abs(throughput), -1) > 0) \
            & (p.depth + 1 < config.max_depth)
        s, u_rr = s.next_1d()
        p_cont = jax.lax.stop_gradient(
            mc.russian_roulette_prob(jnp.max(throughput, -1), p.depth, config.rr_start))
        cont = cont & (u_rr < p_cont)
        throughput = throughput / jnp.maximum(p_cont, 1e-6)[:, None]
        delta_now = bsdf_mod.is_delta(mp) | ((bs.sampled_type & (16 | 32 | 64)) > 0)

        new_pool = _Pool(
            o=jnp.where(cont[:, None], _offset_ray(it.p, it.n_geo, wi_world, config.ray_eps), p.o),
            d=jnp.where(cont[:, None], wi_world, p.d),
            throughput=jnp.where(cont[:, None], throughput, p.throughput),
            L=L,
            pixel=p.pixel,
            depth=p.depth + 1,
            state=s.state,
            prev_pdf=jnp.where(cont, bs.pdf, p.prev_pdf),
            prev_delta=jnp.where(cont, delta_now, p.prev_delta),
            alive=cont,
        )
        return _WFState(
            pool=new_pool,
            next_ray=st.next_ray + n_taken,
            film_rgb=film_rgb,
            film_w=film_w,
            iters=st.iters + 1,
        )

    final = jax.lax.while_loop(cond, step, init)
    # flush the lanes that are still carrying radiance (all dead by now)
    p = final.pool
    flush = p.pixel >= 0
    film_rgb = final.film_rgb.at[jnp.where(flush, p.pixel, n_px), :].add(
        jnp.where(flush[:, None], jnp.nan_to_num(p.L, nan=0.0, posinf=0.0, neginf=0.0), 0.0),
        mode="drop")
    film_w = final.film_w.at[jnp.where(flush, p.pixel, n_px)].add(
        jnp.where(flush, 1.0, 0.0), mode="drop")
    img = film_rgb / jnp.maximum(film_w, 1e-8)[:, None]
    return img.reshape(height, width, 3)


def render_wavefront(scene: Scene, width: int, height: int, spp: int, seed,
                     config: PTConfig = PTConfig(), capacity: int | None = None):
    """Wavefront render; capacity defaults to one full spp wave."""
    config = specialize_config(scene, config)
    if capacity is None:
        capacity = min(width * height * spp, 1 << 20)
    return _wavefront_impl(scene, width, height, spp, jnp.uint32(seed), config,
                           capacity)
