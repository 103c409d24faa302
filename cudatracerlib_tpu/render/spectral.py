"""Spectral path tracer: hero-wavelength sampling + dispersive dielectrics.

Closes the reference's spectral capability (Math/Spectrum.h:10-15 generic-N
TSpectrum over 360-830 nm; SceneTypes/Dispersion.h wavelength-dependent
IOR) the TPU-native way:

* each path carries N_WAVES spectral radiance samples at hero-rotated
  wavelengths (math/spectral.py; Wilkie et al. 2014) through the SAME
  lax.scan bounce structure as the RGB tracer;
* shading reuses the RGB BSDF/light machinery — every RGB quantity (albedo,
  Fresnel, emitter radiance) is uplifted to the path's wavelengths by the
  calibrated 3-band basis, so achromatic transport matches the RGB tracer
  by construction (the spectral-vs-RGB furnace gate);
* dielectrics with a nonzero Cauchy coefficient (Materials.cauchy_c)
  sample refraction with the HERO wavelength's IOR; on a dispersive
  refraction the companion wavelengths terminate (PBRT v4's
  SampledSpectrum::TerminateSecondary simplification of spectral MIS) —
  glass renders with physically-ordered chromatic fringes;
* everything stays differentiable: d(image)/d(cauchy_c) flows through the
  refraction direction, d(image)/d(radiance) through the uplift matrices.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..image import film as film_mod
from ..math import montecarlo as mc
from ..math import spectral as sp
from ..sampling.rng import Sampler
from ..scene import bsdf as bsdf_mod
from ..scene import lights as lights_mod
from ..scene import sensors
from ..scene import scene as scene_mod
from ..scene.scene import (Scene, gather_mat_params, make_interaction,
                           small_gather)
from .path_tracer import PTConfig, _light_select_pmf, _offset_ray, _select_light

LAMBDA_D_UM = 0.5893  # sodium d-line (the wavelength Materials.eta is quoted at)


def dispersive_eta(eta_d, cauchy_c, lam_nm):
    """n(lambda) = eta_d + C * (1/lam^2 - 1/lam_d^2), lam in um."""
    lam_um = lam_nm * 1e-3
    return eta_d + cauchy_c * (1.0 / (lam_um * lam_um)
                               - 1.0 / (LAMBDA_D_UM * LAMBDA_D_UM))


class _SCarry(NamedTuple):
    o: jnp.ndarray
    d: jnp.ndarray
    throughput: jnp.ndarray   # (B, N_WAVES) spectral path throughput
    L: jnp.ndarray            # (B, N_WAVES) spectral radiance
    active: jnp.ndarray
    sampler: Sampler
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    mono: jnp.ndarray         # (B,) companions already terminated


def trace_radiance_spectral(scene: Scene, o, d, lam, sampler: Sampler,
                            config: PTConfig):
    """Spectral radiance samples (B, N_WAVES) along rays at wavelengths lam
    (B, N_WAVES); lam[:, 0] is the hero."""
    B = o.shape[0]
    NW = lam.shape[-1]
    uplift = lambda rgb: sp.rgb_to_spectrum(rgb, lam)
    init = _SCarry(
        o=o, d=d,
        throughput=jnp.ones((B, NW), jnp.float32),
        L=jnp.zeros((B, NW), jnp.float32),
        active=jnp.ones((B,), bool),
        sampler=sampler,
        prev_pdf=jnp.zeros((B,), jnp.float32),
        prev_delta=jnp.ones((B,), bool),
        mono=jnp.zeros((B,), bool),
    )

    def bounce(carry: _SCarry, depth):
        s = carry.sampler
        hit = scene_mod.scene_intersect(scene, carry.o, carry.d)
        it = make_interaction(scene, carry.o, carry.d, hit,
                              flat=config.flat_shading)
        found = hit.valid & carry.active
        L = carry.L

        # ---- environment on escape ----
        has_env = scene.env_light_id >= 0
        env_ids = jnp.broadcast_to(jnp.maximum(scene.env_light_id, 0), (B,))
        env_rgb = lights_mod.eval_env(scene.lights, env_ids, carry.d)
        w_env = jnp.where(
            carry.prev_delta | ~jnp.asarray(config.direct), 1.0,
            mc.mis_weight(carry.prev_pdf,
                          lights_mod.pdf_env_dir(scene.lights, env_ids,
                                                 carry.d)
                          * _light_select_pmf(scene, env_ids)))
        escaped = carry.active & ~hit.valid & has_env
        L = L + jnp.where(escaped[:, None],
                          carry.throughput * uplift(env_rgb) * w_env[:, None],
                          0.0)

        # ---- area emission at hit (MIS) ----
        mat_light = scene.materials.light_id[it.mat_id]
        emissive = found & (mat_light >= 0)
        lid = jnp.maximum(mat_light, 0)
        Le = lights_mod.eval_area_emission(scene.lights, lid, it.n_geo,
                                           -carry.d)
        pdf_hit = lights_mod.pdf_direct_area(
            scene.lights, lid, carry.o, it.p, it.n_geo
        ) * _light_select_pmf(scene, lid)
        w_hit = jnp.where(carry.prev_delta | ~jnp.asarray(config.direct),
                          1.0, mc.mis_weight(carry.prev_pdf, pdf_hit))
        L = L + jnp.where(emissive[:, None],
                          carry.throughput * uplift(Le) * w_hit[:, None], 0.0)

        # ---- shading setup: hero-wavelength dispersive eta ----
        mp = gather_mat_params(scene, it, config.tex_types)
        cc = small_gather(scene.materials.cauchy_c, it.mat_id)
        eta_hero = dispersive_eta(mp.eta, cc, lam[..., 0])
        mp = mp._replace(eta=eta_hero)
        wo_local = it.frame.to_local(-carry.d)

        # ---- NEE ----
        s, u_sel = s.next_1d()
        s, u_l2 = s.next_2d()
        if config.direct and scene.n_lights > 0:
            lsel, lpmf, _ = _select_light(scene, u_sel)
            ds, Lrad = lights_mod.sample_direct(scene.lights, lsel, it.p,
                                                u_l2,
                                                active=config.light_types)
            f_l, pdf_b_l = bsdf_mod.eval_bsdf(mp, wo_local,
                                              it.frame.to_local(ds.d),
                                              active=config.bsdf_types)
            sh_o = _offset_ray(it.p, it.n_geo, ds.d, config.ray_eps)
            blocked = scene_mod.scene_occluded(
                scene, sh_o, ds.d, config.ray_eps,
                ds.dist - 2.0 * config.ray_eps)
            is_delta_l = ds.measure == 2
            lpmf = jax.lax.stop_gradient(lpmf)
            pdf_l = jnp.where(is_delta_l, 1.0,
                              jax.lax.stop_gradient(ds.pdf)) * lpmf
            w_nee = jnp.where(is_delta_l, 1.0, mc.mis_weight(pdf_l, pdf_b_l))
            contrib = carry.throughput * uplift(f_l * Lrad) \
                * (w_nee / jnp.maximum(pdf_l, 1e-12))[:, None]
            ok = found & ~blocked & (ds.pdf > 0) & (lpmf > 0)
            L = L + jnp.where(ok[:, None], contrib, 0.0)

        # ---- BSDF sample (hero-eta directions) ----
        s, u_b2 = s.next_2d()
        s, u_b1 = s.next_1d()
        bs = bsdf_mod.sample_bsdf(mp, wo_local, u_b2, u_b1,
                                  active=config.bsdf_types)
        wi_world = it.frame.to_world(bs.wi)
        new_o = _offset_ray(it.p, it.n_geo, wi_world, config.ray_eps)
        tp = carry.throughput * uplift(bs.weight)

        # dispersive refraction: companions terminate (hero continues) —
        # their delta lobe points elsewhere, so their value along the
        # hero's direction is zero. This is hero-wavelength MIS (Wilkie et
        # al. 2014 §4) in the delta limit: the per-wavelength pdf of the
        # sampled direction is p for the hero and 0 for every companion, so
        # the single-sample MIS estimator weight is p / (mean_k p_k) =
        # N_WAVES on the surviving hero lane — spectral_to_rgb averages
        # over N_WAVES lanes, and without this factor all light transported
        # through dispersive dielectrics lands ~N_WAVES x too dark.
        t = mp.bsdf_type
        # transmission lobes: E_DELTA_TRANSMISSION | E_GLOSSY_TRANSMISSION
        refracted = (bs.sampled_type & ((1 << 5) | (1 << 3))) > 0
        dispersive = found & refracted & (cc > 0.0) & (
            (t == bsdf_mod.DIELECTRIC) | (t == bsdf_mod.THINDIELECTRIC)
            | (t == bsdf_mod.ROUGHDIELECTRIC))
        # the MIS factor applies ONCE — after the first dispersive event the
        # path is monochromatic and later dispersive refractions neither
        # re-kill nor re-weight (PBRT TerminateSecondary early-outs when
        # secondaries are already terminated)
        nw = lam.shape[-1]
        first_disp = dispersive & ~carry.mono
        kill = first_disp[:, None] & (jnp.arange(nw) > 0)
        hero_w = jnp.where(first_disp[:, None] & (jnp.arange(nw) == 0),
                           jnp.float32(nw), 1.0)
        tp = jnp.where(kill, 0.0, tp * hero_w)

        cont = found & (bs.pdf > 0) & (jnp.max(tp, axis=-1) > 0)
        s, u_rr = s.next_1d()
        p_cont = jax.lax.stop_gradient(mc.russian_roulette_prob(
            jnp.max(tp, axis=-1), depth, config.rr_start))
        cont = cont & (u_rr < p_cont)
        tp = tp / jnp.maximum(p_cont, 1e-6)[:, None]

        delta_now = bsdf_mod.is_delta(mp) | ((bs.sampled_type & (16 | 32 | 64)) > 0)
        return _SCarry(
            o=jnp.where(cont[:, None], new_o, carry.o),
            d=jnp.where(cont[:, None], wi_world, carry.d),
            throughput=jnp.where(cont[:, None], tp, carry.throughput),
            L=L, active=cont, sampler=s,
            prev_pdf=jnp.where(cont, bs.pdf, carry.prev_pdf),
            prev_delta=jnp.where(cont, delta_now, carry.prev_delta),
            mono=carry.mono | first_disp,
        ), None

    body = jax.checkpoint(bounce, prevent_cse=False) if config.remat else bounce
    final, _ = jax.lax.scan(body, init, jnp.arange(config.max_depth))
    return final.L, final.sampler


def _render_spectral_body(scene, width, height, spp, seed, config):
    n_px = width * height
    pixel_id = jnp.tile(jnp.arange(n_px, dtype=jnp.uint32), spp)
    sample_idx = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), n_px)
    sampler = Sampler.create(seed, pixel_id, sample_idx)
    px = (pixel_id % width).astype(jnp.float32)
    py = (pixel_id // width).astype(jnp.float32)
    sampler, jitter = sampler.next_2d()
    uv = jnp.stack([(px + jitter[:, 0]) / width,
                    (py + jitter[:, 1]) / height], -1)
    sampler, u_ap = sampler.next_2d()
    o, d, w_cam = sensors.sample_ray(scene.camera, uv, u_ap)
    sampler, u_lam = sampler.next_1d()
    lam, pdf_lam = sp.sample_wavelengths(u_lam)
    Ls, _ = trace_radiance_spectral(scene, o, d, lam, sampler, config)
    rgb = sp.spectral_to_rgb(Ls, lam, pdf_lam) * w_cam
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
    film = film_mod.Film.create(height, width)
    film = film_mod.add_samples(film, pixel_id.astype(jnp.int32), rgb)
    return film_mod.develop(film)


@partial(jax.jit, static_argnames=("width", "height", "spp", "config"))
def _render_spectral_impl(scene, width, height, spp, seed, config):
    return _render_spectral_body(scene, width, height, spp, seed, config)


def render_spectral(scene: Scene, width: int, height: int, spp: int, seed,
                    config: PTConfig = PTConfig()):
    """Full spectral render -> (H, W, 3) linear sRGB image."""
    from .path_tracer import specialize_config

    config = specialize_config(scene, config)
    return _render_spectral_impl(scene, width, height, spp, jnp.uint32(seed),
                                 config)


@partial(jax.jit,
         static_argnames=("width", "height", "spp", "n_passes", "config"))
def _render_spectral_prog_impl(scene, width, height, spp, n_passes, seed,
                               config):
    def one(acc, i):
        return acc + _render_spectral_body(scene, width, height, spp,
                                           seed + i, config), None

    acc, _ = jax.lax.scan(one, jnp.zeros((height, width, 3), jnp.float32),
                          jnp.arange(n_passes, dtype=jnp.uint32))
    return acc / n_passes


def render_spectral_progressive(scene: Scene, width: int, height: int,
                                spp: int, n_passes: int, seed,
                                config: PTConfig = PTConfig()):
    from .path_tracer import specialize_config

    config = specialize_config(scene, config)
    return _render_spectral_prog_impl(scene, width, height, spp, n_passes,
                                      jnp.uint32(seed), config)
