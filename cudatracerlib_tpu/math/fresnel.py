"""Fresnel equations for dielectrics and conductors.

Counterpart of reference ``Math/FresnelHelper.{h,cu}``. The dielectric form
returns the signed transmitted cosine so BSDFs can build the refracted
direction without re-deriving it (the reference does the same).
"""
from __future__ import annotations

import jax.numpy as jnp

from .vecmath import safe_sqrt


def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance at a dielectric interface.

    Args:
      cos_theta_i: signed incident cosine (positive = outside).
      eta: ratio int_ior/ext_ior (scalar or broadcastable).

    Returns:
      (F, cos_theta_t, eta_it, eta_ti): reflectance, *signed* transmitted
      cosine (opposite sign to cos_theta_i; 0 under TIR), relative IOR for the
      actual transmission direction and its inverse.
    """
    eta = jnp.asarray(eta, jnp.float32)
    outside = cos_theta_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)   # eta of transmitted side / incident side
    eta_ti = 1.0 / eta_it

    cti = jnp.abs(cos_theta_i)
    sin2_t = eta_ti * eta_ti * jnp.maximum(0.0, 1.0 - cti * cti)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)

    r_s = (cti - eta_it * cos_t) / jnp.maximum(cti + eta_it * cos_t, 1e-12)
    r_p = (eta_it * cti - cos_t) / jnp.maximum(eta_it * cti + cos_t, 1e-12)
    F = jnp.where(tir, 1.0, 0.5 * (r_s * r_s + r_p * r_p))
    F = jnp.where(jnp.abs(eta_it - 1.0) < 1e-6, 0.0, F)

    cos_theta_t = jnp.where(tir, 0.0, cos_t) * jnp.where(outside, -1.0, 1.0)
    return F, cos_theta_t, eta_it, eta_ti


def fresnel_conductor(cos_theta_i, eta, k):
    """Exact unpolarized conductor Fresnel (eta + i*k), per channel.

    cos_theta_i: (...,); eta, k: (..., 3) or scalars. Returns (..., 3).
    """
    c = jnp.abs(jnp.asarray(cos_theta_i))[..., None]
    eta = jnp.asarray(eta, jnp.float32)
    k = jnp.asarray(k, jnp.float32)
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k

    t0 = e2 - k2 - s2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + c2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def fresnel_diffuse_reflectance(eta):
    """Average reflectance for diffuse illumination (reference's polynomial fit,
    used by plastic/coating for internal scattering normalization)."""
    eta = jnp.asarray(eta, jnp.float32)
    # Fit from d'Eon & Irving / Mitsuba fresnelDiffuseReflectance.
    inv_eta = 1.0 / eta
    f_low = (
        -0.4399
        + 0.7099 * inv_eta
        - 0.3319 * inv_eta**2
        + 0.0636 * inv_eta**3
    )
    f_high = (
        -1.4399 / (eta * eta)
        + 0.7099 / eta
        + 0.6681
        + 0.0636 * eta
    )
    return jnp.where(eta < 1.0, f_low, f_high)
