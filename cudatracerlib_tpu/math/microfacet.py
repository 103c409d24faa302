"""Microfacet distributions (Beckmann / GGX / Phong) with Smith shadowing.

Counterpart of reference ``Engine/MicrofacetDistribution.{h,cu}`` (NDF types at
MicrofacetDistribution.h:13-21). All functions operate in the local shading
frame (+z = normal) on (..., 3) direction arrays, take a distribution type tag
and (alpha_x, alpha_y) roughness, and are differentiable w.r.t. roughness.

GGX additionally supports visible-normal (VNDF) sampling (Heitz 2018), which
is what the reference enables for sampling efficiency.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import frame as fr
from .vecmath import PI, safe_sqrt

BECKMANN = 0
GGX = 1
PHONG = 2


def roughness_to_alpha(roughness):
    """Perceptual roughness -> alpha, clamped away from 0 for stability."""
    return jnp.maximum(jnp.asarray(roughness, jnp.float32), 1e-4)


def phong_exponent_from_alpha(alpha):
    return 2.0 / jnp.maximum(alpha * alpha, 1e-8) - 2.0


def D(dist_type, m, alpha_x, alpha_y):
    """NDF evaluated at half-vector m (local frame)."""
    ct = fr.cos_theta(m)
    ct2 = ct * ct
    valid = ct > 0.0
    ax2 = alpha_x * alpha_x
    ay2 = alpha_y * alpha_y

    # anisotropic exponent term: (x/ax)^2 + (y/ay)^2 over z^2
    e = (m[..., 0] ** 2 / jnp.maximum(ax2, 1e-12) + m[..., 1] ** 2 / jnp.maximum(ay2, 1e-12)) / jnp.maximum(
        ct2, 1e-12
    )

    d_beck = jnp.exp(-e) / jnp.maximum(PI * alpha_x * alpha_y * ct2 * ct2, 1e-12)
    denom = 1.0 + e
    d_ggx = 1.0 / jnp.maximum(PI * alpha_x * alpha_y * ct2 * ct2 * denom * denom, 1e-12)
    n_exp = phong_exponent_from_alpha(jnp.sqrt(jnp.maximum(alpha_x * alpha_y, 1e-12)))
    d_phong = (n_exp + 2.0) / (2.0 * PI) * jnp.power(jnp.maximum(ct, 1e-12), n_exp)

    d = jnp.where(
        dist_type == GGX, d_ggx, jnp.where(dist_type == PHONG, d_phong, d_beck)
    )
    return jnp.where(valid, d, 0.0)


def _proj_roughness2(v, alpha_x, alpha_y):
    """Squared projected roughness along v's azimuth."""
    inv_st2 = fr.sin_theta2(v)
    cp2 = jnp.where(inv_st2 > 1e-9, v[..., 0] ** 2 / jnp.maximum(inv_st2, 1e-9), 1.0)
    sp2 = jnp.where(inv_st2 > 1e-9, v[..., 1] ** 2 / jnp.maximum(inv_st2, 1e-9), 0.0)
    return cp2 * alpha_x * alpha_x + sp2 * alpha_y * alpha_y


def smith_g1(dist_type, v, m, alpha_x, alpha_y):
    """Smith masking for one direction; 0 if v is backfacing w.r.t. m."""
    tan2 = fr.tan_theta2(v)
    a2 = _proj_roughness2(v, alpha_x, alpha_y)

    # Beckmann rational approximation (also used for Phong via alpha mapping).
    a = 1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(a2 * tan2, 0.0)), 1e-12)
    g_beck = jnp.where(
        a >= 1.6,
        1.0,
        (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a),
    )
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))

    g = jnp.where(dist_type == GGX, g_ggx, g_beck)
    side_ok = (fr.cos_theta(v) * fr.cos_theta(m) > 0.0) | (
        jnp.sum(v * m, axis=-1) * fr.cos_theta(v) > 0.0
    )
    front = jnp.sum(v * m, axis=-1) * fr.cos_theta(v) > 0.0
    return jnp.where(front, g, 0.0)


def G(dist_type, wi, wo, m, alpha_x, alpha_y):
    """Separable Smith shadowing-masking."""
    return smith_g1(dist_type, wi, m, alpha_x, alpha_y) * smith_g1(
        dist_type, wo, m, alpha_x, alpha_y
    )


def sample(dist_type, wi, alpha_x, alpha_y, u):
    """Sample a microfacet normal m and its pdf.

    GGX uses VNDF sampling w.r.t. wi (pdf = G1 * |wi.m| * D / |cos wi|);
    Beckmann/Phong sample the NDF (pdf = D * cos_m). Returns (m, pdf).
    """
    # --- GGX VNDF (Heitz 2018), anisotropic ---
    sign = jnp.sign(fr.cos_theta(wi))[..., None]
    wi_up = wi * sign
    vh = jnp.stack(
        [alpha_x * wi_up[..., 0], alpha_y * wi_up[..., 1], wi_up[..., 2]], axis=-1
    )
    vh = vh / jnp.maximum(
        jnp.linalg.norm(vh, axis=-1, keepdims=True), 1e-12
    )
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    T1 = jnp.where(
        (lensq > 1e-9)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), vh.shape),
    )
    T2 = jnp.cross(vh, T1)
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * PI * u[..., 1]
    t1 = r * jnp.cos(phi)
    t2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    t2 = (1.0 - s) * safe_sqrt(1.0 - t1 * t1) + s * t2
    nh = (
        T1 * t1[..., None]
        + T2 * t2[..., None]
        + vh * safe_sqrt(1.0 - t1 * t1 - t2 * t2)[..., None]
    )
    m_ggx = jnp.stack(
        [
            alpha_x * nh[..., 0],
            alpha_y * nh[..., 1],
            jnp.maximum(nh[..., 2], 1e-6),
        ],
        axis=-1,
    )
    m_ggx = m_ggx / jnp.maximum(jnp.linalg.norm(m_ggx, axis=-1, keepdims=True), 1e-12)
    pdf_ggx = pdf(GGX, wi, m_ggx, alpha_x, alpha_y)

    # --- Beckmann NDF sampling (isotropic-exponent form with aniso phi) ---
    phi_b = 2.0 * PI * u[..., 1]
    # anisotropic: stretch phi
    phi_a = jnp.arctan2(alpha_y * jnp.sin(phi_b), alpha_x * jnp.cos(phi_b))
    cp, sp = jnp.cos(phi_a), jnp.sin(phi_a)
    a2inv = cp * cp / jnp.maximum(alpha_x * alpha_x, 1e-12) + sp * sp / jnp.maximum(
        alpha_y * alpha_y, 1e-12
    )
    log_u = jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-12))
    tan2_b = -log_u / jnp.maximum(a2inv, 1e-12)
    ct_b = 1.0 / jnp.sqrt(1.0 + tan2_b)
    st_b = safe_sqrt(1.0 - ct_b * ct_b)
    m_beck = jnp.stack([st_b * cp, st_b * sp, ct_b], axis=-1)
    pdf_beck = D(BECKMANN, m_beck, alpha_x, alpha_y) * ct_b

    # --- Phong NDF sampling ---
    n_exp = phong_exponent_from_alpha(jnp.sqrt(jnp.maximum(alpha_x * alpha_y, 1e-12)))
    ct_p = jnp.power(jnp.maximum(u[..., 0], 1e-12), 1.0 / (n_exp + 2.0))
    st_p = safe_sqrt(1.0 - ct_p * ct_p)
    m_phong = jnp.stack([st_p * jnp.cos(phi_b), st_p * jnp.sin(phi_b), ct_p], axis=-1)
    pdf_phong = D(PHONG, m_phong, alpha_x, alpha_y) * ct_p

    is_ggx = (dist_type == GGX)
    is_phong = (dist_type == PHONG)
    m = jnp.where(
        jnp.asarray(is_ggx)[..., None],
        m_ggx,
        jnp.where(jnp.asarray(is_phong)[..., None], m_phong, m_beck),
    )
    p = jnp.where(is_ggx, pdf_ggx, jnp.where(is_phong, pdf_phong, pdf_beck))
    return m, jnp.maximum(p, 0.0)


def pdf(dist_type, wi, m, alpha_x, alpha_y):
    """pdf of `sample` w.r.t. solid angle of m."""
    d = D(dist_type, m, alpha_x, alpha_y)
    # GGX VNDF pdf
    g1 = smith_g1(GGX, wi, m, alpha_x, alpha_y)
    pdf_vndf = (
        g1 * jnp.abs(jnp.sum(wi * m, axis=-1)) * d / jnp.maximum(fr.abs_cos_theta(wi), 1e-12)
    )
    pdf_ndf = d * jnp.maximum(fr.cos_theta(m), 0.0)
    return jnp.where(dist_type == GGX, pdf_vndf, pdf_ndf)
