"""Phase functions for participating media.

Counterpart of reference ``SceneTypes/PhaseFunction.h:111`` (HGPhaseFunction:38,
IsotropicPhaseFunction:61, KajiyaKayPhaseFunction:77, RayleighPhaseFunction:95).
Same vectorized-dispatch design as bsdf.py. Directions in world space; `wo`
points backward along the incoming ray, `wi` is the new direction.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..math.frame import Frame
from ..math.vecmath import INV_FOURPI, PI, dot, normalize, safe_sqrt
from ..sampling.records import PhaseSample

ISOTROPIC = 0
HG = 1
RAYLEIGH = 2
KAJIYA_KAY = 3


def eval_phase(ptype, g, wo, wi):
    """Phase function value p(wo -> wi) (normalized over the sphere)."""
    cos_t = dot(-wo, wi)  # angle between propagation directions

    iso = jnp.full(cos_t.shape, INV_FOURPI)

    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_t
    hg = INV_FOURPI * (1.0 - g2) / jnp.maximum(denom * safe_sqrt(denom), 1e-8)

    ray = (3.0 / (16.0 * PI)) * (1.0 + cos_t * cos_t)

    # Kajiya-Kay hair phase (diffuse+specular around fiber; simplified to the
    # normalized sin-based diffuse term of the reference)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    kk = sin_t * (3.0 / (8.0 * PI))  # integrates to ~1 over sphere (3pi^2/8 norm approx)

    out = jnp.where(ptype == HG, hg, iso)
    out = jnp.where(ptype == RAYLEIGH, ray, out)
    out = jnp.where(ptype == KAJIYA_KAY, kk, out)
    return out


def pdf_phase(ptype, g, wo, wi):
    """Sampling pdf: HG samples exactly; others sample isotropically."""
    cos_t = dot(-wo, wi)
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_t
    hg = INV_FOURPI * (1.0 - g2) / jnp.maximum(denom * safe_sqrt(denom), 1e-8)
    return jnp.where(ptype == HG, hg, jnp.full(cos_t.shape, INV_FOURPI))


def sample_phase(ptype, g, wo, u2) -> PhaseSample:
    """Sample a new direction; weight = p/pdf (1 for exact samplers)."""
    # HG inverse-CDF cos theta
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr_term = (1.0 - safe_g * safe_g) / (1.0 + safe_g * (2.0 * u2[..., 0] - 1.0))
    cos_hg = (1.0 + safe_g * safe_g - sqr_term * sqr_term) / (2.0 * safe_g)
    cos_iso = 1.0 - 2.0 * u2[..., 0]
    use_hg = (ptype == HG) & (jnp.abs(g) >= 1e-3)
    cos_t = jnp.where(use_hg, jnp.clip(cos_hg, -1.0, 1.0), cos_iso)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * PI * u2[..., 1]
    fwd = normalize(-wo)
    frame = Frame.from_normal(fwd)
    wi = frame.to_world(
        jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    )
    p = eval_phase(ptype, g, wo, wi)
    pdf = pdf_phase(ptype, g, wo, wi)
    weight = p / jnp.maximum(pdf, 1e-12)
    return PhaseSample(wi=wi, weight=weight, pdf=pdf)
