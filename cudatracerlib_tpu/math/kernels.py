"""Density-estimation kernels for (progressive) photon mapping.

Counterpart of reference ``Math/Kernel.h:40-279`` (Uniform, Perlin, Tent,
Epanechnikov, Silverman, ...). Each kernel k(t) is defined on t = d/r in [0,1]
and exposes the dimension-dependent normalization c_d so that
sum k(d/r) * c_d / r^d integrates to 1 over the d-ball.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vecmath import PI

UNIFORM = 0
EPANECHNIKOV = 1
TENT = 2
QUARTIC = 3
TRIWEIGHT = 4
TRICUBE = 5
GAUSSIAN = 6
COSINE = 7
SILVERMAN = 8
PERLIN = 9


def _unit_ball_volume(d: int) -> float:
    if d == 1:
        return 2.0
    if d == 2:
        return PI
    return 4.0 / 3.0 * PI


def eval_kernel(kind, t):
    """Unnormalized kernel profile at t = distance/radius, clipped to [0,1]."""
    t = jnp.clip(t, 0.0, 1.0)
    t2 = t * t
    one_m = jnp.maximum(1.0 - t2, 0.0)
    profiles = [
        jnp.ones_like(t),                                   # UNIFORM
        one_m,                                              # EPANECHNIKOV
        1.0 - t,                                            # TENT
        one_m * one_m,                                      # QUARTIC
        one_m * one_m * one_m,                              # TRIWEIGHT
        (1.0 - t * t2) ** 3,                                # TRICUBE
        jnp.exp(-0.5 * t2 * 9.0),                           # GAUSSIAN (3-sigma support)
        jnp.cos(0.5 * PI * t),                              # COSINE
        one_m * one_m,                                      # SILVERMAN (quartic profile)
        1.0 + t2 * t * (2.0 * t2 * t - 3.0 * t2 * 0.0) - 3.0 * t2 + 2.0 * t2 * t,  # PERLIN smoothstep-ish
    ]
    out = profiles[0]
    for i, p in enumerate(profiles[1:], start=1):
        out = jnp.where(kind == i, p, out)
    return out


# Normalization integrals of the profile over the unit d-ball, precomputed for
# d in {1,2,3} by numerical quadrature at import time (cheap, numpy-level).
def normalization(kind, d: int):
    import numpy as np

    t = np.linspace(0.0, 1.0, 4097)
    prof = np.asarray(eval_kernel(kind, jnp.asarray(t, jnp.float32)))
    if d == 1:
        integral = 2.0 * np.trapezoid(prof, t)
    elif d == 2:
        integral = 2.0 * np.pi * np.trapezoid(prof * t, t)
    else:
        integral = 4.0 * np.pi * np.trapezoid(prof * t * t, t)
    return 1.0 / max(integral, 1e-12)


def density_weight(kind, dist, radius, d: int, norm=None):
    """k(dist/radius) * c_d / radius^d — the photon-gather weight."""
    if norm is None:
        norm = normalization(kind, d)
    t = dist / jnp.maximum(radius, 1e-12)
    inside = t <= 1.0
    w = eval_kernel(kind, t) * norm / jnp.maximum(radius, 1e-12) ** d
    return jnp.where(inside, w, 0.0)
