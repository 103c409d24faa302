"""Sampling-record pytrees.

Counterpart of reference ``SceneTypes/Samples.h`` (PositionSamplingRecord:94,
DirectionSamplingRecord:113, DirectSamplingRecord:127, BSDFSamplingRecord:167)
— value-type records passed through sampling chains. As NamedTuples they are
pytrees: vmap/scan/grad flow through them unchanged.

Measures match SceneTypes/Samples.h EMeasure.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# EMeasure (SceneTypes/Samples.h)
SOLID_ANGLE = 0
AREA = 1
DISCRETE = 2
LENGTH = 3

# BSDF lobe type flags (SceneTypes/Samples.h:85-92)
E_DIFFUSE_REFLECTION = 1 << 0
E_DIFFUSE_TRANSMISSION = 1 << 1
E_GLOSSY_REFLECTION = 1 << 2
E_GLOSSY_TRANSMISSION = 1 << 3
E_DELTA_REFLECTION = 1 << 4
E_DELTA_TRANSMISSION = 1 << 5
E_NULL = 1 << 6
E_DIFFUSE = E_DIFFUSE_REFLECTION | E_DIFFUSE_TRANSMISSION
E_GLOSSY = E_GLOSSY_REFLECTION | E_GLOSSY_TRANSMISSION
E_SMOOTH = E_DIFFUSE | E_GLOSSY
E_DELTA = E_DELTA_REFLECTION | E_DELTA_TRANSMISSION
E_REFLECTION = E_DIFFUSE_REFLECTION | E_GLOSSY_REFLECTION | E_DELTA_REFLECTION
E_TRANSMISSION = E_DIFFUSE_TRANSMISSION | E_GLOSSY_TRANSMISSION | E_DELTA_TRANSMISSION
E_ALL = E_SMOOTH | E_DELTA

# Transport modes
RADIANCE = 0
IMPORTANCE = 1


class PositionSample(NamedTuple):
    p: jnp.ndarray        # (..., 3)
    n: jnp.ndarray        # (..., 3)
    pdf: jnp.ndarray      # (...,)
    measure: jnp.ndarray  # (...,) int32
    uv: jnp.ndarray       # (..., 2)


class DirectionSample(NamedTuple):
    d: jnp.ndarray        # (..., 3)
    pdf: jnp.ndarray
    measure: jnp.ndarray


class DirectSample(NamedTuple):
    """Sampling a point on an emitter/sensor as seen from a reference point
    (SceneTypes/Samples.h:127)."""

    p: jnp.ndarray        # sampled position (..., 3)
    n: jnp.ndarray        # normal at sampled position
    d: jnp.ndarray        # unit direction ref -> p
    dist: jnp.ndarray     # |p - ref|
    pdf: jnp.ndarray      # solid-angle pdf (0 => invalid)
    measure: jnp.ndarray
    uv: jnp.ndarray       # sensor/emitter parametric coords


class BSDFSample(NamedTuple):
    """Result of sampling a BSDF at a surface interaction."""

    wi: jnp.ndarray        # sampled incident dir, local frame (..., 3)
    weight: jnp.ndarray    # f * |cos| / pdf (..., 3)
    pdf: jnp.ndarray       # (...,)
    sampled_type: jnp.ndarray  # lobe flags (...,) int32
    eta: jnp.ndarray       # relative IOR change along the sampled path (...,)


class PhaseSample(NamedTuple):
    wi: jnp.ndarray
    weight: jnp.ndarray    # phase/pdf (scalar per lane, phases are achromatic)
    pdf: jnp.ndarray
