"""Shading frame (tangent basis), counterpart of reference ``Math/Frame.h``.

A frame is a NamedTuple of three (..., 3) arrays — a pytree, so it flows through
jit/vmap/scan/shard_map. Local-frame trig helpers mirror the Mitsuba-style
helpers the reference BSDFs rely on (Frame::cosTheta etc., Math/Frame.h:60-130).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import vecmath as vm


class Frame(NamedTuple):
    s: jnp.ndarray  # tangent   (..., 3)
    t: jnp.ndarray  # bitangent (..., 3)
    n: jnp.ndarray  # normal    (..., 3)

    @staticmethod
    def from_normal(n: jnp.ndarray) -> "Frame":
        s, t = vm.coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    @staticmethod
    def from_st_n(s, n):
        """Gram-Schmidt a tangent against n (used with mesh dpdu)."""
        s = vm.normalize(s - n * vm.dot(n, s, keepdims=True))
        t = vm.cross(n, s)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack(
            [vm.dot(v, self.s), vm.dot(v, self.t), vm.dot(v, self.n)], axis=-1
        )

    def to_world(self, v: jnp.ndarray) -> jnp.ndarray:
        return (
            self.s * v[..., 0:1] + self.t * v[..., 1:2] + self.n * v[..., 2:3]
        )


# ---- local-frame trig (z = normal) ----

def cos_theta(v):
    return v[..., 2]


def abs_cos_theta(v):
    return jnp.abs(v[..., 2])


def cos_theta2(v):
    return v[..., 2] * v[..., 2]


def sin_theta2(v):
    return jnp.maximum(0.0, 1.0 - cos_theta2(v))


def sin_theta(v):
    return jnp.sqrt(sin_theta2(v))


def tan_theta(v):
    return sin_theta(v) / jnp.where(jnp.abs(v[..., 2]) < 1e-12, 1e-12, v[..., 2])


def tan_theta2(v):
    c2 = cos_theta2(v)
    return jnp.maximum(0.0, 1.0 - c2) / jnp.maximum(c2, 1e-12)


def sin_phi(v):
    st = sin_theta(v)
    return jnp.where(st < 1e-9, 0.0, jnp.clip(v[..., 1] / jnp.maximum(st, 1e-9), -1.0, 1.0))


def cos_phi(v):
    st = sin_theta(v)
    return jnp.where(st < 1e-9, 1.0, jnp.clip(v[..., 0] / jnp.maximum(st, 1e-9), -1.0, 1.0))


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0
