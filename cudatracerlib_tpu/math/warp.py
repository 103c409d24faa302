"""Square -> distribution warps and their pdfs.

Counterpart of reference ``Math/Warp.h`` (Math/Warp.h:29-204). Every warp takes
a (..., 2) uniform sample (or (...,) for 1-D warps) and returns directions or
points with matching leading shape; pdf functions are separate so MIS code can
evaluate densities for arbitrary directions. All pure jnp, differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vecmath import PI, INV_PI, INV_TWOPI, INV_FOURPI, safe_sqrt


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf():
    return INV_FOURPI


def square_to_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf():
    return INV_TWOPI


def square_to_cosine_hemisphere(u):
    p = square_to_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_disk(u):
    r = jnp.sqrt(jnp.maximum(u[..., 0], 1e-20))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric(u):
    """Shirley-Chiu concentric disk map (low distortion)."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (PI / 4.0) * (oy / jnp.where(ox == 0.0, 1.0, ox)),
        (PI / 2.0) - (PI / 4.0) * (ox / jnp.where(oy == 0.0, 1.0, oy)),
    )
    r = jnp.where(zero, 0.0, r)
    theta = jnp.where(zero, 0.0, theta)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def square_to_uniform_disk_pdf():
    return INV_PI


def square_to_uniform_triangle(u):
    """Barycentric warp (sqrt parameterization, reference Warp::squareToUniformTriangle)."""
    a = safe_sqrt(1.0 - u[..., 0])
    return jnp.stack([1.0 - a, a * u[..., 1]], axis=-1)


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction in cone around +z with cos(angle) >= cos_cutoff."""
    z = jnp.asarray(cos_cutoff) + u[..., 0] * (1.0 - jnp.asarray(cos_cutoff))
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_cone_pdf(cos_cutoff):
    return INV_TWOPI / jnp.maximum(1.0 - jnp.asarray(cos_cutoff), 1e-12)


def square_to_tent(u):
    """1-D tent on [-1, 1] per component (reconstruction filter importance warp)."""
    def tent1(x):
        return jnp.where(x < 0.5, jnp.sqrt(jnp.maximum(2.0 * x, 1e-20)) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * x, 1e-20)))

    return jnp.stack([tent1(u[..., 0]), tent1(u[..., 1])], axis=-1)


def square_to_std_normal(u):
    """Box-Muller 2-D standard normal."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-12)))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_std_normal_pdf(p):
    return INV_TWOPI * jnp.exp(-0.5 * (p[..., 0] ** 2 + p[..., 1] ** 2))
