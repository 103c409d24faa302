"""Per-cell discretized (histogram) distributions.

Counterpart of reference ``Kernel/ParametricModels/DiscretizedModel.h``:
a fixed-bin histogram per cell with progressive accumulation, normalized
lazily, sampled by CDF inversion with intra-bin stratification. All cells
update in parallel via segment sums (no atomics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiscretizedModel(NamedTuple):
    hist: jnp.ndarray    # (C, B) accumulated mass per bin
    lo: float
    hi: float


def discretized_init(n_cells: int, n_bins: int, lo: float = 0.0,
                     hi: float = 1.0) -> DiscretizedModel:
    return DiscretizedModel(
        hist=jnp.zeros((n_cells, n_bins), jnp.float32), lo=lo, hi=hi)


def discretized_update(m: DiscretizedModel, cell_id, x, weight) -> DiscretizedModel:
    """Accumulate weighted samples x (N,) into their bins (segment scatter)."""
    C, B = m.hist.shape
    t = jnp.clip((x - m.lo) / (m.hi - m.lo), 0.0, 1.0 - 1e-6)
    b = (t * B).astype(jnp.int32)
    flat = cell_id * B + b
    upd = jax.ops.segment_sum(weight, flat, num_segments=C * B)
    return m._replace(hist=m.hist + upd.reshape(C, B))


def histogram_density(samples, n_bins: int, lo: float = 0.0, hi: float = 1.0):
    """D-dimensional histogram density estimator over [lo, hi]^D.

    Counterpart of reference ``Base/HistogramDensityEstimator.h`` (per-cell
    sample counters used to eyeball sampler distributions): samples (N, D)
    -> counts with shape (n_bins,) * D, plus the density normalized so a
    uniform distribution reads 1.0 everywhere (the reference's
    avg-vals-per-cell normalization)."""
    samples = jnp.asarray(samples)
    N, D = samples.shape
    t = jnp.clip((samples - lo) / (hi - lo), 0.0, 1.0 - 1e-6)
    b = (t * n_bins).astype(jnp.int32)
    flat = jnp.zeros((N,), jnp.int32)
    for i in range(D):
        flat = flat * n_bins + b[:, i]
    counts = jax.ops.segment_sum(jnp.ones((N,), jnp.float32), flat,
                                 num_segments=n_bins ** D)
    counts = counts.reshape((n_bins,) * D)
    density = counts / jnp.maximum(jnp.mean(counts), 1e-12)
    return counts, density


def discretized_pdf(m: DiscretizedModel, cell_id, x):
    C, B = m.hist.shape
    h = m.hist[cell_id]
    tot = jnp.maximum(jnp.sum(h, -1), 1e-12)
    t = jnp.clip((x - m.lo) / (m.hi - m.lo), 0.0, 1.0 - 1e-6)
    b = (t * B).astype(jnp.int32)
    width = (m.hi - m.lo) / B
    return jnp.take_along_axis(h, b[..., None], -1)[..., 0] / (tot * width)


def discretized_sample(m: DiscretizedModel, cell_id, u):
    """CDF inversion + intra-bin uniform reuse; returns (x, pdf)."""
    C, B = m.hist.shape
    h = m.hist[cell_id]
    tot = jnp.maximum(jnp.sum(h, -1, keepdims=True), 1e-12)
    cdf = jnp.cumsum(h / tot, axis=-1)
    b = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    b = jnp.minimum(b, B - 1)
    p_bin = jnp.take_along_axis(h, b[..., None], -1)[..., 0] / tot[..., 0]
    cdf_lo = jnp.where(b > 0, jnp.take_along_axis(
        cdf, jnp.maximum(b - 1, 0)[..., None], -1)[..., 0], 0.0)
    # reuse u inside the bin (MonteCarlo.h sampleReuse)
    frac = jnp.clip((u - cdf_lo) / jnp.maximum(p_bin, 1e-12), 0.0, 1.0)
    width = (m.hi - m.lo) / B
    x = m.lo + (b.astype(jnp.float32) + frac) * width
    return x, p_bin / width
