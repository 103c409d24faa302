"""Unit tests for the math layer against closed forms (SURVEY.md §4 plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.math import (
    compression,
    frame as fr,
    fresnel,
    microfacet as mf,
    montecarlo as mc,
    spectrum,
    vecmath as vm,
    warp,
)
from cudatracerlib_tpu.sampling import rng


def uniform2(key, n):
    return jax.random.uniform(jax.random.PRNGKey(key), (n, 2))


class TestVecmath:
    def test_normalize(self):
        v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
        n = vm.normalize(v)
        np.testing.assert_allclose(n[0], [0.6, 0.8, 0.0], atol=1e-6)
        assert np.all(np.isfinite(np.asarray(n[1])))

    def test_reflect(self):
        n = jnp.array([0.0, 0.0, 1.0])
        w = vm.normalize(jnp.array([1.0, 0.0, 1.0]))
        r = vm.reflect(w, n)
        np.testing.assert_allclose(r, vm.normalize(jnp.array([-1.0, 0.0, 1.0])), atol=1e-6)

    def test_coordinate_system_orthonormal(self):
        d = vm.normalize(jax.random.normal(jax.random.PRNGKey(0), (100, 3)))
        s, t = vm.coordinate_system(d)
        np.testing.assert_allclose(vm.dot(s, t), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(s, d), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(s), 1.0, atol=1e-5)
        # right-handed: s x t = n
        np.testing.assert_allclose(vm.cross(s, t), d, atol=1e-5)


class TestFrame:
    def test_roundtrip(self):
        n = vm.normalize(jax.random.normal(jax.random.PRNGKey(1), (50, 3)))
        f = fr.Frame.from_normal(n)
        v = vm.normalize(jax.random.normal(jax.random.PRNGKey(2), (50, 3)))
        np.testing.assert_allclose(f.to_world(f.to_local(v)), v, atol=1e-5)

    def test_trig_identities(self):
        v = vm.normalize(jax.random.normal(jax.random.PRNGKey(3), (100, 3)))
        np.testing.assert_allclose(
            fr.cos_theta2(v) + fr.sin_theta2(v), 1.0, atol=1e-5
        )


class TestWarp:
    def test_cosine_hemisphere_mean(self):
        u = uniform2(0, 200_000)
        d = warp.square_to_cosine_hemisphere(u)
        assert np.all(np.asarray(d[..., 2]) >= 0)
        np.testing.assert_allclose(vm.length(d), 1.0, atol=1e-5)
        # E[cos theta] under pdf cos/pi = 2/3
        np.testing.assert_allclose(np.mean(np.asarray(d[..., 2])), 2.0 / 3.0, atol=5e-3)

    def test_uniform_sphere_moments(self):
        d = warp.square_to_uniform_sphere(uniform2(1, 200_000))
        np.testing.assert_allclose(np.mean(np.asarray(d), axis=0), 0.0, atol=8e-3)
        np.testing.assert_allclose(vm.length(d), 1.0, atol=1e-5)

    def test_cone(self):
        cc = 0.9
        d = warp.square_to_uniform_cone(uniform2(2, 100_000), cc)
        assert np.asarray(d[..., 2]).min() >= cc - 1e-5
        # pdf integrates to 1: area of cap * pdf == 1
        cap = 2 * np.pi * (1 - cc)
        np.testing.assert_allclose(cap * float(warp.square_to_uniform_cone_pdf(cc)), 1.0, rtol=1e-5)

    def test_concentric_disk_in_disk(self):
        p = warp.square_to_uniform_disk_concentric(uniform2(3, 100_000))
        r2 = np.asarray(p[..., 0] ** 2 + p[..., 1] ** 2)
        assert r2.max() <= 1.0 + 1e-5
        # uniform: E[r^2] = 1/2
        np.testing.assert_allclose(r2.mean(), 0.5, atol=5e-3)

    def test_chi2_cosine_hemisphere(self):
        """Chi-square check: histogram of cos-hemisphere samples vs pdf."""
        n = 500_000
        d = np.asarray(warp.square_to_cosine_hemisphere(uniform2(4, n)))
        ct = d[:, 2]
        bins = np.linspace(0, 1, 21)
        hist, _ = np.histogram(ct, bins=bins)
        # pdf over cos theta: p(ct) = 2 ct (marginal of cos/pi over hemisphere)
        expected = n * (bins[1:] ** 2 - bins[:-1] ** 2)
        chi2 = np.sum((hist - expected) ** 2 / np.maximum(expected, 1))
        assert chi2 < 60.0, chi2  # 20 bins, generous bound


class TestMonteCarlo:
    def test_heuristics(self):
        w = mc.power_heuristic(1.0, 1.0, 1.0, 1.0)
        np.testing.assert_allclose(w, 0.5)
        assert float(mc.power_heuristic(1.0, 10.0, 1.0, 0.1)) > 0.99
        np.testing.assert_allclose(mc.balance_heuristic(1.0, 2.0, 1.0, 1.0), 2.0 / 3.0)

    def test_sample_discrete(self):
        weights = jnp.array([1.0, 3.0, 0.0, 6.0])
        cdf, total = mc.build_cdf(weights)
        np.testing.assert_allclose(total, 10.0)
        u = jax.random.uniform(jax.random.PRNGKey(0), (100_000,))
        idx, pmf, ur = mc.sample_discrete(cdf, u)
        idx = np.asarray(idx)
        counts = np.bincount(idx, minlength=4) / len(idx)
        np.testing.assert_allclose(counts, [0.1, 0.3, 0.0, 0.6], atol=5e-3)
        # reused sample is uniform
        assert 0.48 < float(jnp.mean(ur)) < 0.52


class TestFresnel:
    def test_dielectric_normal_incidence(self):
        F, ct, _, _ = fresnel.fresnel_dielectric(jnp.array(1.0), 1.5)
        np.testing.assert_allclose(F, ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-5)
        np.testing.assert_allclose(ct, -1.0, atol=1e-6)

    def test_dielectric_tir(self):
        # from inside glass at grazing angle: TIR
        F, ct, _, _ = fresnel.fresnel_dielectric(jnp.array(-0.2), 1.5)
        np.testing.assert_allclose(F, 1.0)
        np.testing.assert_allclose(ct, 0.0)

    def test_dielectric_grazing(self):
        F, _, _, _ = fresnel.fresnel_dielectric(jnp.array(1e-4), 1.5)
        np.testing.assert_allclose(F, 1.0, atol=1e-2)

    def test_snell(self):
        ci = 0.8
        F, ct, eta_it, eta_ti = fresnel.fresnel_dielectric(jnp.array(ci), 1.5)
        si = np.sqrt(1 - ci**2)
        st = np.sqrt(1 - float(ct) ** 2)
        np.testing.assert_allclose(si, 1.5 * st, rtol=1e-5)

    def test_conductor_range(self):
        F = fresnel.fresnel_conductor(
            jnp.linspace(0.01, 1.0, 64), jnp.array([0.2, 0.9, 1.4]), jnp.array([3.9, 2.5, 2.1])
        )
        F = np.asarray(F)
        assert F.min() >= 0 and F.max() <= 1.0 + 1e-6
        # normal-incidence closed form ((eta-1)^2+k^2)/((eta+1)^2+k^2) ~ (0.95,0.63,0.45)
        np.testing.assert_allclose(
            np.asarray(F[-1]), [0.952, 0.635, 0.449], atol=5e-3
        )


class TestMicrofacet:
    @pytest.mark.parametrize("dist", [mf.BECKMANN, mf.GGX])
    def test_ndf_normalization(self, dist):
        """Integral of D(m) cos(m) over hemisphere == 1."""
        alpha = 0.3
        n_t, n_p = 256, 64
        theta = (jnp.arange(n_t) + 0.5) / n_t * (jnp.pi / 2)
        phi = (jnp.arange(n_p) + 0.5) / n_p * (2 * jnp.pi)
        T, P = jnp.meshgrid(theta, phi, indexing="ij")
        m = vm.spherical_direction(jnp.sin(T), jnp.cos(T), P)
        d = mf.D(dist, m, alpha, alpha)
        integrand = d * jnp.cos(T) * jnp.sin(T)
        integral = jnp.sum(integrand) * (jnp.pi / 2 / n_t) * (2 * jnp.pi / n_p)
        np.testing.assert_allclose(float(integral), 1.0, rtol=2e-2)

    @pytest.mark.parametrize("dist", [mf.BECKMANN, mf.GGX])
    def test_sample_pdf_consistency(self, dist):
        """pdf() must match the density of sample() — MC weight f/pdf ~ chi2."""
        alpha = 0.4
        wi = vm.normalize(jnp.array([0.4, -0.2, 0.9]))
        u = uniform2(7, 100_000)
        wib = jnp.broadcast_to(wi, (u.shape[0], 3))
        m, pdf_s = mf.sample(dist, wib, alpha, alpha, u)
        pdf_e = mf.pdf(dist, wib, m, alpha, alpha)
        ratio = np.asarray(pdf_e / jnp.maximum(pdf_s, 1e-12))
        np.testing.assert_allclose(np.median(ratio), 1.0, rtol=1e-3)
        # D integral via importance sampling: E[D cos / pdf] == 1 (NDF norm)
        d = mf.D(dist, m, alpha, alpha)
        est = np.asarray(d * jnp.maximum(m[..., 2], 0.0) / jnp.maximum(pdf_s, 1e-12))
        np.testing.assert_allclose(est.mean(), 1.0, rtol=3e-2)

    def test_smith_g1_bounds(self):
        v = vm.normalize(jax.random.normal(jax.random.PRNGKey(5), (1000, 3)))
        v = v.at[:, 2].set(jnp.abs(v[:, 2]))
        v = vm.normalize(v)
        m = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), v.shape)
        g = np.asarray(mf.smith_g1(mf.GGX, v, m, 0.3, 0.3))
        assert g.min() >= 0 and g.max() <= 1 + 1e-6


class TestSpectrum:
    def test_luminance_white(self):
        np.testing.assert_allclose(spectrum.luminance(jnp.ones(3)), 1.0, rtol=1e-4)

    def test_srgb_roundtrip(self):
        x = jnp.linspace(0, 1, 64)
        np.testing.assert_allclose(
            spectrum.srgb_to_linear(spectrum.linear_to_srgb(x)), x, atol=1e-5
        )

    def test_xyz_roundtrip(self):
        rgb = jax.random.uniform(jax.random.PRNGKey(0), (10, 3))
        np.testing.assert_allclose(
            spectrum.xyz_to_rgb(spectrum.rgb_to_xyz(rgb)), rgb, atol=1e-4
        )

    def test_rgbe_roundtrip(self):
        rgb = jnp.array([[1.0, 0.5, 0.25], [100.0, 50.0, 25.0], [1e-3, 2e-3, 0.5e-3], [0.0, 0.0, 0.0]])
        dec = spectrum.from_rgbe(spectrum.to_rgbe(rgb))
        # 8-bit shared-exponent mantissas: worst case ~2 quanta of the max channel
        np.testing.assert_allclose(dec, rgb, rtol=5e-2, atol=1e-6)

    def test_rgbcol_roundtrip(self):
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
        dec = spectrum.from_rgbcol(spectrum.to_rgbcol(rgb))
        np.testing.assert_allclose(dec, rgb, atol=1.5 / 255)


class TestCompression:
    def test_octahedral_roundtrip(self):
        d = vm.normalize(jax.random.normal(jax.random.PRNGKey(2), (1000, 3)))
        dec = compression.decode_octahedral_u32(compression.encode_octahedral_u32(d))
        np.testing.assert_allclose(dec, d, atol=2e-4)

    def test_spherical_roundtrip(self):
        d = vm.normalize(jax.random.normal(jax.random.PRNGKey(3), (1000, 3)))
        dec = compression.decode_spherical_u16(compression.encode_spherical_u16(d))
        dots = np.asarray(vm.dot(dec, d))
        assert dots.min() > 0.999  # 8-bit spherical, ~1.5deg worst case

    def test_uv_roundtrip(self):
        uv = jax.random.uniform(jax.random.PRNGKey(4), (100, 2))
        dec = compression.decode_uv_u32(compression.encode_uv_u32(uv))
        np.testing.assert_allclose(dec, uv, atol=1e-4)


class TestRNG:
    def test_uniformity(self):
        s = rng.Sampler.create(0, jnp.arange(100_000), 0)
        s, u1 = s.next_1d()
        s, u2 = s.next_2d()
        for u in [np.asarray(u1), np.asarray(u2[:, 0]), np.asarray(u2[:, 1])]:
            assert 0.0 <= u.min() and u.max() < 1.0
            np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)
            np.testing.assert_allclose(u.var(), 1.0 / 12, atol=5e-3)

    def test_decorrelation_across_pixels_and_samples(self):
        s_a, a = rng.Sampler.create(0, jnp.arange(50_000), 0).next_1d()
        s_b, b = rng.Sampler.create(0, jnp.arange(50_000), 1).next_1d()
        corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
        assert abs(corr) < 0.01

    def test_replay_stable(self):
        s = rng.Sampler.create(7, 13, 2)
        _, u_a = s.next_1d()
        _, u_b = s.next_1d()
        np.testing.assert_array_equal(np.asarray(u_a), np.asarray(u_b))


class TestQuadrature:
    def test_lobatto_nodes_weights(self):
        from cudatracerlib_tpu.math import quadrature as q
        x, w = q.gauss_lobatto(7)
        np.testing.assert_allclose(np.sum(np.asarray(w)), 2.0, atol=1e-5)
        assert np.asarray(x)[0] == -1.0 and np.asarray(x)[-1] == 1.0
        x, w = q.gauss_legendre(8)
        # integrates x^14 exactly: 2/15
        np.testing.assert_allclose(np.sum(np.asarray(w) * np.asarray(x) ** 14),
                                   2.0 / 15.0, rtol=1e-4)

    def test_integrate_polynomial_exact(self):
        from cudatracerlib_tpu.math import quadrature as q
        val = q.integrate(lambda x: 5 * x**4, 0.0, 2.0, n_panels=2)
        np.testing.assert_allclose(np.asarray(val), 32.0, rtol=1e-5)

    def test_integrate_batched_transmittance(self):
        from cudatracerlib_tpu.math import quadrature as q
        # tau = int_0^b sigma(1 + sin x) dx, batched over b; compare closed form
        b = jnp.array([0.5, 1.0, 2.0])
        val = q.integrate(lambda x: 1.0 + jnp.sin(x), jnp.zeros_like(b), b,
                          n_panels=8)
        expect = np.asarray(b) + 1.0 - np.cos(np.asarray(b))
        np.testing.assert_allclose(np.asarray(val), expect, rtol=1e-5)

    def test_integrate_differentiable(self):
        from cudatracerlib_tpu.math import quadrature as q
        g = jax.grad(lambda b: q.integrate(lambda x: x * x, 0.0, b))(1.5)
        np.testing.assert_allclose(np.asarray(g), 1.5**2, rtol=1e-4)


class TestSpline:
    def test_eval_passes_through_nodes(self):
        from cudatracerlib_tpu.math import spline
        vals = jnp.array([0.0, 1.0, 4.0, 9.0, 16.0])
        x = jnp.linspace(0.0, 1.0, 5)
        y = spline.eval_1d(x, vals, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(vals), atol=1e-5)

    def test_eval_reproduces_smooth_function(self):
        from cudatracerlib_tpu.math import spline
        grid = np.linspace(0, 1, 64)
        vals = jnp.asarray(np.sin(2 * np.pi * grid))
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, 200).astype(np.float32))
        y = spline.eval_1d(x, vals, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(y), np.sin(2 * np.pi * np.asarray(x)),
                                   atol=2e-3)

    def test_integrate_matches_quadrature(self):
        from cudatracerlib_tpu.math import spline
        grid = np.linspace(0, 2, 32)
        vals = jnp.asarray((grid**2 + 1).astype(np.float32))
        cdf = spline.integrate_1d(vals, 0.0, 2.0)
        np.testing.assert_allclose(np.asarray(cdf)[-1], 8.0 / 3 + 2.0, rtol=1e-4)

    def test_sample_matches_pdf_chi2(self):
        from cudatracerlib_tpu.math import spline
        grid = np.linspace(0, 1, 16)
        vals = jnp.asarray((0.2 + grid**2).astype(np.float32))
        u = jnp.asarray(np.random.default_rng(1).uniform(0, 1, 50_000).astype(np.float32))
        x, pdf = spline.sample_1d(u, vals, 0.0, 1.0)
        x = np.asarray(x)
        # histogram vs analytic density f/int f
        total = 0.2 + 1.0 / 3.0
        hist, edges = np.histogram(x, bins=20, range=(0, 1), density=True)
        centers = 0.5 * (edges[:-1] + edges[1:])
        np.testing.assert_allclose(hist, (0.2 + centers**2) / total, atol=0.05)
        # returned pdf agrees with density
        np.testing.assert_allclose(np.asarray(pdf), (0.2 + x**2) / total, atol=5e-3)

    def test_eval_2d_3d(self):
        from cudatracerlib_tpu.math import spline
        g = np.linspace(0, 1, 17)
        f2 = np.add.outer(g, 2 * g)  # f(y,x) = y + 2x, linear -> exact
        p = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (100, 2)).astype(np.float32))
        y2 = spline.eval_2d(p, jnp.asarray(f2.astype(np.float32)))
        np.testing.assert_allclose(np.asarray(y2),
                                   np.asarray(p[:, 1]) + 2 * np.asarray(p[:, 0]),
                                   atol=1e-4)
        f3 = (g[:, None, None] + g[None, :, None] * 2 + g[None, None, :] * 3)
        p3 = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (50, 3)).astype(np.float32))
        y3 = spline.eval_3d(p3, jnp.asarray(f3.astype(np.float32)))
        expect = (np.asarray(p3[:, 2]) + 2 * np.asarray(p3[:, 1])
                  + 3 * np.asarray(p3[:, 0]))
        np.testing.assert_allclose(np.asarray(y3), expect, atol=2e-4)


class TestMergingModel:
    """Math/FunctionModel.h MergingModel: fixed-knot adaptive 1-D approx."""

    def test_exact_below_capacity(self):
        import jax.numpy as jnp
        from cudatracerlib_tpu.math.function_model import (merging_eval,
                                                           merging_init,
                                                           merging_insert)

        m = merging_init(8)
        pts = [(0.0, 1.0), (1.0, 3.0), (0.5, 2.0), (0.25, 1.5)]
        for x, y in pts:
            m = merging_insert(m, x, y)
        assert int(m.n) == 4
        # exact at knots, linear between
        for x, y in pts:
            np.testing.assert_allclose(float(merging_eval(m, x)), y, atol=1e-6)
        np.testing.assert_allclose(float(merging_eval(m, 0.75)), 2.5, atol=1e-6)

    def test_merge_preserves_linear_function(self):
        import jax
        import jax.numpy as jnp
        from cudatracerlib_tpu.math.function_model import (merging_eval,
                                                           merging_init,
                                                           merging_insert)

        # feeding y = 2x + 1 through a 6-knot model: interior points on the
        # line are free to merge, so the approximation stays exact
        m = merging_init(6)
        ins = jax.jit(merging_insert)
        rng = np.random.default_rng(0)
        for x in rng.uniform(0, 1, 40):
            m = ins(m, jnp.float32(x), jnp.float32(2 * x + 1))
        assert int(m.n) == 6
        for x in [0.1, 0.4, 0.8]:
            np.testing.assert_allclose(float(merging_eval(m, x)), 2 * x + 1,
                                       atol=1e-3)

    def test_batched_models(self):
        import jax.numpy as jnp
        from cudatracerlib_tpu.math.function_model import (merging_eval,
                                                           merging_init,
                                                           merging_insert)

        m = merging_init(4, batch_shape=(3,))
        m = merging_insert(m, jnp.asarray([0.0, 0.0, 0.0]),
                           jnp.asarray([1.0, 2.0, 3.0]))
        m = merging_insert(m, jnp.asarray([1.0, 1.0, 1.0]),
                           jnp.asarray([2.0, 4.0, 6.0]))
        v = np.asarray(merging_eval(m, jnp.asarray([0.5, 0.5, 0.5])))
        np.testing.assert_allclose(v, [1.5, 3.0, 4.5], atol=1e-6)
