"""Spectral rendering tests (math/spectral.py + render/spectral.py).

Reference parity: Math/Spectrum.h:10-15 (generic-N spectrum, 360-830 nm),
Math/Spectrum.cu (CIE machinery), SceneTypes/Dispersion.h (Cauchy IOR)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudatracerlib_tpu.math import spectral as sp
from cudatracerlib_tpu.render.path_tracer import PTConfig, render
from cudatracerlib_tpu.render.spectral import (dispersive_eta,
                                               render_spectral)
from cudatracerlib_tpu.scene.shapes import caustic_scene, furnace_scene


class TestSpectralMath:
    def test_rgb_roundtrip_through_spectral_pipeline(self):
        rng = np.random.default_rng(0)
        lam, pdf = sp.sample_wavelengths(jnp.asarray(
            rng.random(100000, np.float32)))
        for rgb in ([1, 1, 1], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                    [0.3, 0.5, 0.7]):
            Ls = sp.rgb_to_spectrum(
                jnp.broadcast_to(jnp.asarray(rgb, jnp.float32), (100000, 3)),
                lam)
            out = np.asarray(sp.spectral_to_rgb(Ls, lam, pdf).mean(0))
            np.testing.assert_allclose(out, rgb, atol=0.02)

    def test_cie_y_peak(self):
        # ybar peaks near 555 nm at ~1.0 (Wyman fit of the 1931 observer)
        lam = jnp.linspace(400.0, 700.0, 301)
        y = np.asarray(sp.cie_xyz(lam))[:, 1]
        assert abs(float(lam[int(np.argmax(y))]) - 555.0) < 15.0
        assert 0.95 < y.max() < 1.05

    def test_dispersive_eta_ordering(self):
        # blue bends more: n(450) > n(589) > n(650)
        n450 = float(dispersive_eta(1.5, 0.00420, jnp.float32(450.0)))
        n589 = float(dispersive_eta(1.5, 0.00420, jnp.float32(589.3)))
        n650 = float(dispersive_eta(1.5, 0.00420, jnp.float32(650.0)))
        assert n450 > n589 > n650
        assert abs(n589 - 1.5) < 1e-4

    def test_sellmeier_eta(self):
        """Sellmeier coefficients (BK7) give the catalog index and the
        normal-dispersion ordering; zero B falls back to Cauchy."""
        from cudatracerlib_tpu.math.dispersion import SELLMEIER_BK7

        b = jnp.asarray(SELLMEIER_BK7[0])
        c = jnp.asarray(SELLMEIER_BK7[1])
        n = [float(dispersive_eta(jnp.float32(0.0), jnp.float32(0.0),
                                  jnp.float32(l), b, c))
             for l in (450.0, 587.6, 650.0)]
        assert n[0] > n[1] > n[2]
        assert abs(n[1] - 1.5168) < 2e-3  # BK7 n_d
        nz = float(dispersive_eta(jnp.float32(1.5), jnp.float32(0.0),
                                  jnp.float32(587.6), jnp.zeros(3),
                                  jnp.ones(3) * 1e6))
        assert abs(nz - 1.5) < 1e-6


class TestSpectralRender:
    def test_furnace_spectral_matches_rgb(self):
        """Achromatic transport: the spectral tracer must reproduce the RGB
        tracer on a furnace scene (uplift calibration + hero sampling)."""
        scene = furnace_scene(albedo=0.7, env_radiance=1.0)
        cfg = PTConfig(max_depth=4, rr_start=99)
        a = np.asarray(render(scene, 32, 32, 16, jnp.uint32(0), cfg))
        b = np.asarray(render_spectral(scene, 32, 32, 16, jnp.uint32(0), cfg))
        # spectral adds wavelength-MC noise; compare image means per channel
        np.testing.assert_allclose(b.mean((0, 1)), a.mean((0, 1)), rtol=0.05)

    def test_dispersion_separates_channels(self):
        """A dispersive glass sphere's caustic must develop chromatic
        structure (red/blue differ) that the achromatic render lacks."""
        scene = caustic_scene()
        cc = jnp.where(scene.materials.bsdf_type == 2, 0.03, 0.0)
        disp = scene._replace(
            materials=scene.materials._replace(cauchy_c=cc))
        cfg = PTConfig(max_depth=6, rr_start=99)
        img_a = np.asarray(render_spectral(scene, 64, 64, 32, jnp.uint32(2),
                                           cfg))
        img_d = np.asarray(render_spectral(disp, 64, 64, 32, jnp.uint32(2),
                                           cfg))

        def chroma(img):
            # 3x3 box blur kills per-pixel wavelength-MC noise; dispersion
            # is a systematic (spatially smooth) channel shift
            k = np.ones((3, 3)) / 9.0
            sm = np.stack([
                np.real(np.fft.ifft2(np.fft.fft2(img[..., c])
                                     * np.fft.fft2(k, img.shape[:2])))
                for c in range(3)], -1)
            lum = sm.mean(-1)
            m = lum > np.percentile(lum, 90)
            rb = np.abs(sm[..., 0] - sm[..., 2])
            return float((rb * m).sum() / np.maximum((lum * m).sum(), 1e-9))

        assert chroma(img_d) > 1.35 * chroma(img_a), \
            f"dispersive {chroma(img_d):.4f} vs achromatic {chroma(img_a):.4f}"

    def test_dispersive_kill_conserves_energy(self):
        """Companion termination must renormalize the hero lane (hero-
        wavelength MIS in the delta limit): with an infinitesimal Cauchy
        coefficient the refraction directions are unchanged, so the image
        mean must match the achromatic render — the round-4 advisor bug had
        transported dispersive light ~N_WAVES x too dark."""
        scene = caustic_scene()
        cc = jnp.where(scene.materials.bsdf_type == 2, 1e-7, 0.0)
        disp = scene._replace(materials=scene.materials._replace(cauchy_c=cc))
        cfg = PTConfig(max_depth=6, rr_start=99)
        a = np.asarray(render_spectral(scene, 48, 48, 32, jnp.uint32(5), cfg))
        b = np.asarray(render_spectral(disp, 48, 48, 32, jnp.uint32(5), cfg))
        np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.03)

    def test_rough_dispersive_mis_conserves_energy(self):
        """Companion-preserving hero MIS through ROUGH dispersive
        refraction (Wilkie et al. §4): with an infinitesimal Cauchy
        coefficient the per-wavelength lobes coincide, so the image mean
        must match the achromatic render — wrong MIS normalization would
        scale transmission through rough glass."""
        scene = caustic_scene()
        # turn the glass sphere rough
        mats = scene.materials._replace(
            bsdf_type=jnp.where(scene.materials.bsdf_type == 2, 4,
                                scene.materials.bsdf_type),
            alpha_u=jnp.full_like(scene.materials.alpha_u, 0.15),
            alpha_v=jnp.full_like(scene.materials.alpha_v, 0.15))
        rough = scene._replace(materials=mats)
        cc = jnp.where(mats.bsdf_type == 4, 1e-7, 0.0)
        disp = rough._replace(materials=mats._replace(cauchy_c=cc))
        cfg = PTConfig(max_depth=6, rr_start=99)
        a = np.asarray(render_spectral(rough, 48, 48, 24, jnp.uint32(9),
                                       cfg))
        b = np.asarray(render_spectral(disp, 48, 48, 24, jnp.uint32(9),
                                       cfg))
        np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.04)

    @pytest.mark.subproc
    def test_spectral_vol_furnace_matches_rgb(self):
        """A GRAY homogeneous medium: the spectral volumetric tracer must
        reproduce the RGB volpath (sigma uplift + hero sampling calibration
        — the spectral-media furnace gate, VERDICT r4 item 7).

        subproc-isolated: spectral-vol programs segfault the accumulated
        in-suite XLA:CPU compiler state (round-4 failure class)."""
        from cudatracerlib_tpu.render.spectral import render_spectral_vol
        from cudatracerlib_tpu.render.volpath import render_vol
        from cudatracerlib_tpu.scene import media as M

        scene = furnace_scene(albedo=0.6, env_radiance=1.0)
        lo = np.asarray(scene.bvh.world_min) - 5.0
        hi = np.asarray(scene.bvh.world_max) + 5.0
        medium = M.Media.build([
            dict(type=M.HOMOGENEOUS, sigma_a=[0.02] * 3,
                 sigma_s=[0.25] * 3, box_min=lo, box_max=hi,
                 phase_g=0.2)
        ])
        cfg = PTConfig(max_depth=4, rr_start=99)
        a = np.asarray(render_vol(scene, medium, 32, 32, 24,
                                  jnp.uint32(0), cfg))
        b = np.asarray(render_spectral_vol(scene, medium, 32, 32, 24,
                                           jnp.uint32(0), cfg))
        np.testing.assert_allclose(b.mean((0, 1)), a.mean((0, 1)),
                                   rtol=0.06)

    @pytest.mark.subproc
    def test_spectral_vol_dispersive_sigma(self):
        """Wavelength-dependent sigma_t: a medium with colored extinction
        must match the RGB volpath per channel (the sigma spectra uplift
        through the SAME 3-band basis the RGB path integrates).

        subproc-isolated: spectral-vol programs segfault the accumulated
        in-suite XLA:CPU compiler state (round-4 failure class)."""
        from cudatracerlib_tpu.render.spectral import render_spectral_vol
        from cudatracerlib_tpu.render.volpath import render_vol
        from cudatracerlib_tpu.scene import media as M

        scene = furnace_scene(albedo=0.5, env_radiance=1.0)
        lo = np.asarray(scene.bvh.world_min) - 5.0
        hi = np.asarray(scene.bvh.world_max) + 5.0
        medium = M.Media.build([
            dict(type=M.HOMOGENEOUS, sigma_a=[0.3, 0.1, 0.02],
                 sigma_s=[0.05, 0.15, 0.3], box_min=lo, box_max=hi,
                 phase_g=0.0)
        ])
        cfg = PTConfig(max_depth=4, rr_start=99)
        a = np.asarray(render_vol(scene, medium, 32, 32, 32,
                                  jnp.uint32(1), cfg)).mean((0, 1))
        b = np.asarray(render_spectral_vol(scene, medium, 32, 32, 32,
                                           jnp.uint32(1), cfg)).mean((0, 1))
        # channel ORDER must match (blue suffers least extinction) and the
        # per-channel means agree within MC noise + the structural
        # band-vs-channel difference: transmittance is exp(-tau), which is
        # NONLINEAR, so a band-constant spectrum's CIE projection
        # legitimately mixes across sRGB channels — exact per-channel
        # equality with the RGB tracer is not expected (the spectral
        # result is the physical one)
        assert b[2] > b[1] > b[0] and a[2] > a[1] > a[0]
        np.testing.assert_allclose(b, a, rtol=0.12, atol=0.03)

    @pytest.mark.subproc
    def test_gradient_spectral_sigma(self):
        """d(image)/d(sigma_s scale) through the spectral volumetric path
        matches central finite differences (detached decisions, attached
        per-wavelength weights).

        subproc-isolated: grad-of-spectral-vol-render segfaults the
        accumulated in-suite XLA:CPU compiler state (the round-4 failure
        class; passes standalone)."""
        from cudatracerlib_tpu.render.spectral import render_spectral_vol
        from cudatracerlib_tpu.scene import media as M

        scene = furnace_scene(albedo=0.5, env_radiance=1.0)
        lo = np.asarray(scene.bvh.world_min) - 5.0
        hi = np.asarray(scene.bvh.world_max) + 5.0
        medium = M.Media.build([
            dict(type=M.HOMOGENEOUS, sigma_a=[0.05] * 3,
                 sigma_s=[0.2, 0.3, 0.4], box_min=lo, box_max=hi,
                 phase_g=0.0)
        ])
        cfg = PTConfig(max_depth=3, rr_start=99)

        def loss(s):
            m2 = medium._replace(sigma_s=medium.sigma_s * s)
            return render_spectral_vol(scene, m2, 16, 16, 12,
                                       jnp.uint32(2), cfg).mean()

        g = float(jax.grad(loss)(jnp.float32(1.0)))
        eps = 0.05
        fd = (float(loss(jnp.float32(1 + eps)))
              - float(loss(jnp.float32(1 - eps)))) / (2 * eps)
        assert np.isfinite(g) and abs(fd) > 1e-5
        np.testing.assert_allclose(g, fd, rtol=0.35)

    @pytest.mark.subproc
    def test_gradient_spectral_params(self):
        """Gradients flow w.r.t. spectral parameters: radiance scale matches
        FD; d/d(cauchy_c) is finite and nonzero through refraction.

        subproc-isolated: grad-of-spectral-render is the other program
        class that stresses the accumulated XLA:CPU compiler state
        (see conftest)."""
        scene = furnace_scene(albedo=0.5, env_radiance=1.0)
        cfg = PTConfig(max_depth=3, rr_start=99)

        def loss_rad(s):
            sc = scene._replace(lights=scene.lights._replace(
                radiance=scene.lights.radiance * s))
            return render_spectral(sc, 16, 16, 8, jnp.uint32(1), cfg).mean()

        g = float(jax.grad(loss_rad)(jnp.float32(1.0)))
        eps = 0.05
        fd = (float(loss_rad(jnp.float32(1 + eps)))
              - float(loss_rad(jnp.float32(1 - eps)))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=0.05)

        caustic = caustic_scene()

        def loss_cc(c):
            cc = jnp.where(caustic.materials.bsdf_type == 2, c, 0.0)
            sc = caustic._replace(
                materials=caustic.materials._replace(cauchy_c=cc))
            img = render_spectral(sc, 24, 24, 8, jnp.uint32(3),
                                  PTConfig(max_depth=5, rr_start=99))
            # spatially weighted loss so pure re-distribution registers
            w = jnp.linspace(0.0, 1.0, 24)[None, :, None]
            return (img * w).mean()

        gc = float(jax.grad(loss_cc)(jnp.float32(0.01)))
        assert np.isfinite(gc) and abs(gc) > 0.0
