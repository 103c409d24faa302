"""BVH build + traversal correctness vs brute force (SURVEY.md §7 step 3)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cudatracerlib_tpu.accel.bvh import build_bvh
from cudatracerlib_tpu.accel import traversal as tr


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(0)
    T = 800
    c = rng.uniform(0, 1, (T, 1, 3))
    tris = (c + rng.uniform(-0.08, 0.08, (T, 3, 3))).astype(np.float32)
    bvh = build_bvh(tris)
    B = 2048
    o = rng.uniform(-0.2, 1.2, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return bvh, jnp.asarray(o), jnp.asarray(d)


class TestTraversal:
    def test_closest_hit_matches_brute_force(self, soup):
        bvh, o, d = soup
        h1 = tr.intersect(bvh, o, d)
        h2 = tr.intersect_brute_force(bvh, o, d)
        v1, v2 = np.asarray(h1.valid), np.asarray(h2.valid)
        assert (v1 == v2).all()
        m = v1
        np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-4)
        # original triangle ids must agree (duplicated padding tris permitted)
        tid = np.asarray(bvh.tri_index)
        assert (tid[np.asarray(h1.prim)[m]] == tid[np.asarray(h2.prim)[m]]).mean() > 0.999

    def test_any_hit(self, soup):
        bvh, o, d = soup
        occ = np.asarray(tr.occluded(bvh, o, d))
        ref = np.asarray(tr.intersect_brute_force(bvh, o, d).valid)
        assert (occ == ref).all()

    def test_t_range(self, soup):
        bvh, o, d = soup
        h_near = tr.intersect(bvh, o, d, t_min=1e-4, t_max=0.3)
        h_ref = tr.intersect_brute_force(bvh, o, d, t_min=1e-4, t_max=0.3)
        assert (np.asarray(h_near.valid) == np.asarray(h_ref.valid)).all()
        m = np.asarray(h_near.valid)
        np.testing.assert_allclose(
            np.asarray(h_near.t)[m], np.asarray(h_ref.t)[m], rtol=1e-4
        )

    def test_bary_reconstruction(self, soup):
        """Hit point from barycentrics must match o + t*d."""
        bvh, o, d = soup
        h = tr.intersect(bvh, o, d)
        m = np.asarray(h.valid)
        # reconstruct via woop: w-row evaluated at p should be ~0 (on plane)
        woop = np.asarray(bvh.woop)[np.asarray(h.prim)[m]]
        p = np.asarray(o)[m] + np.asarray(d)[m] * np.asarray(h.t)[m][:, None]
        w = (woop[:, 8:11] * p).sum(1) + woop[:, 11]
        assert np.abs(w).max() < 1e-3

    def test_grazing_and_axis_rays(self, soup):
        bvh, _, _ = soup
        o = jnp.asarray([[0.5, 0.5, -1.0], [0.5, 0.5, 2.0], [-1.0, 0.5, 0.5]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], jnp.float32)
        h = tr.intersect(bvh, o, d)
        hb = tr.intersect_brute_force(bvh, o, d)
        assert (np.asarray(h.valid) == np.asarray(hb.valid)).all()


class TestSpatialSplits:
    """SBVH spatial splits (native builder, Stich et al. path)."""

    def _stress_tris(self):
        # long thin diagonal triangles spanning the whole box: the classic
        # case where object splits produce heavily overlapping children
        rng = np.random.default_rng(7)
        T = 400
        a = rng.uniform(0, 1, (T, 3)).astype(np.float32)
        b = a + np.asarray([0.9, 0.04, 0.04], np.float32)
        c = a + np.asarray([0.9, 0.08, 0.0], np.float32)
        return np.stack([a, b, c], axis=1)

    def test_duplicates_and_correctness(self):
        from cudatracerlib_tpu.accel.bvh import LEAF_SIZE, MAX_DEPTH, N_BINS
        from cudatracerlib_tpu.native import build_bvh_native

        tris = self._stress_tris()
        res_s = build_bvh_native(tris, LEAF_SIZE, N_BINS, MAX_DEPTH,
                                 spatial=True)
        res_o = build_bvh_native(tris, LEAF_SIZE, N_BINS, MAX_DEPTH,
                                 spatial=False)
        if res_s is None:
            pytest.skip("no native toolchain")
        _, order_s, _ = res_s
        _, order_o, _ = res_o
        # spatial splits duplicate references on this scene
        assert len(np.unique(order_s)) == len(tris)
        assert len(order_s) >= len(order_o)

        # full traversal stays exact vs brute force through build_bvh
        from cudatracerlib_tpu.accel import traversal as tr
        from cudatracerlib_tpu.accel.bvh import build_bvh

        bvh = build_bvh(tris)
        rng = np.random.default_rng(3)
        B = 512
        o = jnp.asarray(rng.uniform(-0.2, 1.2, (B, 3)).astype(np.float32))
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        h = tr.intersect(bvh, o, d)
        hb = tr.intersect_brute_force(bvh, o, d)
        assert (np.asarray(h.valid) == np.asarray(hb.valid)).all()
        m = np.asarray(h.valid)
        np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(hb.t)[m],
                                   rtol=1e-3)
