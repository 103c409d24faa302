"""Pallas kernel correctness tests (interpret mode on CPU).

The cluster and dense intersectors are the framework's hot kernels
(ops/cluster_trace.py, ops/intersect_pallas.py — counterparts of the
reference's Aila-Laine traversal, Kernel/TraceHelper.cu:326-746). The
regular suite runs on a CPU mesh where scene_intersect silently falls back
to the XLA oracle, so these tests run the ACTUAL kernels through the Pallas
interpreter against the oracle: closest-hit, any-hit, and finite t-ranges.
The real-TPU execution of the same kernels is exercised by `bench.py smoke`
and the driver's bench capture.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cudatracerlib_tpu.accel import traversal
from cudatracerlib_tpu.accel.bvh import build_bvh
from cudatracerlib_tpu.accel.clusters import build_clusters
from cudatracerlib_tpu.scene.shapes import box, quad, sphere


def _scene_tris(n_spheres=6, seed=0):
    rng = np.random.default_rng(seed)
    parts = [quad([-4, -4, 0], [4, -4, 0], [4, 4, 0], [-4, 4, 0])]
    for i in range(n_spheres):
        c = rng.uniform(-3, 3, 3) * [1, 1, 0] + [0, 0, rng.uniform(0.3, 2.0)]
        if i % 2 == 0:
            parts.append(sphere(c, rng.uniform(0.3, 0.8), n_theta=8, n_phi=12))
        else:
            s = rng.uniform(0.2, 0.6)
            parts.append(box(c - s, c + s))
    return np.concatenate(parts).astype(np.float32)


def _rays(tris, n, seed=1):
    rng = np.random.default_rng(seed)
    lo = tris.reshape(-1, 3).min(0)
    hi = tris.reshape(-1, 3).max(0)
    o = rng.uniform(lo - 1, hi + 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check_against_oracle(hit, oracle, *, t_tol=1e-3):
    vc = np.asarray(hit.valid)
    vo = np.asarray(oracle.valid)
    assert (vc == vo).all(), f"valid mismatch on {(vc != vo).sum()} rays"
    m = vc & vo
    tc = np.asarray(hit.t)[m]
    to = np.asarray(oracle.t)[m]
    assert np.allclose(tc, to, rtol=t_tol, atol=t_tol), (
        f"t mismatch max {np.abs(tc - to).max()}"
    )
    # barycentrics at the same prim must agree (duplicated padding tris can
    # legitimately differ in prim id at equal t)
    same = m & (np.asarray(hit.prim) == np.asarray(oracle.prim))
    bc = np.asarray(hit.bary)[same]
    bo = np.asarray(oracle.bary)[same]
    assert np.allclose(bc, bo, atol=5e-3)


class TestClusterKernel:
    @pytest.fixture(scope="class")
    def cluster_scene(self):
        tris = _scene_tris()
        bvh, host = build_bvh(tris, with_host=True)
        cs = build_clusters(bvh, host=host)
        return bvh, cs

    def test_closest_hit(self, cluster_scene):
        from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters

        bvh, cs = cluster_scene
        o, d = _rays(_scene_tris(), 512)
        with pltpu.force_tpu_interpret_mode():
            hit = intersect_clusters(cs, o, d)
        oracle = traversal.intersect(bvh, o, d)
        _check_against_oracle(hit, oracle)

    def test_any_hit_agrees_on_occlusion(self, cluster_scene):
        from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters

        bvh, cs = cluster_scene
        o, d = _rays(_scene_tris(), 512, seed=3)
        with pltpu.force_tpu_interpret_mode():
            hit = intersect_clusters(cs, o, d, any_hit=True)
        oracle = traversal.intersect(bvh, o, d)
        assert (np.asarray(hit.valid) == np.asarray(oracle.valid)).all()

    def test_finite_t_range(self, cluster_scene):
        from cudatracerlib_tpu.ops.cluster_trace import intersect_clusters

        bvh, cs = cluster_scene
        o, d = _rays(_scene_tris(), 256, seed=5)
        t_max = jnp.full((256,), 1.5, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            hit = intersect_clusters(cs, o, d, t_max=t_max)
        oracle = traversal.intersect(bvh, o, d, t_max=t_max)
        assert (np.asarray(hit.valid) == np.asarray(oracle.valid)).all()
        m = np.asarray(hit.valid)
        assert (np.asarray(hit.t)[m] <= 1.5 + 1e-5).all()
        _check_against_oracle(hit, oracle)


class TestDenseKernel:
    @pytest.fixture(scope="class")
    def small_scene(self):
        tris = _scene_tris(n_spheres=2, seed=7)
        bvh = build_bvh(tris)
        return tris, bvh

    def test_closest_hit(self, small_scene):
        from cudatracerlib_tpu.ops.intersect_pallas import intersect_dense

        tris, bvh = small_scene
        o, d = _rays(tris, 512, seed=11)
        with pltpu.force_tpu_interpret_mode():
            hit = intersect_dense(bvh, o, d)
        oracle = traversal.intersect_brute_force(bvh, o, d)
        _check_against_oracle(hit, oracle)

    def test_t_range_and_any_hit(self, small_scene):
        from cudatracerlib_tpu.ops.intersect_pallas import intersect_dense

        tris, bvh = small_scene
        o, d = _rays(tris, 256, seed=13)
        with pltpu.force_tpu_interpret_mode():
            hit = intersect_dense(bvh, o, d, t_max=2.0)
            hit_a = intersect_dense(bvh, o, d, t_max=2.0, any_hit=True)
        oracle = traversal.intersect_brute_force(bvh, o, d, t_max=2.0)
        _check_against_oracle(hit, oracle)
        assert (np.asarray(hit_a.valid) == np.asarray(oracle.valid)).all()
