import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from cudatracerlib_tpu.ops.photon_gather import build_photon_tiles, photon_density_tpu, NORMAL_MIN_DOT

rng = np.random.default_rng(0)
P, B = 300_000, 65_536
pos = rng.random((P, 3)).astype(np.float32)
power = rng.random((P, 3)).astype(np.float32) * 0.01
nrm = rng.standard_normal((P, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
valid = rng.random(P) < 0.6
qp = rng.random((B, 3)).astype(np.float32)
qn = np.tile(np.float32([0, 0, 1]), (B, 1))
qv = np.ones(B, bool)
r = 0.03
res = 32  # cell size 1/32 >= r ✓

tiles, aabbs = build_photon_tiles(jnp.asarray(pos), jnp.asarray(power), jnp.asarray(nrm),
                                  jnp.asarray(valid), jnp.zeros(3), jnp.ones(3), res)
tiles, aabbs = jax.block_until_ready((tiles, aabbs))
print("tiles:", tiles.shape)

flux, sw = photon_density_tpu(tiles, aabbs, jnp.asarray(qp), jnp.asarray(qn), jnp.asarray(qv), jnp.float32(r))
flux = np.asarray(flux); sw = np.asarray(sw)

# brute-force reference on first 512 queries
qs = qp[:512]
d2 = ((qs[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
w = np.maximum(1.0 - d2 / (r * r), 0.0)
ndot = (qn[:512, None, :] * nrm[None, :, :]).sum(-1)
w = np.where((ndot > NORMAL_MIN_DOT) & valid[None, :], w, 0.0)
ref_flux = w @ power
ref_sw = w.sum(1)
err = np.abs(flux[:512] - ref_flux) / np.maximum(np.abs(ref_flux), 1e-6)
print("flux max rel err:", err.max(), "sw max rel err:",
      np.abs(sw[:512] - ref_sw).max() / max(ref_sw.max(), 1e-9))

# timing (marginal in scan)
import functools
@functools.partial(jax.jit, static_argnums=0)
def run(n):
    def f(c, _):
        fl, s2 = photon_density_tpu(tiles, aabbs, jnp.asarray(qp) + c*1e-9, jnp.asarray(qn), jnp.asarray(qv), jnp.float32(r))
        return c + fl[0, 0] * 1e-20, None
    c, _ = jax.lax.scan(f, jnp.float32(0), None, length=n)
    return c
np.asarray(run(2)); np.asarray(run(10))
t0=time.perf_counter(); np.asarray(run(2)); t2=time.perf_counter()-t0
t0=time.perf_counter(); np.asarray(run(10)); t10=time.perf_counter()-t0
print(f"marginal per density call: {(t10-t2)/8*1000:.2f} ms (P={P}, B={B})")

# --- coherent (cell-sorted) queries: the production pattern ---
cell = np.floor(qp * 32).astype(np.int64)
cid = (cell[:,0]*32 + cell[:,1])*32 + cell[:,2]
order = np.argsort(cid)
qps = qp[order]
flux2, sw2 = photon_density_tpu(tiles, aabbs, jnp.asarray(qps), jnp.asarray(qn), jnp.asarray(qv), jnp.float32(r))
flux2 = np.asarray(flux2)
# abs error percentiles vs brute force on 512 random sorted queries
sel = np.arange(0, B, B//512)[:512]
qs2 = qps[sel]
d2b = ((qs2[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
wb = np.maximum(1.0 - d2b / (r * r), 0.0)
ndb = (qn[:512, None, :] * nrm[None, :, :]).sum(-1)
wb = np.where((ndb > NORMAL_MIN_DOT) & valid[None, :], wb, 0.0)
refb = wb @ power
err_abs = np.abs(flux2[sel] - refb)
print("abs err: p50 %.2e p99 %.2e max %.2e | ref p50 %.2e max %.2e" % (
    np.percentile(err_abs,50), np.percentile(err_abs,99), err_abs.max(),
    np.percentile(refb,50), refb.max()))

@functools.partial(jax.jit, static_argnums=0)
def run2(n):
    def f(c, _):
        fl, s2 = photon_density_tpu(tiles, aabbs, jnp.asarray(qps) + c*1e-9, jnp.asarray(qn), jnp.asarray(qv), jnp.float32(r))
        return c + fl[0, 0] * 1e-20, None
    c, _ = jax.lax.scan(f, jnp.float32(0), None, length=n)
    return c
np.asarray(run2(2)); np.asarray(run2(12))
t0=time.perf_counter(); np.asarray(run2(2)); t2=time.perf_counter()-t0
t0=time.perf_counter(); np.asarray(run2(12)); t12=time.perf_counter()-t0
print(f"sorted-queries marginal: {(t12-t2)/10*1000:.2f} ms")
