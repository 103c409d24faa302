import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from cudatracerlib_tpu.ops.shade_gather import packed_gather

rng = np.random.default_rng(0)
Tr, C, B = 6624, 64, 1 << 20
table = jnp.asarray(rng.standard_normal((Tr, C)).astype(np.float32) * 100)
# include int-like columns
table = table.at[:, 40].set(jnp.arange(Tr, dtype=jnp.float32))
idx = jnp.asarray(rng.integers(0, Tr, B).astype(np.int32))

out = packed_gather(table, idx)
ref = np.asarray(table)[np.asarray(idx)].T
o = np.asarray(out)
err = np.abs(o - ref) / np.maximum(np.abs(ref), 1e-6)
print("max rel err (float cols):", err[:40].max())
print("int col exact:", np.array_equal(o[40], ref[40]))

# timing: marginal cost inside scan
def run(n):
    def body(acc, _):
        return acc + packed_gather(table, idx)[0], None
    acc, _ = jax.lax.scan(body, jnp.zeros((B,)), None, length=n)
    return acc
r10 = jax.jit(run, static_argnums=0)
_ = np.asarray(r10(2))[:1]; _ = np.asarray(r10(12))[:1]
t0=time.perf_counter(); _ = np.asarray(r10(2))[:1]; t2=time.perf_counter()-t0
t0=time.perf_counter(); _ = np.asarray(r10(12))[:1]; t12=time.perf_counter()-t0
print(f"marginal per call: {(t12-t2)/10*1000:.2f} ms  (B={B}, Tr={Tr}, C={C})")

# gradient check
def loss(tb):
    return packed_gather(tb, idx[:1000]).sum()
g = jax.grad(loss)(table)
gref = np.zeros((Tr, C), np.float32)
np.add.at(gref, np.asarray(idx[:1000]), 1.0)
print("grad ok:", np.allclose(np.asarray(g), gref))
