import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import cudatracerlib_tpu.math.rough_transmittance as rt

# denser practical-domain grids
rt._ETAS = np.linspace(1.25, 2.0, 7)
rt._ALPHAS = np.linspace(0.02, 0.6, 9)
rt._COSINES = np.linspace(0.15, 1.0, 18)
rt._transmittance_grid_inv.cache_clear()
T = rt._transmittance_grid()
E, A, C = np.meshgrid(rt._ETAS, rt._ALPHAS, rt._COSINES, indexing="ij")
Ts = rt._smooth_T(E.reshape(-1), C.reshape(-1)).reshape(T.shape)
dT = T - Ts
print("restricted dT range:", dT.min(), dT.max())

def basis(eta, al, ci, npa, npc, npe):
    e = eta - 1.5; a = al; c = ci
    rows = []
    for pa in range(1, npa+1):
        for pc in range(npc):
            for pe in range(npe):
                rows.append((a**pa) * (c**pc) * (e**pe))
    return np.stack(rows, -1)

for (npa, npc, npe) in [(3, 5, 3), (4, 6, 3), (4, 8, 3), (5, 8, 3)]:
    X = basis(E.reshape(-1), A.reshape(-1), C.reshape(-1), npa, npc, npe)
    coefs, *_ = np.linalg.lstsq(X, dT.reshape(-1), rcond=None)
    r = np.abs(X @ coefs - dT.reshape(-1))
    print(f"npa={npa} npc={npc} terms={X.shape[1]}: max={r.max():.4f} p99={np.percentile(r,99):.4f}")
np.save(".scratch/rt_T2.npy", T)
