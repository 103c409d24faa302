import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import cudatracerlib_tpu.math.rough_transmittance as rt

T = rt._transmittance_grid()           # (NE, NA, NC)
Tinv = rt._transmittance_grid_inv()
np.save(".scratch/rt_T.npy", T); np.save(".scratch/rt_Tinv.npy", Tinv)
E, A, C = np.meshgrid(rt._ETAS, rt._ALPHAS, rt._COSINES, indexing="ij")
Ts = rt._smooth_T(E.reshape(-1), C.reshape(-1)).reshape(T.shape)
dT = T - Ts
print("dT range:", dT.min(), dT.max())

def basis(eta, al, ci, pas, pcs, pes, sqrt_c=False):
    e = eta - 1.5; a = al; c = ci
    g = np.sqrt(np.maximum(1.0 - c, 0.0))
    rows = []
    for pa in pas:
        for pc in range(pcs):
            for pe in range(pes):
                rows.append((a**pa) * (c**pc) * (e**pe))
                if sqrt_c:
                    rows.append((a**pa) * g * (c**pc) * (e**pe))
    return np.stack(rows, -1)

for (pas, pcs, pes, sq) in [((1,2,3), 5, 3, False), ((1,2,3), 5, 3, True), ((1,2,3,4), 6, 3, True)]:
    X = basis(E.reshape(-1), A.reshape(-1), C.reshape(-1), pas, pcs, pes, sq)
    coefs, *_ = np.linalg.lstsq(X, dT.reshape(-1), rcond=None)
    r = np.abs(X @ coefs - dT.reshape(-1)).reshape(T.shape)
    # interior: alpha<=0.5, cos>=0.2, eta in [1.3, 1.8]
    mi = (rt._ALPHAS <= 0.5)
    mc_ = (rt._COSINES >= 0.2)
    me = (rt._ETAS >= 1.3) & (rt._ETAS <= 1.8)
    print(f"terms={X.shape[1]} sqrt={sq}: max={r.max():.4f} interior={r[np.ix_(me, mi, mc_)].max():.4f}")
