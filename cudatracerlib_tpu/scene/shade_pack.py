"""Packed per-triangle shading table driving the fused-gather shade path.

One (Tp, 64) f32 table joins EVERYTHING the surface shading chain reads per
hit lane — triangle vertices/normals/uvs (fillDG inputs), the winner's Woop
rows (exact t/u/v recompute), and the per-material scalar params joined
per-triangle (Material.h:38 fields) — so ONE ops/shade_gather.packed_gather
call replaces the ~37 per-lane dynamic takes + 24-field select chains the
round-4 profile priced at ~130 ms/bounce at 1M lanes (BASELINE.md).

The pack is built from the scene pytree with T-sized (not B-sized) work at
trace time, OUTSIDE the bounce scan, so it is computed once per render
program. Counterpart of the reference megakernel reading
TriangleData/Material inline (Kernel/TraceHelper.cu:274-307 fillDG,
Engine/Material.h:38) — in-register there, through one MXU pass here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.traversal import intersect_woop
from ..math.frame import Frame
from ..math.vecmath import dot, normalize
from ..ops import shade_gather
from . import bsdf as bsdf_mod
from . import textures as tex_mod

# ---- column layout (f32 columns, padded to 64) ----
VERTS = slice(0, 9)
NORMALS = slice(9, 18)
UVS = slice(18, 24)
N_FACE = slice(24, 27)
UV_DENSITY = 27
WOOP = slice(28, 40)
MAT_ID = 40
BSDF_TYPE = 41
DIST_TYPE = 42
ETA = 43
COND_ETA = slice(44, 47)
COND_K = slice(47, 50)
ALPHA_U = 50
ALPHA_V = 51
EXPONENT = 52
NONLINEAR = 53
BLEND_WEIGHT = 54
LIGHT_ID = 55
TEX_ALBEDO = 56
TEX_SPECULAR = 57
TEX_TRANS = 58
N_USED = 59
COLS = 64


def pack_enabled(scene, flat_shading: bool) -> bool:
    """Static predicate: the fused shade path applies on accelerator
    backends for non-instanced scenes whose padded triangle count fits the
    VMEM-resident gather kernel. Tiny scenes (Cornell-class, < 1k rows) keep
    the take/select path — their tables are cache-resident and the scene is
    already at 1.4x the perf bar. Flat-shaded scenes USE the pack: the
    round-4 profile priced even the flat make_interaction at 54 ms/bounce at
    1M lanes, and the general interpolation path reproduces flat results
    exactly (face normals occupy the normals slots, default UV chart)."""
    if jax.devices()[0].platform in ("cpu",):
        return False
    if scene.instances:
        return False
    Tp = int(scene.bvh.woop.shape[0])
    return 1024 <= Tp <= shade_gather.MAX_ROWS


def build_shade_pack(scene) -> jnp.ndarray:
    """(Tp, 64) f32 join of shading + woop + per-material columns.

    T-sized work (small_gather select chains over the material table run
    over Tp rows, not B lanes); call once per program, outside the bounce
    loop."""
    from .scene import small_gather

    sh, m = scene.shading, scene.materials
    Tp = sh.verts.shape[0]
    mid = sh.mat_id

    def g(t):
        return small_gather(t, mid)

    def col(x):
        return x.reshape(Tp, -1).astype(jnp.float32)

    parts = [
        col(sh.verts), col(sh.normals), col(sh.uvs), col(sh.n_face),
        col(sh.uv_density), col(scene.bvh.woop),
        col(mid), col(g(m.bsdf_type)), col(g(m.dist_type)), col(g(m.eta)),
        col(g(m.cond_eta)), col(g(m.cond_k)), col(g(m.alpha_u)),
        col(g(m.alpha_v)), col(g(m.exponent)), col(g(m.nonlinear)),
        col(g(m.blend_weight)), col(g(m.light_id)), col(g(m.tex_albedo)),
        col(g(m.tex_specular)), col(g(m.tex_transmittance)),
    ]
    tbl = jnp.concatenate(parts, axis=1)
    assert tbl.shape[1] == N_USED, tbl.shape
    return jnp.pad(tbl, ((0, 0), (0, COLS - N_USED)))


def cols(rows, s: slice):
    """(B, n) vector from per-column (B,) slices of the (C, B) gather
    output. Stacking 1-D column vectors keeps every intermediate in the
    compact 1-D layout — slicing a (B, C) matrix instead forced 128-lane
    padded (B, 1) temps (42-128x HBM expansion, the glossy OOM)."""
    return jnp.stack([rows[i] for i in range(s.start, s.stop)], axis=-1)


def pack_interaction(rows, o, d, hit):
    """Interaction from the gathered pack columns (the fused fillDG).

    t/u/v are recomputed from the pack's Woop columns — exact at the
    kernel's ~17-bit table precision, better than the cluster kernel's
    tag-quantized in-kernel t, and differentiable w.r.t. (woop, o, d) the
    same way refine_hit's closed form is."""
    from .scene import Interaction

    sg = jax.lax.stop_gradient
    t, bu, bv, _ = intersect_woop(cols(rows, WOOP), o, d, -jnp.inf, jnp.inf)
    valid = sg(hit.valid)
    t_safe = jnp.where(valid & jnp.isfinite(t), t, 1.0)
    p = o + d * t_safe[..., None]
    b1 = bu[..., None]
    b2 = bv[..., None]
    b0 = 1.0 - b1 - b2

    v = cols(rows, VERTS).reshape(-1, 3, 3)
    vn = cols(rows, NORMALS).reshape(-1, 3, 3)
    uvs = cols(rows, UVS).reshape(-1, 3, 2)
    n_geo = cols(rows, N_FACE)
    n_sh = normalize(vn[:, 0] * b0 + vn[:, 1] * b1 + vn[:, 2] * b2)
    uv = uvs[:, 0] * b0 + uvs[:, 1] * b1 + uvs[:, 2] * b2

    duv1 = uvs[:, 1] - uvs[:, 0]
    duv2 = uvs[:, 2] - uvs[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    dpdu = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) / jnp.where(
        jnp.abs(det) < 1e-9, 1.0, det)[:, None]
    use_uv = (jnp.abs(det) > 1e-9) & (jnp.sum(dpdu * dpdu, -1) > 1e-12)
    f_fb = Frame.from_normal(n_sh)
    s_uv = dpdu - n_sh * dot(n_sh, dpdu, keepdims=True)
    s_len = jnp.sqrt(jnp.maximum(jnp.sum(s_uv * s_uv, -1), 1e-18))
    s = jnp.where((use_uv & (s_len > 1e-9))[:, None],
                  s_uv / s_len[:, None], f_fb.s)
    t_vec = jnp.cross(n_sh, s)
    frame = Frame(s=s, t=t_vec, n=n_sh)

    mat_id = rows[MAT_ID].astype(jnp.int32)
    return Interaction(
        p=p, n_geo=n_geo, frame=frame, uv=uv, t=jnp.where(valid, t, hit.t),
        prim=sg(jnp.maximum(hit.prim, 0)),
        mat_id=jnp.where(valid, mat_id, 0), valid=valid,
    )


def get_pack(scene, flat_shading: bool = False):
    """build_shade_pack(scene) when the fused path applies, else None.
    Call ONCE per program, outside bounce loops."""
    return build_shade_pack(scene) if pack_enabled(scene, flat_shading) \
        else None


def hit_shading(scene, o, d, hit, pack, tex_types=None, uv_width=None,
                flat: bool = False):
    """(Interaction, MatParams) for a hit batch — ONE fused one-hot MXU
    gather when `pack` is set (scene_intersect should then be called with
    refine=(pack is None)), the classic take/select path otherwise. The
    shared entry point for every light-transport walker (PPM photon/eye
    walks, BDPT/VCM subpaths, the light tracer)."""
    import jax.numpy as _jnp

    if pack is not None:
        from ..ops.shade_gather import packed_gather

        rows = packed_gather(pack, _jnp.maximum(hit.prim, 0))
        it = pack_interaction(rows, o, d, hit)
        mp = pack_mat_params(scene, rows, it.uv, tex_types,
                             uv_width=uv_width)
        return it, mp
    from .scene import gather_mat_params, make_interaction

    it = make_interaction(scene, o, d, hit, flat=flat)
    mp = gather_mat_params(scene, it, tex_types, uv_width=uv_width)
    return it, mp


def pack_mat_params(scene, rows, uv, tex_types=None, uv_width=None):
    """MatParams from pack columns + texture evaluation at uv (the fused
    gather_mat_params: every small_gather select chain becomes a column
    read; textures still evaluate per-lane because they depend on uv)."""
    i32 = lambda c: rows[c].astype(jnp.int32)
    albedo = tex_mod.eval_texture(scene.textures, i32(TEX_ALBEDO), uv,
                                  active=tex_types, uv_width=uv_width)
    spec = tex_mod.eval_texture(scene.textures, i32(TEX_SPECULAR), uv,
                                active=tex_types, uv_width=uv_width)
    trans = tex_mod.eval_texture(scene.textures, i32(TEX_TRANS), uv,
                                 active=tex_types, uv_width=uv_width)
    return bsdf_mod.MatParams(
        bsdf_type=i32(BSDF_TYPE),
        dist_type=i32(DIST_TYPE),
        albedo=albedo,
        specular=spec,
        transmittance=trans,
        eta=rows[ETA],
        cond_eta=cols(rows, COND_ETA),
        cond_k=cols(rows, COND_K),
        alpha_u=rows[ALPHA_U],
        alpha_v=rows[ALPHA_V],
        exponent=rows[EXPONENT],
        nonlinear=rows[NONLINEAR],
        blend_weight=rows[BLEND_WEIGHT],
    )
