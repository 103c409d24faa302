"""Texture system: SoA texture table + evaluation.

Counterpart of reference ``SceneTypes/Texture.h:247`` (ConstantTexture:107,
CheckerboardTexture:127, BilerpTexture:77, ImageTexture:159, UVTexture:185,
WireframeTexture:209) and the MIPMap sampler (Engine/MIPMap_device.h:19-26).

TPU design: all textures of a scene live in one SoA table indexed by texture
id; image data lives in a fixed-size mip atlas (layers x R x R x 3) so lookups
are static-shape gathers. Evaluation is differentiable w.r.t. colors and the
atlas texels.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

CONSTANT = 0
CHECKERBOARD = 1
IMAGE = 2
UV = 3
WIREFRAME = 4
BILERP = 5

ATLAS_RES = 256  # each image layer is resampled to ATLAS_RES^2 at load time


class Textures(NamedTuple):
    ttype: jnp.ndarray     # (NT,) int32
    color_a: jnp.ndarray   # (NT, 3) — constant value / checker color 0 / scale for image
    color_b: jnp.ndarray   # (NT, 3) — checker color 1
    uv_xform: jnp.ndarray  # (NT, 4): (su, sv, du, dv) TextureMapping2D (Texture.h:15)
    image_id: jnp.ndarray  # (NT,) int32 into atlas layers
    atlas: jnp.ndarray     # (L, R, R, 3) float32 image layers (L may be 1 dummy)

    @staticmethod
    def build(records: list[dict], images: list[np.ndarray] | None = None) -> "Textures":
        """Host-side constructor from a list of texture dicts."""
        nt = max(len(records), 1)
        ttype = np.zeros(nt, np.int32)
        ca = np.ones((nt, 3), np.float32)
        cb = np.zeros((nt, 3), np.float32)
        uvx = np.tile(np.array([1.0, 1.0, 0.0, 0.0], np.float32), (nt, 1))
        iid = np.zeros(nt, np.int32)
        for i, r in enumerate(records):
            ttype[i] = r.get("type", CONSTANT)
            ca[i] = np.asarray(r.get("color_a", [1, 1, 1]), np.float32)
            cb[i] = np.asarray(r.get("color_b", [0, 0, 0]), np.float32)
            uvx[i] = np.asarray(r.get("uv_xform", [1, 1, 0, 0]), np.float32)
            iid[i] = r.get("image_id", 0)
        if images:
            layers = []
            for img in images:
                layers.append(_resample(np.asarray(img, np.float32), ATLAS_RES))
            atlas = np.stack(layers)
        else:
            atlas = np.ones((1, ATLAS_RES, ATLAS_RES, 3), np.float32)
        return Textures(
            ttype=jnp.asarray(ttype),
            color_a=jnp.asarray(ca),
            color_b=jnp.asarray(cb),
            uv_xform=jnp.asarray(uvx),
            image_id=jnp.asarray(iid),
            atlas=jnp.asarray(atlas),
        )


def _resample(img: np.ndarray, res: int) -> np.ndarray:
    """Nearest-neighbour resample to the atlas resolution (host side)."""
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    h, w = img.shape[:2]
    yi = (np.arange(res) * h // res).clip(0, h - 1)
    xi = (np.arange(res) * w // res).clip(0, w - 1)
    return img[np.ix_(yi, xi)][..., :3].astype(np.float32)


def _bilinear_atlas(atlas, layer, uv):
    """Bilinear fetch from atlas layer; uv wrap-repeat. uv: (..., 2)."""
    R = atlas.shape[1]
    x = jnp.mod(uv[..., 0], 1.0) * (R - 1)
    y = jnp.mod(1.0 - uv[..., 1], 1.0) * (R - 1)  # flip v (image rows top-down)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, R - 1)
    y1 = jnp.minimum(y0 + 1, R - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def fetch(yy, xx):
        return atlas[layer, yy, xx]

    c00 = fetch(y0, x0)
    c01 = fetch(y0, x1)
    c10 = fetch(y1, x0)
    c11 = fetch(y1, x1)
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def eval_texture(tex: Textures, tid, uv, bary=None, active=None):
    """Evaluate texture `tid` (batched int32) at uv (..., 2). Returns (..., 3).

    `active`: optional static tuple of texture types present — when only
    CONSTANT textures exist this collapses to a single gather."""
    tid = jnp.clip(tid, 0, tex.ttype.shape[0] - 1)
    if active is not None and set(active) <= {CONSTANT}:
        from .scene import small_gather

        return small_gather(tex.color_a, tid)
    tt = tex.ttype[tid]
    ca = tex.color_a[tid]
    cb = tex.color_b[tid]
    xf = tex.uv_xform[tid]
    uv_t = uv * xf[..., 0:2] + xf[..., 2:4]

    # checkerboard (Texture.h:127): parity of floor(u)+floor(v) at 2x scale
    iu = jnp.floor(uv_t[..., 0] * 2.0).astype(jnp.int32)
    iv = jnp.floor(uv_t[..., 1] * 2.0).astype(jnp.int32)
    check = ((iu + iv) & 1) == 0
    checker = jnp.where(check[..., None], ca, cb)

    image = _bilinear_atlas(tex.atlas, tex.image_id[tid], uv_t) * ca

    uvcol = jnp.stack(
        [jnp.mod(uv_t[..., 0], 1.0), jnp.mod(uv_t[..., 1], 1.0), jnp.zeros_like(uv_t[..., 0])],
        axis=-1,
    )

    if bary is None:
        wire = jnp.zeros_like(ca)
    else:
        b0 = 1.0 - bary[..., 0] - bary[..., 1]
        edge = jnp.minimum(jnp.minimum(b0, bary[..., 0]), bary[..., 1]) < 0.02
        wire = jnp.where(edge[..., None], jnp.ones_like(ca), jnp.zeros_like(ca))

    out = jnp.where((tt == CHECKERBOARD)[..., None], checker, ca)
    out = jnp.where((tt == IMAGE)[..., None], image, out)
    out = jnp.where((tt == UV)[..., None], uvcol, out)
    out = jnp.where((tt == WIREFRAME)[..., None], wire, out)
    return out
