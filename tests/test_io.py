"""Loader tests: OBJ, PLY, Mitsuba XML; image output; checkpointing; settings."""
import os
import textwrap

import numpy as np
import pytest

from cudatracerlib_tpu.io.obj import load_obj, obj_to_scene_arrays
from cudatracerlib_tpu.io.ply import load_ply
from cudatracerlib_tpu.utils.settings import Parameter, ParameterCollection


class TestObj:
    def test_load_and_materials(self, tmp_path):
        mtl = tmp_path / "m.mtl"
        mtl.write_text(textwrap.dedent("""
            newmtl red
            Kd 0.8 0.1 0.1
            newmtl shiny
            Kd 0.1 0.1 0.1
            Ks 0.9 0.9 0.9
            Ns 100
        """))
        obj = tmp_path / "t.obj"
        obj.write_text(textwrap.dedent("""
            mtllib m.mtl
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            vn 0 0 1
            usemtl red
            f 1//1 2//1 3//1 4//1
            usemtl shiny
            f 1//1 3//1 4//1
        """))
        mesh = load_obj(str(obj), cache=False)
        assert mesh.vertices.shape == (3, 3, 3)  # quad fan = 2 tris + 1 tri
        assert len(mesh.materials) == 2
        v, n, uv, mid, mats, texs = obj_to_scene_arrays(mesh)
        assert len(mats) == 2
        assert mid.shape == (3,)
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)

    def test_cache_roundtrip(self, tmp_path):
        obj = tmp_path / "c.obj"
        obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        m1 = load_obj(str(obj), cache=True)
        assert os.path.exists(str(obj) + ".compiled.npz")
        m2 = load_obj(str(obj), cache=True)
        np.testing.assert_array_equal(m1.vertices, m2.vertices)


class TestPly:
    def test_ascii(self, tmp_path):
        ply = tmp_path / "t.ply"
        ply.write_text(textwrap.dedent("""\
            ply
            format ascii 1.0
            element vertex 4
            property float x
            property float y
            property float z
            element face 2
            property list uchar int vertex_indices
            end_header
            0 0 0
            1 0 0
            1 1 0
            0 1 0
            3 0 1 2
            3 0 2 3
        """))
        v, n, uv = load_ply(str(ply))
        assert v.shape == (2, 3, 3)
        assert n is None

    def test_binary(self, tmp_path):
        import struct

        header = textwrap.dedent("""\
            ply
            format binary_little_endian 1.0
            element vertex 3
            property float x
            property float y
            property float z
            element face 1
            property list uchar int vertex_indices
            end_header
        """).encode()
        body = b"".join(struct.pack("<fff", *p) for p in [(0, 0, 0), (1, 0, 0), (0, 1, 0)])
        body += struct.pack("<Biii", 3, 0, 1, 2)
        (tmp_path / "b.ply").write_bytes(header + body)
        v, n, uv = load_ply(str(tmp_path / "b.ply"))
        assert v.shape == (1, 3, 3)
        np.testing.assert_allclose(v[0, 1], [1, 0, 0])


MITSUBA_XML = """<?xml version="1.0"?>
<scene version="0.5.0">
    <default name="spp" value="16"/>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
            <lookat origin="0,-4,1" target="0,0,1" up="0,0,1"/>
        </transform>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.7 0.7 0.7"/>
    </bsdf>
    <bsdf type="roughconductor" id="metal">
        <string name="material" value="au"/>
        <float name="alpha" value="0.1"/>
        <string name="distribution" value="ggx"/>
    </bsdf>
    <shape type="rectangle">
        <transform name="toWorld">
            <scale value="3"/>
        </transform>
        <ref id="white"/>
    </shape>
    <shape type="sphere">
        <float name="radius" value="0.5"/>
        <transform name="toWorld">
            <translate x="0" y="0" z="1"/>
        </transform>
        <ref id="metal"/>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld">
            <rotate x="1" angle="180"/>
            <translate x="0" y="0" z="2.5"/>
        </transform>
        <emitter type="area">
            <rgb name="radiance" value="10 10 8"/>
        </emitter>
        <ref id="white"/>
    </shape>
    <emitter type="constant">
        <rgb name="radiance" value="0.1 0.1 0.15"/>
    </emitter>
</scene>
"""


class TestMitsuba:
    def test_parse_and_render(self, tmp_path):
        from cudatracerlib_tpu.io.mitsuba import load_mitsuba
        from cudatracerlib_tpu.render.path_tracer import PTConfig, render

        xml = tmp_path / "scene.xml"
        xml.write_text(MITSUBA_XML)
        scene = load_mitsuba(str(xml))
        assert scene.bvh.woop.shape[0] > 0
        assert scene.n_lights == 2  # area + constant env
        img = np.asarray(render(scene, 24, 24, 4, 0, PTConfig(max_depth=4)))
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        # gold-ish sphere: center pixels should be warm (r>b)
        c = img[10:14, 10:14].mean(axis=(0, 1))
        assert c[0] > c[2]

    def test_bsdf_mapping(self, tmp_path):
        from cudatracerlib_tpu.io.mitsuba import load_mitsuba
        from cudatracerlib_tpu.scene import bsdf as B

        xml = tmp_path / "s.xml"
        xml.write_text(MITSUBA_XML)
        scene = load_mitsuba(str(xml))
        types = set(np.asarray(scene.materials.bsdf_type).tolist())
        assert B.DIFFUSE in types
        assert B.ROUGHCONDUCTOR in types

    def test_nested_bsdfs_and_maps(self, tmp_path):
        """Coating keeps real COATING nesting, bumpmap wires tex_height,
        mask wires the alpha test, blendbsdf builds BLEND — no silent
        unwrap-and-drop (reference ObjectParser.h:600-890)."""
        import PIL.Image

        from cudatracerlib_tpu.io.mitsuba import load_mitsuba
        from cudatracerlib_tpu.render.path_tracer import PTConfig, render
        from cudatracerlib_tpu.scene import bsdf as B
        from cudatracerlib_tpu.scene import textures as T

        bump = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
        PIL.Image.fromarray(bump).save(tmp_path / "bump.png")
        xml = tmp_path / "nested.xml"
        xml.write_text("""<scene version="0.5.0">
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="toWorld">
      <lookat origin="0,-4,1" target="0,0,1" up="0,0,1"/>
    </transform>
  </sensor>
  <emitter type="constant"><spectrum name="radiance" value="1"/></emitter>
  <shape type="sphere">
    <point name="center" x="-1.2" y="0" z="1"/><float name="radius" value="0.5"/>
    <bsdf type="coating">
      <float name="intIOR" value="1.5"/>
      <bsdf type="diffuse"><spectrum name="reflectance" value="0.2,0.5,0.8"/></bsdf>
    </bsdf>
  </shape>
  <shape type="sphere">
    <point name="center" x="0" y="0" z="1"/><float name="radius" value="0.5"/>
    <bsdf type="bumpmap">
      <float name="scale" value="2.0"/>
      <texture type="bitmap"><string name="filename" value="bump.png"/></texture>
      <bsdf type="diffuse"><spectrum name="reflectance" value="0.6"/></bsdf>
    </bsdf>
  </shape>
  <shape type="sphere">
    <point name="center" x="1.2" y="0" z="1"/><float name="radius" value="0.5"/>
    <bsdf type="mask">
      <spectrum name="opacity" value="0.3"/>
      <bsdf type="blendbsdf">
        <float name="weight" value="0.4"/>
        <bsdf type="diffuse"><spectrum name="reflectance" value="0.7"/></bsdf>
        <bsdf type="roughconductor"><float name="alpha" value="0.2"/></bsdf>
      </bsdf>
    </bsdf>
  </shape>
</scene>""")
        scene = load_mitsuba(str(xml))
        mats = scene.materials
        btypes = np.asarray(mats.bsdf_type)
        assert B.COATING in btypes
        assert B.BLEND in btypes
        # coating nests the blue-ish diffuse
        ci = int(np.nonzero(btypes == B.COATING)[0][0])
        ni = int(np.asarray(mats.nested_id)[ci])
        assert np.asarray(mats.bsdf_type)[ni] == B.DIFFUSE
        # bumpmap became a height map on a diffuse material
        hi = np.nonzero(np.asarray(mats.tex_height) >= 0)[0]
        assert len(hi) > 0
        assert np.asarray(mats.height_scale)[hi[0]] == 2.0
        ttypes = np.asarray(scene.textures.ttype)
        assert ttypes[int(np.asarray(mats.tex_height)[hi[0]])] == T.IMAGE
        # mask became an alpha test on the BLEND material
        bi = int(np.nonzero(btypes == B.BLEND)[0][0])
        assert np.asarray(mats.alpha_mode)[bi] == 1
        assert np.asarray(mats.tex_alpha)[bi] >= 0
        # blend's second child is the rough conductor
        assert np.asarray(mats.bsdf_type)[int(np.asarray(mats.nested_id)[bi])] \
            == B.ROUGHCONDUCTOR
        img = np.asarray(render(scene, 32, 32, 4, 0, PTConfig(max_depth=4)))
        assert np.isfinite(img).all() and img.mean() > 0.01

    def test_unsupported_plugin_warns(self, tmp_path):
        import warnings

        from cudatracerlib_tpu.io.mitsuba import load_mitsuba

        xml = tmp_path / "warn.xml"
        xml.write_text("""<scene version="0.5.0">
  <emitter type="constant"><spectrum name="radiance" value="1"/></emitter>
  <shape type="sphere">
    <float name="radius" value="1"/>
    <bsdf type="hanrahankrueger_nonexistent"/>
  </shape>
</scene>""")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            load_mitsuba(str(xml))
        assert any("unsupported" in str(x.message) for x in w)


class TestSettings:
    def test_constraints(self):
        p = Parameter("depth", 5, interval=(1, 64))
        with pytest.raises(ValueError):
            p.set(0)
        p.set(10)
        assert p.get() == 10

    def test_enum_roundtrip(self):
        p = Parameter("mode", "fast", enum={"fast": 0, "quality": 1})
        assert p.get() == 0
        assert p.as_string() == "fast"
        with pytest.raises(ValueError):
            p.set("bogus")

    def test_hierarchy_and_overrides(self):
        root = ParameterCollection("tracer")
        root.add(Parameter("depth", 5, interval=(1, 64)))
        child = root.add_child(ParameterCollection("sampler"))
        child.add(Parameter("spp", 4, interval=(1, 4096)))
        root.apply_overrides(["depth=8", "sampler.spp=64"])
        assert root["depth"] == 8
        assert root["sampler.spp"] == 64
        d = root.to_dict()
        assert d["sampler"]["spp"] == 64


class TestCheckpoint:
    def test_film_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from cudatracerlib_tpu.image.film import Film
        from cudatracerlib_tpu.utils.checkpoint import load_pytree, save_pytree

        film = Film.create(8, 8)
        film = film._replace(rgb=film.rgb + 1.5, n_passes=jnp.float32(3))
        path = str(tmp_path / "ckpt.npz")
        save_pytree(path, film)
        loaded = load_pytree(path, Film.create(8, 8))
        np.testing.assert_allclose(np.asarray(loaded.rgb), 1.5)
        assert float(loaded.n_passes) == 3


MD5MESH = """
MD5Version 10
commandline ""

numJoints 2
numMeshes 1

joints {
	"root"	-1 ( 0 0 0 ) ( 0 0 0 )		//
	"arm"	0 ( 1 0 0 ) ( 0 0 0 )		// root
}

mesh {
	shader "beam"
	numverts 4
	vert 0 ( 0 0 ) 0 1
	vert 1 ( 1 0 ) 1 1
	vert 2 ( 1 1 ) 2 1
	vert 3 ( 0 1 ) 3 1

	numtris 2
	tri 0 0 1 2
	tri 1 0 2 3

	numweights 4
	weight 0 0 1.0 ( 0 0 0 )
	weight 1 0 1.0 ( 0 0.2 0 )
	weight 2 1 1.0 ( 1 0.2 0 )
	weight 3 1 1.0 ( 1 0 0 )
}
"""

MD5ANIM = """
MD5Version 10
commandline ""

numFrames 2
numJoints 2
frameRate 24
numAnimatedComponents 3

hierarchy {
	"root"	-1 0 0	//
	"arm"	0 56 0	// root ( Qx Qy Qz )
}

bounds {
	( -1 -1 -1 ) ( 3 3 1 )
	( -1 -1 -1 ) ( 3 3 1 )
}

baseframe {
	( 0 0 0 ) ( 0 0 0 )
	( 1 0 0 ) ( 0 0 0 )
}

frame 0 {
	 0 0 0
}

frame 1 {
	 0 0 -0.70710678
}
"""


class TestMD5:
    def test_mesh_and_anim(self, tmp_path):
        from cudatracerlib_tpu.io.md5 import (load_md5anim, load_md5mesh,
                                              md5_corner_arrays)

        mp = tmp_path / "beam.md5mesh"
        mp.write_text(MD5MESH)
        mesh = load_md5mesh(str(mp))
        assert mesh.verts.shape == (4, 3)
        assert mesh.tris.shape == (2, 3)
        assert mesh.joint_names == ["root", "arm"]
        # bind pose: weights 2/3 attach to joint "arm" at (1,0,0):
        # vertex 2 = arm_pos + (1, 0.2, 0) = (2, 0.2, 0)
        np.testing.assert_allclose(mesh.verts[2], [2, 0.2, 0], atol=1e-6)
        np.testing.assert_allclose(mesh.verts[0], [0, 0, 0], atol=1e-6)
        assert mesh.bone_ids[2, 0] == 1 and mesh.weights[2, 0] == 1.0

        ap = tmp_path / "beam.md5anim"
        ap.write_text(MD5ANIM)
        anim = load_md5anim(str(ap))
        assert anim.poses.shape == (2, 2, 4, 4)
        assert anim.frame_rate == 24.0
        # frame 0 = bind pose
        np.testing.assert_allclose(anim.poses[0, 1, :3, 3], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(anim.poses[0, 1, :3, :3], np.eye(3), atol=1e-6)
        # frame 1: arm rotated +90deg about z at (1,0,0)
        R = anim.poses[1, 1, :3, :3]
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-5)

        # LBS through the animation layer: tip vertex (2, 0.2, 0) bends to +y
        tris, uvs, bid, bw, mids = md5_corner_arrays(mesh)
        assert tris.shape == (2, 3, 3) and bid.shape == (2, 3, 4)
        import jax.numpy as jnp

        pose = jnp.asarray(anim.poses[1])
        inv_bind = jnp.asarray(mesh.inv_bind)
        palette = np.einsum("bij,bjk->bik", np.asarray(pose), np.asarray(inv_bind))
        v = np.concatenate([mesh.verts, np.ones((4, 1))], -1)
        skinned = np.einsum(
            "vwij,vj->vwi",
            palette[mesh.bone_ids], v)[:, :, :3]
        skinned = (skinned * mesh.weights[..., None]).sum(1)
        np.testing.assert_allclose(skinned[3], [1, 1, 0], atol=1e-5)
        np.testing.assert_allclose(skinned[0], [0, 0, 0], atol=1e-5)


MITSUBA_MEDIA_XML = """<?xml version="1.0"?>
<scene version="0.5.0">
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
            <lookat origin="0,-4,1" target="0,0,1" up="0,0,1"/>
        </transform>
    </sensor>
    <emitter type="sunsky">
        <float name="turbidity" value="4"/>
        <vector name="sunDirection" x="0.3" y="0.2" z="0.9"/>
    </emitter>
    <shape type="shapegroup" id="twin">
        <shape type="sphere">
            <float name="radius" value="0.3"/>
            <bsdf type="diffuse">
                <rgb name="reflectance" value="0.2 0.6 0.2"/>
            </bsdf>
        </shape>
    </shape>
    <shape type="instance">
        <ref id="twin"/>
        <transform name="toWorld"><translate x="-1"/></transform>
    </shape>
    <shape type="instance">
        <ref id="twin"/>
        <transform name="toWorld"><translate x="1"/></transform>
    </shape>
    <shape type="cylinder">
        <point name="p0" x="0" y="0" z="0"/>
        <point name="p1" x="0" y="0" z="1"/>
        <float name="radius" value="0.2"/>
    </shape>
    <shape type="cube">
        <transform name="toWorld">
            <translate x="0" y="0" z="1"/>
        </transform>
        <medium type="homogeneous" name="interior">
            <rgb name="sigmaS" value="0.4 0.4 0.4"/>
            <rgb name="sigmaA" value="0.05 0.05 0.05"/>
            <phase type="hg">
                <float name="g" value="0.6"/>
            </phase>
        </medium>
    </shape>
</scene>
"""


class TestMitsubaMedia:
    def test_media_sunsky_instances(self, tmp_path):
        from cudatracerlib_tpu.io.mitsuba import load_mitsuba_full
        from cudatracerlib_tpu.scene import media as M
        from cudatracerlib_tpu.scene import phase as PH

        xml = tmp_path / "scene.xml"
        xml.write_text(MITSUBA_MEDIA_XML)
        scene, media = load_mitsuba_full(str(xml))
        # sunsky = env map (Preetham) + sun directional
        assert scene.n_lights == 2
        env = np.asarray(scene.lights.env_map)
        assert env.ndim == 3 and np.isfinite(env).all() and env.max() > 0

        # media parsed with HG phase g=0.6 bounded by the cube AABB
        assert media is not None
        assert int(media.active[0]) == 1
        np.testing.assert_allclose(np.asarray(media.sigma_s[0]), [0.4] * 3)
        assert int(media.phase_type[0]) == PH.HG
        np.testing.assert_allclose(float(media.phase_g[0]), 0.6)
        bmin = np.asarray(media.box_min[0])
        np.testing.assert_allclose(bmin, [-1, -1, 0], atol=1e-5)

        # two instances + cylinder + cube geometry all present
        # (2 spheres of same tri count, cylinder 64 tris, cube 12 tris)
        assert scene.bvh.woop.shape[0] >= 64 + 12

    def test_vol_grid_roundtrip(self, tmp_path):
        import struct

        from cudatracerlib_tpu.io.mitsuba import _load_vol
        from cudatracerlib_tpu.scene import media as M

        nx = ny = nz = 5
        data = np.linspace(0.0, 1.0, nx * ny * nz).astype("<f4")
        with open(tmp_path / "d.vol", "wb") as f:
            f.write(b"VOL")
            f.write(struct.pack("B", 3))
            f.write(struct.pack("<i", 1))
            f.write(struct.pack("<3i", nx, ny, nz))
            f.write(struct.pack("<i", 1))
            f.write(struct.pack("<6f", 0, 0, 0, 1, 1, 1))
            f.write(data.tobytes())
        d = _load_vol(str(tmp_path / "d.vol"), M.GRID_RES)
        assert d is not None and d.shape == (M.GRID_RES,) * 3
        assert 0.0 <= d.min() <= d.max() <= 1.0
        assert d.std() > 0.01


class TestSerialized:
    def test_roundtrip(self, tmp_path):
        from cudatracerlib_tpu.io.serialized import (load_serialized,
                                                     save_serialized)

        rng = np.random.default_rng(0)
        v1 = rng.normal(size=(10, 3)).astype(np.float32)
        t1 = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.uint32)
        n1 = rng.normal(size=(10, 3)).astype(np.float32)
        uv1 = rng.uniform(size=(10, 2)).astype(np.float32)
        v2 = rng.normal(size=(6, 3)).astype(np.float32)
        t2 = np.asarray([[0, 1, 2], [3, 4, 5]], np.uint32)
        p = str(tmp_path / "m.serialized")
        save_serialized(p, [(v1, t1, n1, uv1, "a"), (v2, t2, None, None, "b")])

        m0 = load_serialized(p, 0)
        assert m0 is not None and m0.name == "a"
        np.testing.assert_allclose(m0.vertices, v1[t1], atol=1e-6)
        np.testing.assert_allclose(m0.normals, n1[t1], atol=1e-6)
        np.testing.assert_allclose(m0.uvs, uv1[t1], atol=1e-6)
        m1 = load_serialized(p, 1)
        assert m1 is not None and m1.name == "b" and m1.normals is None
        np.testing.assert_allclose(m1.vertices, v2[t2], atol=1e-6)


class TestHair:
    def test_text_strands(self, tmp_path):
        from cudatracerlib_tpu.io.hair import load_hair

        p = tmp_path / "h.hair"
        p.write_text("0 0 0\n0 0 1\n0 0 2\n\n1 0 0\n1 0 1\n")
        tris = load_hair(str(p), radius=0.01)
        # 3 segments * 2 tris
        assert tris.shape == (6, 3, 3)
        assert np.isfinite(tris).all()
        # ribbon width ~ 2 * radius
        seg0 = tris[0]
        w = np.linalg.norm(seg0[1] - seg0[0])
        np.testing.assert_allclose(w, 0.02, rtol=1e-4)

    def test_binary_strands(self, tmp_path):
        import struct

        from cudatracerlib_tpu.io.hair import load_hair

        pts = [(0, 0, 0), (0, 0, 1), (float("inf"),),
               (1, 0, 0), (1, 0, 1)]
        blob = b"BINARY_HAIR" + struct.pack("<I", 4)
        for t in pts:
            blob += struct.pack(f"<{len(t)}f", *t)
        p = tmp_path / "h.hair"
        p.write_bytes(blob)
        tris = load_hair(str(p), radius=0.01)
        assert tris.shape == (4, 3, 3)
