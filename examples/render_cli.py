#!/usr/bin/env python
"""CLI renderer — counterpart of the reference's `main.cpp` demo app
(CLI: data_path scene.xml n_passes {direct,PT,PT_Wave,BDPT,PPPM}, main.cpp:67).

Usage:
  python examples/render_cli.py SCENE N_PASSES TRACER [--size 512] [--spp 4] \
      [--out out.png] [--set tracer.depth=8 ...]

SCENE: a Mitsuba .xml file, an .obj file, or one of the built-ins
       {cornell, furnace, bigscene}.
TRACER: direct | PT | PT_Spectral | PT_Wave | BDPT | VCM | PPPM | SPPM | guided | LT | fast
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def build_scene(name: str):
    if name == "cornell":
        from cudatracerlib_tpu.scene.shapes import cornell_box

        return cornell_box()
    if name == "furnace":
        from cudatracerlib_tpu.scene.shapes import furnace_scene

        return furnace_scene()
    if name == "bigscene":
        from cudatracerlib_tpu.scene.bigscene import build_big_scene

        return build_big_scene()
    if name.endswith(".xml"):
        from cudatracerlib_tpu.io.mitsuba import load_mitsuba

        return load_mitsuba(name)
    if name.endswith(".obj"):
        from cudatracerlib_tpu.io.obj import load_obj, obj_to_scene_arrays
        from cudatracerlib_tpu.scene import lights as L
        from cudatracerlib_tpu.scene.scene import Materials, build_scene as bs
        from cudatracerlib_tpu.scene.sensors import Camera
        from cudatracerlib_tpu.scene.textures import Textures

        mesh = load_obj(name)
        v, n, uv, mid, mats, texs = obj_to_scene_arrays(mesh)
        center = v.reshape(-1, 3).mean(0)
        ext = np.abs(v.reshape(-1, 3) - center).max()
        cam = Camera.look_at(center + np.array([0, -3 * ext, ext]), center)
        return bs(v, n, uv, mid, Materials.build(mats), Textures.build(texs),
                  [{"type": L.CONSTANT_ENV, "radiance": [1.0, 1.0, 1.0]}], cam)
    raise SystemExit(f"unknown scene {name!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("passes", type=int)
    ap.add_argument("tracer", choices=["direct", "PT", "PT_Wave", "BDPT", "VCM",
                                       "PPPM", "SPPM", "guided", "LT", "fast",
                                       "PT_Spectral"])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--filter", default="box",
                    choices=["box", "gaussian", "mitchell", "lanczos",
                             "triangle"],
                    help="reconstruction filter applied at accumulation "
                         "time (filter-importance splatting)")
    ap.add_argument("--filter-radius", type=float, default=1.5)
    ap.add_argument("--checkpoint", default=None,
                    help="npz path for restartable accumulation")
    args = ap.parse_args()

    from cudatracerlib_tpu.io.image_io import write_png
    from cudatracerlib_tpu.render.path_tracer import PTConfig
    from cudatracerlib_tpu.utils.timing import GLOBAL_TIMER

    scene = build_scene(args.scene)
    W = H = args.size
    filt = ["box", "gaussian", "mitchell", "lanczos", "triangle"].index(args.filter)
    cfg = PTConfig(max_depth=1 if args.tracer == "direct" else args.depth,
                   rec_filter=filt, rec_radius=args.filter_radius)

    acc = np.zeros((H, W, 3), np.float32)
    start_pass = 0
    if args.checkpoint:
        import os

        if os.path.exists(args.checkpoint):
            z = np.load(args.checkpoint)
            acc, start_pass = z["acc"], int(z["n"])
            print(f"resumed at pass {start_pass}")

    sppm_state = None
    guiding = None
    if args.tracer == "guided":
        from cudatracerlib_tpu.render.guided import make_guiding, train_guiding

        guiding = make_guiding(scene, res=8)
        for i in range(3):
            guiding = train_guiding(scene, guiding, 1 << 15, i, cfg)
        print("guiding trained (3 photon batches)")

    for p in range(start_pass, args.passes):
        t0 = time.perf_counter()
        with GLOBAL_TIMER.measure("pass"):
            if args.tracer in ("direct", "PT"):
                from cudatracerlib_tpu.render.path_tracer import render

                img = render(scene, W, H, args.spp, p, cfg)
            elif args.tracer == "PT_Spectral":
                from cudatracerlib_tpu.render.spectral import render_spectral

                img = render_spectral(scene, W, H, args.spp, p, cfg)
            elif args.tracer == "PT_Wave":
                from cudatracerlib_tpu.render.wavefront import render_wavefront

                img = render_wavefront(scene, W, H, args.spp, p, cfg)
            elif args.tracer == "BDPT":
                from cudatracerlib_tpu.render.bdpt import BDPTConfig, render_bdpt

                img = render_bdpt(scene, W, H, args.spp, p, BDPTConfig(base=cfg))
            elif args.tracer == "VCM":
                from cudatracerlib_tpu.render.vcm import VCMConfig, render_vcm

                img = render_vcm(scene, W, H, args.spp, p, p, VCMConfig(base=cfg))
            elif args.tracer == "PPPM":
                from cudatracerlib_tpu.render.ppm import PPMConfig, render_ppm_pass

                img = render_ppm_pass(scene, W, H, args.spp, p, p, PPMConfig(base=cfg))
            elif args.tracer == "SPPM":
                from cudatracerlib_tpu.render.sppm import (SPPMConfig,
                                                           render_sppm_pass)

                img, sppm_state = render_sppm_pass(
                    scene, W, H, p, sppm_state, SPPMConfig(base=cfg))
            elif args.tracer == "guided":
                from cudatracerlib_tpu.render.guided import render_guided

                img = render_guided(scene, guiding, W, H, args.spp, p, cfg)
            elif args.tracer == "LT":
                from cudatracerlib_tpu.render.light_tracer import render_light_trace

                img = render_light_trace(scene, W, H, W * H * args.spp, p, cfg)
            else:
                from cudatracerlib_tpu.render.realtime import render_fast

                img, _ = render_fast(scene, W, H, p)
            img = np.asarray(img)
        if args.tracer == "SPPM":
            acc = img  # SPPM develops its own running estimate
        else:
            acc += (img - acc) / (p + 1)
        dt = time.perf_counter() - t0
        rays = W * H * args.spp * cfg.max_depth * 2
        print(f"pass {p + 1}/{args.passes}: {dt * 1e3:.0f} ms "
              f"(~{rays / dt / 1e6:.1f} Mrays/s)", flush=True)
        if args.checkpoint and (p + 1) % 8 == 0:
            np.savez(args.checkpoint, acc=acc, n=p + 1)

    write_png(args.out, np.clip(acc, 0, 1))
    print(f"wrote {args.out}")
    print(GLOBAL_TIMER.report())


if __name__ == "__main__":
    main()
