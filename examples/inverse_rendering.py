#!/usr/bin/env python
"""Inverse rendering demo: recover wall albedos + light radiance from a target.

The capability the CUDA reference never had (its PathLib/ hand-rolled path
derivatives served a single perturbation strategy; here the whole renderer is
differentiable). Optimizes texture colors and light emission by gradient
descent on an L2 image loss, optionally sharded over every available chip.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cudatracerlib_tpu.render.path_tracer import PTConfig, render
    from cudatracerlib_tpu.scene.shapes import cornell_box

    W = H = 64
    cfg = PTConfig(max_depth=4, rr_start=99)

    # ground truth: the canonical Cornell box
    target_scene = cornell_box()
    target = render(target_scene, W, H, 8, 0, cfg)

    # start: gray walls, dim light
    scene = cornell_box(
        light_radiance=(5.0, 5.0, 5.0),
        white=(0.5, 0.5, 0.5), red=(0.5, 0.5, 0.5), green=(0.5, 0.5, 0.5),
    )

    def loss_fn(params, seed):
        color_a, radiance = params
        s = scene._replace(
            textures=scene.textures._replace(color_a=jnp.clip(color_a, 0.0, 1.0)),
            lights=scene.lights._replace(radiance=jnp.abs(radiance)),
        )
        img = render(s, W, H, 8, seed, cfg)
        return jnp.mean((img - target) ** 2)

    params = (scene.textures.color_a, scene.lights.radiance)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    lr_tex, lr_light = 0.4, 4.0
    t0 = time.time()
    for step in range(60):
        loss, g = grad_fn(params, jnp.uint32(step + 1))
        params = (
            params[0] - lr_tex * g[0],
            params[1] - lr_light * g[1],
        )
        if step % 10 == 0:
            print(f"step {step:3d}: loss {float(loss):.6f}", flush=True)

    print(f"optimized in {time.time() - t0:.1f}s")
    ca = np.clip(np.asarray(params[0]), 0, 1)
    print("recovered white wall:", ca[0], "(true ~0.725,0.71,0.68)")
    print("recovered red wall:  ", ca[1], "(true ~0.63,0.065,0.05)")
    print("recovered radiance:  ", np.asarray(params[1])[0],
          "(true 17,12,4)")
    err = abs(ca[1][0] - 0.63)
    print("red-channel error:", err)
    return err


if __name__ == "__main__":
    main()
