"""Worker process for tests/test_multihost.py (not a pytest module).

Runs the sharded render / train step / photon pass on a multi-PROCESS CPU
runtime (jax.distributed + Gloo) and saves process-0's results as .npy for
the parent test to compare against single-process execution.

Usage: python multihost_worker.py <out_dir> <process_id> <num_processes>
           <devices_per_proc> <coordinator>
"""
import os
import sys

out_dir, pid, nproc, dpp, coord = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={dpp}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudatracerlib_tpu.parallel.distributed import (host_mesh,  # noqa: E402
                                                    init_distributed)

init_distributed(coordinator_address=coord, num_processes=nproc,
                 process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cudatracerlib_tpu.parallel.shard import (make_sharded_render,  # noqa: E402
                                              make_train_step,
                                              replicate_scene)
from cudatracerlib_tpu.render.path_tracer import PTConfig, render  # noqa: E402
from cudatracerlib_tpu.scene.shapes import cornell_box  # noqa: E402

W = H = 32
CFG = PTConfig(max_depth=3, rr_start=99)

mesh = host_mesh(n_sp=1)
scene = replicate_scene(cornell_box(), mesh)

# 1) sharded render over the global (multi-process) mesh
fn = make_sharded_render(mesh, W, H, 4, CFG)
img = np.asarray(fn(scene, jnp.uint32(3)))

# 2) sharded differentiable train step (gradient all-reduce across processes)
target = np.asarray(render(cornell_box(), W, H, 4, 77, CFG))
step = make_train_step(mesh, W, H, 4, jnp.asarray(target), lr=0.2, config=CFG)
s = scene
losses = []
for i in range(3):
    s, loss = step(s, jnp.uint32(10 + i))
    losses.append(float(loss))

if jax.process_index() == 0:
    np.save(os.path.join(out_dir, "img.npy"), img)
    np.save(os.path.join(out_dir, "losses.npy"), np.asarray(losses))
    print("WORKER_OK", flush=True)
