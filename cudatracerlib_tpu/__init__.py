"""cudatracerlib_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
CudaTracerLib (reference mounted at /root/reference): wavefront Monte-Carlo
rendering with BVH traversal over SoA ray batches, Mitsuba-style
BSDF/light/sensor/medium models as pure differentiable JAX, photon
mapping/bidirectional integrators over sort-based spatial grids, and
multi-chip scaling via jax.sharding — plus end-to-end pixel gradients the
CUDA reference never had.

Layer map (mirrors SURVEY.md §1):
  math/      — vectors, frames, spectrum, warps, MIS, Fresnel, microfacet
  sampling/  — counter-based RNG, sampling records
  scene/     — BSDFs, lights, sensors, textures, media, materials, Scene pytree
  accel/     — BVH build (CPU) + traversal (XLA/Pallas), spatial grids
  ops/       — Pallas TPU kernels for the hot paths
  render/    — integrators (path tracer, wavefront, BDPT, PPM, ...)
  image/     — film, reconstruction filters, tone mapping, denoise
  io/        — OBJ/PLY loaders, Mitsuba XML scenes, image output
  parallel/  — mesh/sharding helpers, multi-host render/train steps
  utils/     — settings, timing, checkpointing
"""

__version__ = "0.1.0"
