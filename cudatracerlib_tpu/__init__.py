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

# Persistent XLA compilation cache: renderer programs are large (the cluster
# kernel + bounce scan compiles in minutes); caching across processes makes
# CLI runs, benchmarks, and test reruns start in seconds. Counterpart of the
# reference's compiled-binary caches for meshes/textures, applied to code.
import os as _os


def _enable_compilation_cache():
    try:
        import jax as _jax

        cache_dir = _os.environ.get(
            "CUDATRACERLIB_TPU_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "cudatracerlib_tpu_xla"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        pass


_enable_compilation_cache()
