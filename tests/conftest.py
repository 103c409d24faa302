"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the standard JAX recipe of
--xla_force_host_platform_device_count (SURVEY.md §4); the real-TPU path is
exercised by bench.py / the driver instead.

Note: the environment's sitecustomize imports jax at interpreter startup (with
JAX_PLATFORMS=axon), so plain env assignment here is too late — we must go
through jax.config. XLA_FLAGS still works because backends initialize lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
