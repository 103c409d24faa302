"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the standard JAX recipe of
--xla_force_host_platform_device_count (SURVEY.md §4); the real-TPU path is
exercised by bench.py / the driver instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
