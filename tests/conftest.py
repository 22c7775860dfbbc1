"""Test configuration: force an 8-device virtual CPU backend.

The standard JAX trick for testing multi-device sharding without hardware
(SURVEY.md §4): all tests run on CPU with 8 fake devices so mesh/pjit paths are
exercised for real. The TPU bench path is covered by bench.py on hardware.

Note: this environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (a tunneled TPU), so plain env vars are too late — we must go
through jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
