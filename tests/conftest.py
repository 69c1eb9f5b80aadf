"""Test config: run everything on CPU with 8 virtual devices.

Mirrors SURVEY.md §4's test-pyramid plan — CI needs no TPU; multi-chip
sharding logic is exercised against a virtual 8-device host mesh.

Note: this environment pre-registers a remote TPU backend at interpreter
startup, so the JAX_PLATFORMS env var alone is not enough — we must also
flip the config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
