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

# Persistent compilation cache: the suite is compile-dominated on the
# 1-CPU CI box (slow tier ~19 min, nearly all jit compiles of the same
# programs every run). Repo-local dir (gitignored) so warm runs skip
# straight to execution; a cold run just fills it.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
