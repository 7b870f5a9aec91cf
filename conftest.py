# Root conftest: configure JAX for multi-device CPU testing BEFORE jax is imported.
#
# Tests run on a virtual 8-device CPU mesh (the TPU-pod stand-in), mirroring the
# multi-config CI strategy of the reference (.github/workflows/test.yml runs the
# suite once per arithmetic backend; we run once with an 8-device mesh so the
# sharded paths are exercised without a pod).
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pre-register a TPU plugin at interpreter start (before
# this file runs) with JAX_PLATFORMS already pointing at it, so setting the
# env var alone is not enough — force the platform through the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

# Persistent compilation cache: the suite is compile-dominated (hundreds of
# distinct static shapes); caching XLA executables across pytest runs cuts
# repeat wall-clock by an order of magnitude.
_cache_dir = os.path.join(os.path.dirname(__file__), ".cache", "jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(__file__))
