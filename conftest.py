# Root conftest: configure JAX for multi-device CPU testing BEFORE jax is imported.
#
# Tests run on a virtual 8-device CPU mesh (the TPU-pod stand-in), mirroring the
# multi-config CI strategy of the reference (.github/workflows/test.yml runs the
# suite once per arithmetic backend; we run once with an 8-device mesh so the
# sharded paths are exercised without a pod).
import os
import resource
import sys

# Raise the stack ceiling BEFORE the jax import/backend init below: XLA's
# worker threads capture the rlimit at creation, and its recursive graph
# passes overflow the default 8MB on the fully-fused field pipelines
# (see kzg_tpu.utils.jaxcache.raise_stack_limit).
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != _hard:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):
        pass

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

# Persistent compilation cache: the suite is compile-dominated (hundreds of
# distinct static shapes); caching XLA executables across pytest runs cuts
# repeat wall-clock by an order of magnitude. The cache dir is scoped per
# machine fingerprint (XLA:CPU AOT entries are microarch-specific).
#
# MUST run before the first backend touch (the default_backend() assert
# below): enable_compilation_cache pins --xla_cpu_max_isa=AVX2, and a
# client created before the pin compiles AOT entries with
# +prefer-no-scatter/-gather pseudo-features that the loader rejects
# against raw host CPUID forever after — every suite run then both
# poisons the cache and runs fully cold (round-4 regression of the
# round-1 dryrun-timeout failure mode).
sys.path.insert(0, os.path.dirname(__file__))

from kzg_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

assert jax.default_backend() == "cpu"
