"""Test configuration: force CPU JAX with 8 virtual devices so sharding
tests run everywhere.

Note: in this environment a TPU platform plugin may override the
JAX_PLATFORMS env var, so we also force the platform via jax.config (which
wins as long as the backend is not yet initialized)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# An explicit JAX_PLATFORMS='' means "use the real backend" (the documented
# way to run tests/test_tpu_kernels.py on TPU); anything else forces CPU.
if os.environ.get("JAX_PLATFORMS", "cpu") != "":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


# Persistent compilation cache for the CPU test backend (round 5): the
# fast tier is compile-bound on a small machine (~20 min cold on 1 core),
# and XLA:CPU executables cache exactly like TPU ones.  A separate dir
# from the TPU .jax_cache keeps the two backends' entries apart.  Repeat
# runs of unchanged tests then skip nearly all compilation; the cold
# number stays the honest tier cost (README).
try:
    from fluidsimulation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_cpu")
    )
except Exception:
    pass

# The `slow` marker is registered once, in pyproject.toml
# [tool.pytest.ini_options] — no duplicate registration here.
