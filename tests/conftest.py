"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Torch-parity tests need exact f32 convs/matmuls, not the fast low-precision
# CPU path. Production code keeps the fast default.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: repeat test runs skip XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
