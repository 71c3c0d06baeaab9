"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set the env vars before jax is imported anywhere — this is the TPU-native
answer to "test multi-chip without a cluster" (SURVEY.md section 4).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Force CPU: the machine presets JAX_PLATFORMS (a TPU plugin) AND imports jax
# from sitecustomize before conftest runs, so env vars alone are too late —
# the config must be updated directly. Set PGT_TEST_TPU=1 to run the suite on
# the real accelerator instead.
if os.environ.get("PGT_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pin the flash kernels' f32 path to full-f32 multiplies: the equality
# tests compare against TRUE-f32 jnp references on CPU. (This matches the
# shipped default; the opt-in bf16-operand mode has its own dedicated
# tolerance test in test_kernels.py.)
os.environ.setdefault("PGT_FLASH_PRECISION", "highest")
