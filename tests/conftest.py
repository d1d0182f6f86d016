"""Test configuration: run JAX on CPU with 8 virtual devices.

This is the TPU-world "fake backend" for multi-device tests (SURVEY.md §4):
sharding/pjit paths compile and execute on an 8-device CPU mesh exactly as
they would over an 8-chip ICI mesh.

Must run before the first `import jax` anywhere in the test process.
"""

import os
import sys

# Force CPU even if the ambient env selects a TPU platform: unit tests need
# the 8-virtual-device mesh and fp32-exact numerics. TPU-hardware benchmarks
# live in bench.py, not the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Plugins (e.g. jaxtyping's pytest hook) may import jax before this conftest
# runs, freezing the env-var read; the config update below still wins because
# XLA backends initialize lazily on first device use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
