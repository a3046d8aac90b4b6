"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware in this environment is a single chip; multi-chip sharding
paths are validated on virtual CPU devices exactly as the driver's
``dryrun_multichip`` does.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU even if jax was imported (by a pytest plugin) before this
# conftest ran — the env var alone is too late in that case.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
