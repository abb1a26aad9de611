"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md section 4 test strategy, item d).

Note: this environment pins JAX_PLATFORMS=axon (TPU tunnel); the env var
cannot be overridden after plugin registration, but jax.config can.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
