"""Test env: force CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the TPU-world equivalent of multi-node tests).

Note: this environment's site hooks rewrite JAX_PLATFORMS to prefer the
tunneled TPU ('axon'), so env vars alone are not enough — we must update
jax.config after import, before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
