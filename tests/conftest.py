"""Test config: run JAX on a virtual 8-device CPU platform so multi-chip
sharding (DP over a mesh) is exercised without real TPU hardware.

Note: the env-var route (JAX_PLATFORMS) is ignored by the experimental 'axon'
TPU plugin in this image, so we set the config programmatically before any
backend is initialized.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.device_count() == 8, jax.devices()
