"""Test config: run JAX on a virtual 8-device CPU platform so multi-chip
sharding (DP over a mesh) is exercised without real TPU hardware.

Note: the env-var route (JAX_PLATFORMS) is ignored by the experimental 'axon'
TPU plugin in this image, so we set the config programmatically before any
backend is initialized.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

# XLA's in-process CPU collectives abort the whole pytest process if any
# participant misses a rendezvous by 40s — routine on this 1-core host when
# the 8 device threads timeslice through sharded-step collectives (and fatal
# under any concurrent load). Raise the timeout before jax initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        + " --xla_cpu_collective_timeout_seconds=7200").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.device_count() == 8, jax.devices()
