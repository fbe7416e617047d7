"""Test configuration: force an 8-device virtual CPU platform so sharding
and collective behavior (sync-BN, global NT-Xent, pjit train step) can be
validated without TPU hardware (SURVEY.md §4 test plan)."""

import os

# Must be set before jax imports anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
