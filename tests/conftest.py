"""Test configuration: force an 8-device virtual CPU platform so sharding
and collective behavior (sync-BN, global NT-Xent, pjit train step) can be
validated without TPU hardware (SURVEY.md §4 test plan).

Note: this environment's axon TPU plugin overrides the JAX_PLATFORMS env
var at import time, so the platform must be forced through jax.config
*after* importing jax (verified: env-var route yields the TPU anyway)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
