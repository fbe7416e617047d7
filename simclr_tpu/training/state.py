"""Train state pytree."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray          # scalar int32 global step
    params: Any                # model parameters (fp32)
    batch_stats: Any           # BN moving statistics (fp32)
    opt_state: Any             # optax state (momentum slots, schedule count)
