"""simclr_tpu — a TPU-native SimCLR v1/v2 framework (JAX/XLA/Pallas/pjit).

Brand-new re-design of google-research/simclr for TPU hardware: GSPMD
sharding over a jax Mesh, bfloat16 MXU compute, on-device batched
augmentation, optax LARS, and Orbax checkpointing.
"""

__version__ = "0.1.0"

from simclr_tpu.config import Config  # noqa: F401
