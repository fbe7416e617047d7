"""Configuration system for simclr_tpu.

Mirrors the reference CLI flag surface (names + defaults + semantics of
/root/reference/run.py:42-245 and /root/reference/tf2/run.py:37-238) as a
typed dataclass instead of a global absl.flags bus.  Every module receives
the config explicitly — no global state — which keeps the training step a
pure function of (config, state, batch, rng) and therefore jit/pjit
friendly.

Flag-name parity lets users of the reference bring their launch commands
unchanged:  ``python -m simclr_tpu.run --train_mode=pretrain --dataset=...``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional


def _field(default, help_: str = ""):
    return dataclasses.field(default=default, metadata={"help": help_})


@dataclasses.dataclass
class Config:
    """All training/eval options.

    Field names match the reference flags one-to-one where a reference flag
    exists (see run.py:42-245 / tf2/run.py:37-238).  TPU-native additions are
    grouped at the bottom and default to values that reproduce reference
    behavior.
    """

    # --- optimization -----------------------------------------------------
    learning_rate: float = _field(0.3, "Initial learning rate per batch size of 256.")
    learning_rate_scaling: str = _field("linear", "How to scale LR by batch size: linear | sqrt.")
    warmup_epochs: float = _field(10.0, "Number of epochs of linear warmup.")
    weight_decay: float = _field(1e-6, "Weight decay coefficient (tf2 default 1e-6; tf1 used 1e-4).")
    batch_norm_decay: float = _field(0.9, "Batch-norm moving-average momentum.")
    optimizer: str = _field("lars", "Optimizer: momentum | adam | lars.")
    momentum: float = _field(0.9, "Momentum parameter.")

    # --- batching / steps -------------------------------------------------
    train_batch_size: int = _field(512, "Global batch size for training.")
    train_split: str = _field("train", "Dataset split for training.")
    train_epochs: int = _field(100, "Number of training epochs.")
    train_steps: int = _field(0, "Number of steps (overrides train_epochs when > 0).")
    eval_steps: int = _field(0, "Number of eval steps (0 = full eval split).")
    eval_batch_size: int = _field(256, "Global batch size for eval.")
    checkpoint_epochs: int = _field(1, "Checkpoint every this many epochs.")
    checkpoint_steps: int = _field(0, "Checkpoint every this many steps (overrides epochs when > 0).")
    eval_split: str = _field("validation", "Dataset split for eval.")
    eval_dataset: Optional[str] = _field(None, "Separate eval source (default: --dataset). For npz sources the whole file is the eval set (no 90/10 auto-split) — how tools/real_data_acceptance.py feeds a real held-out test split.")

    # --- dataset ----------------------------------------------------------
    dataset: str = _field("imagenet2012", "Dataset name (tfds name, 'cifar10', or 'synthetic').")
    data_dir: Optional[str] = _field(None, "Directory for dataset files.")
    cache_dataset: bool = _field(False, "Cache the entire (pre-augmentation) dataset in memory.")
    image_size: int = _field(224, "Input image side length.")
    color_jitter_strength: float = _field(1.0, "Color jitter strength multiplier.")
    use_blur: bool = _field(True, "Gaussian-blur augmentation during pretraining.")

    # --- mode -------------------------------------------------------------
    mode: str = _field("train", "train | eval | train_then_eval.")
    train_mode: str = _field("pretrain", "pretrain | finetune.")
    lineareval_while_pretraining: bool = _field(True, "Train supervised head on stop-grad features during pretraining.")

    # --- checkpointing / surgery -------------------------------------------
    checkpoint: Optional[str] = _field(None, "Checkpoint to warm-start from (model weights only).")
    variable_schema: str = _field(r"?!global_step", "Regex over variable names selecting what to restore on warm-start.")
    zero_init_logits_layer: bool = _field(False, "Zero-init the supervised head when warm-starting.")
    fine_tune_after_block: int = _field(-1, "Freeze encoder up to and incl. this block group (-1 = train all; 4 = linear eval).")
    keep_checkpoint_max: int = _field(5, "Maximum checkpoints to keep.")
    keep_hub_module_max: int = _field(1, "Maximum exported serving modules to keep.")
    export_tf_savedmodel: bool = _field(False, "Also convert each serving bundle to a TF SavedModel (two signatures: frozen-stats + train-mode BN, reference tf2/run.py:241-305) via jax2tf; requires tensorflow importable.")
    export_stablehlo: bool = _field(False, "Also serialize each serving bundle's inference graph to a portable StableHLO artifact (jax.export, symbolic batch dim, CPU+TPU lowerings) for XLA-native serving stacks.")
    model_dir: Optional[str] = _field(None, "Model directory for checkpoints / summaries / results.")
    eval_name: Optional[str] = _field(None, "Name for this eval; namespaces the eval summary folder (model_dir/eval_<name>), like estimator.evaluate(name=...).")

    # --- objective --------------------------------------------------------
    temperature: float = _field(0.1, "NT-Xent temperature.")
    hidden_norm: bool = _field(True, "L2-normalize embeddings before the contrastive loss.")

    # --- heads ------------------------------------------------------------
    proj_head_mode: str = _field("nonlinear", "none | linear | nonlinear.")
    proj_out_dim: int = _field(128, "Projection head output dimension.")
    num_proj_layers: int = _field(3, "Number of layers in the nonlinear projection head.")
    ft_proj_selector: int = _field(0, "Which projection-head layer output to fine-tune from (0 = encoder output, -1 = final).")

    # --- encoder ----------------------------------------------------------
    resnet_depth: int = _field(50, "ResNet depth: 18 | 34 | 50 | 101 | 152 | 200.")
    width_multiplier: int = _field(1, "ResNet width multiplier.")
    global_bn: bool = _field(True, "Aggregate batch-norm statistics across replicas.")
    sk_ratio: float = _field(0.0, "Selective-kernel mid-channel ratio (0.0625 recommended when > 0).")
    se_ratio: float = _field(0.0, "Squeeze-excite ratio (0 = off).")

    # --- misc reference flags (accepted for CLI parity) --------------------
    use_tpu: bool = _field(True, "Unused placeholder (reference TPU flag); devices come from jax.")
    tpu_name: Optional[str] = _field(None, "Unused placeholder (cluster resolution is via jax.distributed).")
    tpu_zone: Optional[str] = _field(None, "Unused placeholder.")
    gcp_project: Optional[str] = _field(None, "Unused placeholder.")
    master: Optional[str] = _field(None, "Unused placeholder.")
    train_summary_steps: int = _field(100, "Record metrics every this many steps.")

    # --- TPU-native additions ---------------------------------------------
    compute_dtype: str = _field("bfloat16", "Activation/matmul dtype on the MXU: bfloat16 | float32.")
    mesh_shape: Optional[str] = _field(None, "Device mesh, e.g. '8' or '4,2' for (data, model); default = all devices on data. With a 'model' axis, large parameters are tensor-parallel: their output-channel dim is sharded over it (Megatron-style weight-stationary TP; XLA inserts the activation collectives).")
    spatial_partition: int = _field(1, "Shard the image HEIGHT dimension of the conv tower this many ways over a 'spatial' mesh axis (XLA GSPMD inserts conv halo exchanges automatically). Lets per-chip batch 1 of very large inputs span multiple chips; devices = data_parallel x spatial_partition.")
    dcn_data_parallelism: int = _field(1, "Number of TPU slices data-parallel over DCN (>1 builds a hybrid ('dcn','data') mesh; collectives reduce hierarchically, heavy traffic stays on ICI).")
    fsdp: bool = _field(False, "Shard parameters/optimizer state across the data axis (ZeRO-style).")
    device_augment: bool = _field(True, "Run the augmentation stack on device (batched, default) or, when false, on the host CPU inside the prefetch thread (the reference's tf.data architecture; same draws, see data/host_augment.py). Host mode requires the GSPMD path (not --use_shard_map).")
    host_crop_full_res: bool = _field(True, "For streaming (tfds) train sources: sample + resample the distorted crop on host at ORIGINAL image resolution (reference data_util.py:252-325 pixel fidelity; device applies flip/color/blur only). When false, the device samples crops from the <=256px letterboxed canvas — cheaper on host, ~6x less source detail for large photos.")
    input_pipeline: str = _field("python", "Host batching backend for array/npz/synthetic sources: python | native (C++ threaded) | grain.")
    use_fused_ntxent: str = _field("auto", "Streaming Pallas NT-Xent (fwd+bwd+metrics; no (2N)^2 logits in HBM); ~13x closer to the f64 gradient than the dense XLA path. 'auto' (default) enables it exactly where the measured ladder says it wins: when the per-device island tile (2N/n_devices x 2N) reaches ~16M logits (1.16-2.22x there; parity below — tools/exp_ntxent_island.py). Runs on every path — single chip, shard_map, and multi-device GSPMD (via a shard_map island over the mesh batch axes). true/false force it.")
    use_shard_map: bool = _field(False, "Explicit-SPMD train step via shard_map (required for per-replica BN, i.e. global_bn=False, on multi-device).")
    fused_bn: bool = _field(True, "Fused-VJP batch norm (one reduction pass fwd, one bwd; ops/fused_bn.py). Numerically equivalent to the flax/autodiff path; set false to fall back.")
    remat_until_block: int = _field(0, "Rematerialise (activation-checkpoint) block groups [0, N): recompute their activations in the backward pass instead of storing them. Use 2-4 for big models (R152 3x+SK) or large per-chip batches.")
    steps_per_loop: int = _field(0, "Device steps per host loop iteration (0 = checkpoint cadence, capped by loop_staging_budget_mb).")
    loop_staging_budget_mb: int = _field(1024, "HBM budget for raw input batches staged per device-loop dispatch; steps_per_loop is capped so spl x batch bytes fits (large-batch configs degrade to per-step async dispatch).")
    compilation_cache_dir: Optional[str] = _field(None, "Persistent XLA compilation cache directory (shared across runs/processes). First compile of the R50 step costs 20-40s per process; with a warm cache restarts, preemption resumes, and multi-host bring-up skip it entirely. Every jit is cached (even tiny ones), so a long-lived shared directory accumulates entries; growth is bounded by LRU eviction at --compilation_cache_max_size_mb. Unset = no persistent cache.")
    compilation_cache_max_size_mb: int = _field(4096, "LRU size bound (MB) for --compilation_cache_dir; oldest entries are evicted past it.")
    seed: int = _field(0, "PRNG seed.")
    num_images_default: int = _field(0, "Override number of train images when dataset metadata is unavailable.")

    # ----------------------------------------------------------------------
    def __post_init__(self):
        # Every framework branch tests equality against one of the known
        # values; an out-of-domain string would silently fall into the
        # "else" paths (e.g. finetune-like view counts), so reject it here.
        if self.train_mode not in ("pretrain", "finetune"):
            raise ValueError(
                f"train_mode must be 'pretrain' or 'finetune', got {self.train_mode!r}")
        if self.mode not in ("train", "eval", "train_then_eval"):
            raise ValueError(
                f"mode must be train | eval | train_then_eval, got {self.mode!r}")

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, model_dir: str, name: str = "flags.json") -> str:
        """Serialize config like the reference's flags.json (run.py:337-353)."""
        os.makedirs(model_dir, exist_ok=True)
        path = os.path.join(model_dir, name)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)
        return path

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "1"):
        return True
    if v.lower() in ("no", "false", "f", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="simclr_tpu", description="TPU-native SimCLR v1/v2 training."
    )
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        help_ = f.metadata.get("help", "")
        default = f.default
        if f.type in ("bool", bool):
            parser.add_argument(name, type=_str2bool, default=default, help=help_)
        elif f.type in ("int", int):
            parser.add_argument(name, type=int, default=default, help=help_)
        elif f.type in ("float", float):
            parser.add_argument(name, type=float, default=default, help=help_)
        else:
            parser.add_argument(name, type=str, default=default, help=help_)
    return parser


def parse_flags(argv: Optional[list] = None) -> Config:
    ns = build_parser().parse_args(argv)
    return Config(**vars(ns))


def resolve_use_fused_ntxent(config: Config, n_devices: int) -> bool:
    """Resolve the tri-state --use_fused_ntxent to a bool for step building.

    ``n_devices`` is the number of BATCH shards (parallel.mesh
    num_batch_shards) — the island shards its rows over the batch axes
    only, so a model/spatial mesh axis does not shrink the tile.

    'auto' is keyed to the SHARDED tile the kernel actually computes: each
    device's island sees a (2N/n_devices, 2N) logits block, and the
    measured ladder (tools/exp_ntxent_island.py, v5e 2026-08-19: fwd+bwd,
    rows x cols grid) shows the streaming kernel beats the dense row-block
    math only once that tile reaches ~16M logits — >=1.11x from 16.8M
    (1.16x at 4096x4096, 1.9x at 4096x8192, 2.22x at 4096x16384) and
    parity/noise below (0.96-1.04x; one dense win at 1024x8192).  The r2
    gate used the global batch alone (2N >= 8192), which would enable the
    kernel at the reference's 32-chip flagship where its per-shard tile is
    only 256 x 8192 = 2M — a measured-parity regime.  Available on every
    execution path: single device, the shard_map step, and multi-device
    GSPMD via the shard_map island
    (ops/ntxent_pallas.py::ntxent_fused_metrics_gspmd).  Explicit
    true/false force the choice.
    """
    v = config.use_fused_ntxent
    if isinstance(v, str):
        if v.lower() == "auto":
            rows_global = 2 * config.train_batch_size
            rows_local = rows_global // max(1, n_devices)
            return rows_local * rows_global >= 1 << 24
        v = _str2bool(v)
    return bool(v)


def get_train_steps(config: Config, num_train_examples: int) -> int:
    """run.py semantics: train_steps overrides epochs when set."""
    if config.train_steps > 0:
        return config.train_steps
    return config.train_epochs * num_train_examples // config.train_batch_size + 1


def get_checkpoint_steps(config: Config, num_train_examples: int) -> int:
    if config.checkpoint_steps > 0:
        return config.checkpoint_steps
    return max(1, config.checkpoint_epochs * num_train_examples // config.train_batch_size)
