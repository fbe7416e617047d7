"""ImageNet 1%/10% semi-supervised subsets (reference C18).

The reference ships the subset image-ID lists as
``imagenet_subsets/{1,10}percent.txt`` (12,811 / 128,116 JPEG file names)
and consumes them through the ``imagenet2012_subset/{1,10}pct`` TFDS
builders (README.md:150-152).  This module vendors those ID lists
(gzipped) and provides the filter-by-ID mechanism so the subsets can be
constructed from any source that carries per-example file names — the
plain ``imagenet2012`` TFDS builder (whose examples include ``file_name``)
or an npz archive with an ``ids`` array — without requiring the dedicated
subset builder.

Also provides the README.md:157-167 semi-supervised fine-tuning recipe as
a config preset.
"""

from __future__ import annotations

import gzip
import os
from typing import FrozenSet, Iterable

import numpy as np

_SUBSET_DIR = os.path.join(os.path.dirname(__file__), "imagenet_subsets")
_FILES = {1: "1percent.txt.gz", 10: "10percent.txt.gz"}
_EXPECTED_COUNTS = {1: 12811, 10: 128116}


def load_subset_ids(pct: int) -> FrozenSet[str]:
    """Load the vendored image-ID list for the 1% or 10% subset."""
    if pct not in _FILES:
        raise ValueError(f"pct must be 1 or 10, got {pct}")
    path = os.path.join(_SUBSET_DIR, _FILES[pct])
    with gzip.open(path, "rt") as f:
        ids = frozenset(line.strip() for line in f if line.strip())
    assert len(ids) == _EXPECTED_COUNTS[pct], (len(ids), _EXPECTED_COUNTS[pct])
    return ids


def subset_mask(ids: Iterable[str], subset: FrozenSet[str]) -> np.ndarray:
    """Boolean mask selecting examples whose file-name ID is in the subset.

    IDs may be bytes or str and may carry directory prefixes (the TFDS
    ``file_name`` feature is the bare JPEG name; some archives store
    ``train/n.../n..._123.JPEG``) — only the basename is compared."""
    ids = list(ids)
    out = np.empty(len(ids), dtype=bool)
    for i, raw in enumerate(ids):
        name = raw.decode() if isinstance(raw, bytes) else str(raw)
        out[i] = os.path.basename(name) in subset
    return out


def parse_subset_pct(dataset_name: str):
    """Return 1 / 10 for 'imagenet2012_subset/{1,10}pct' names, else None."""
    name = dataset_name.removeprefix("tfds:")
    if name == "imagenet2012_subset/1pct":
        return 1
    if name == "imagenet2012_subset/10pct":
        return 10
    return None


def semi_supervised_finetune_config(base, pct: int = 1):
    """The README.md:157-167 fine-tune-the-whole-network recipe for the
    1%/10% labeled subsets, as overrides on ``base`` (a Config)."""
    return base.replace(
        mode="train_then_eval",
        train_mode="finetune",
        fine_tune_after_block=-1,
        zero_init_logits_layer=True,
        variable_schema=r"(?!global_step|(?:.*/|^)Momentum|head_supervised)",
        global_bn=True,
        optimizer="lars",
        learning_rate=0.005,
        learning_rate_scaling="sqrt",
        weight_decay=0.0,
        train_epochs=60,
        train_batch_size=1024,
        warmup_epochs=0,
        dataset=f"imagenet2012_subset/{pct}pct",
        image_size=224,
        eval_split="validation",
        num_proj_layers=3,
        ft_proj_selector=1,
    )
