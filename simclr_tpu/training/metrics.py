"""Host-side metric accumulation + result artifacts (reference C16).

Writes result.json / result_<step>.json / flags.json like run.py:329-353
and tf2/run.py:408-427; streams scalars to a TensorBoard event file when
tensorboardX/tf is available, else to a JSONL log."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


class MetricLogger:
    def __init__(self, model_dir: Optional[str]):
        self.model_dir = model_dir
        self._tb = None
        self._jsonl = None
        if model_dir:
            os.makedirs(model_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter  # cpu torch is in the image

                self._tb = SummaryWriter(log_dir=model_dir)
            except Exception:
                self._jsonl = open(os.path.join(model_dir, "metrics.jsonl"), "a")

    def log(self, step: int, metrics: Dict[str, float]):
        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)
            self._tb.flush()
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, **metrics}) + "\n")
            self._jsonl.flush()
        return metrics

    def log_images(self, step: int, images, tag: str = "image", max_images: int = 3):
        """TensorBoard image summary of the first few inputs
        (tf2/run.py:572-576 parity).  Accepts uint8 or float [0,1] NHWC."""
        if self._tb is None:
            return
        if (hasattr(images, "is_fully_addressable")
                and not images.is_fully_addressable):
            # Multi-process: a global jax.Array spanning other hosts cannot
            # be fetched whole — log this process's local rows (the reference
            # likewise summarizes the per-host batch, tf2/run.py:572-576).
            shards = sorted(images.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            images = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        imgs = np.asarray(jax.device_get(images))[:max_images]
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        imgs = np.clip(imgs, 0.0, 1.0).transpose(0, 3, 1, 2)  # NCHW for torch
        self._tb.add_images(tag, imgs, step)
        self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


def write_result_json(model_dir: str, result: Dict[str, float], step: int):
    """run.py:329-353 artifact contract."""
    # Eval-only runs on non-primary processes: nothing created model_dir yet
    # (Orbax only creates directories on process 0).
    os.makedirs(model_dir, exist_ok=True)
    result = {k: float(v) for k, v in result.items()}
    result["global_step"] = int(step)
    with open(os.path.join(model_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
    with open(os.path.join(model_dir, f"result_{int(step)}.json"), "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
    return result


class Throughput:
    """images/sec tracker for the train loop."""

    def __init__(self):
        self.t0 = None
        self.images = 0

    def update(self, n_images: int):
        now = time.time()
        if self.t0 is None:
            self.t0 = now
            return None
        self.images += n_images
        return self.images / (now - self.t0)
