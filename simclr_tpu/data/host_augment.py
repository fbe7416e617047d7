"""Host-side augmentation pipeline (--device_augment=false).

The framework's default architecture runs the two-view augmentation on the
TPU (ops/augment.py inside the jitted step); the reference instead runs it
per-example on host CPU inside tf.data (data.py:101-126, tf2/data.py:52-62).
This wrapper reproduces that architecture: the SAME batched JAX augmentation
functions, jit-compiled for the host CPU backend, applied inside the
prefetch thread so host augmentation overlaps device compute.  The train
step then receives pre-augmented float views and skips its augmentation
stage (training/steps.py pre_augmented=True).

Randomness contract: identical to the on-device path — per-step key =
fold_in(fold_in(base_rng, step), 0) with base_rng = PRNGKey(seed + 1)
(training/trainer.py), so a host-augmented run draws the same crops /
jitters / blurs as a device-augmented run of the same config.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

from simclr_tpu.config import Config


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError as e:
        raise RuntimeError(
            "--device_augment=false needs a host CPU backend alongside the "
            f"accelerator, which this JAX install does not expose: {e}"
        ) from e


class HostAugmentPipeline:
    """Wrap a canvas-batch loader; yield augmented float32 view batches.

    Output batches: {'image': float32 (2B, H, W, 3) for pretrain /
    (B, H, W, 3) for finetune, 'label': int32 (B,)} — already augmented,
    no 'valid_hw' (consumed here by the crop sampler).
    """

    def __init__(self, ds, config: Config, base_rng, host_cropped: bool = False):
        self.ds = ds
        self.config = config
        self.base_rng = np.asarray(jax.device_get(base_rng))
        self.start_step = 0
        self._pretrain = config.train_mode == "pretrain"
        h = w = config.image_size
        cpu = _cpu_device()
        cfg = config

        from simclr_tpu.ops import augment

        def aug_pretrain(images, key, valid_hw):
            return augment.two_view_pretrain_batch(
                images, key, h, w,
                color_jitter_strength=cfg.color_jitter_strength,
                use_blur=cfg.use_blur, valid_hw=valid_hw, color_impl="xla",
                host_cropped=host_cropped)

        def aug_finetune(images, key, valid_hw):
            if images.dtype == np.uint8:
                images = images.astype(np.float32) / 255.0
            return augment.preprocess_for_train(
                images, key, h, w, color_jitter_strength=0.0,
                valid_hw=valid_hw, color_impl="xla", crop=not host_cropped)

        fn = aug_pretrain if self._pretrain else aug_finetune
        # Two jit variants: with and without the valid_hw operand (static
        # difference, resolved per batch).
        self._fn_hw = jax.jit(fn, device=cpu)
        self._fn = jax.jit(lambda images, key: fn(images, key, None),
                           device=cpu)

    def set_start_step(self, step: int):
        self.start_step = int(step)
        if hasattr(self.ds, "set_start_step"):
            self.ds.set_start_step(step)

    def __iter__(self) -> Iterator[dict]:
        step = self.start_step
        key0 = jax.device_put(self.base_rng, _cpu_device())
        for batch in self.ds:
            # Same key schedule as the on-device step (steps.py):
            # rng = fold_in(base_rng, step); k_aug = fold_in(rng, 0).
            k_aug = jax.random.fold_in(jax.random.fold_in(key0, step), 0)
            if batch.get("valid_hw") is not None:
                views = self._fn_hw(batch["image"], k_aug, batch["valid_hw"])
            else:
                views = self._fn(batch["image"], k_aug)
            yield {"image": np.asarray(jax.device_get(views)),
                   "label": batch["label"]}
            step += 1
