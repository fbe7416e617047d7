"""Host-side data layer: minimal decode/batch on CPU, augmentation on TPU.

Re-design of reference data.py / tf2/data.py (:31-165, :37-115).  The
reference runs the whole augmentation stack per-example on host CPU inside
tf.data; the TPU-native split here is:

  host:   storage -> decode -> (fixed-size canvas) -> shuffle -> batch uint8
  device: two-view crop/jitter/blur stack (ops/augment.py), fused by XLA

Backends:
  * ``synthetic``  — deterministic random tensors (tests / benchmarks; the
    environment has no dataset archives).
  * ``tfds:...`` or known tfds names — used when tensorflow_datasets is
    importable and data is present (the reference's source, run.py:372-376);
    includes the imagenet2012_subset/{1,10}pct semi-supervised splits (C18).
  * ``npz:/path`` — local arrays {'images': uint8 (N,H,W,C), 'labels': int}.

Iterators yield {'image': uint8 (B, H0, W0, C), 'label': int32 (B,)} with a
fixed per-epoch reshuffle, sharded by host when running multi-process.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from simclr_tpu.config import Config


@dataclasses.dataclass
class DatasetInfo:
    num_train_examples: int
    num_eval_examples: int
    num_classes: int
    image_shape: Tuple[int, int, int]  # host canvas shape (pre device-augment)
    # Eval images were already center-cropped at original resolution on the
    # host (variable-size sources); the device eval step must not crop again.
    eval_host_preprocessed: bool = False
    # Train batches carry per-view distorted crops taken on host at ORIGINAL
    # source resolution ('image' is (B, V, H, W, 3)); the device augment
    # stage applies flip/color/blur only (full-fidelity path,
    # data_util.py:252-325).
    train_host_cropped: bool = False


_CANVAS = 256  # host canvas side for large images (device crops from this)


def _canvas_shape(config: Config) -> Tuple[int, int, int]:
    if config.image_size <= 32:
        return (config.image_size, config.image_size, 3)
    # Keep a modest margin over the train crop so random crops see context.
    side = max(_CANVAS, config.image_size)
    return (side, side, 3)


def make_train_canvas_fn(canvas_h: int, canvas_w: int):
    """TF map: letterbox a decoded image onto a fixed canvas, ASPECT
    PRESERVED (resize to fit, never upscale, pad bottom/right), and report
    the valid region.  The device crop sampler draws its distorted bbox
    inside the valid region, so the effective crop-geometry distribution
    matches the reference's sampling on the original image
    (data_util.py:252-325) — the canvas is transport, not a resample of
    the aspect ratio."""
    import tensorflow as tf

    def fn(image):
        shape = tf.shape(image)
        ih = tf.cast(shape[0], tf.float32)
        iw = tf.cast(shape[1], tf.float32)
        scale = tf.minimum(
            tf.minimum(float(canvas_h) / ih, float(canvas_w) / iw), 1.0)
        nh = tf.cast(tf.round(ih * scale), tf.int32)
        nw = tf.cast(tf.round(iw * scale), tf.int32)
        resized = tf.image.resize(image, (nh, nw), method="bicubic")
        resized = tf.clip_by_value(tf.cast(resized, tf.float32), 0.0, 255.0)
        # Edge-replicate into the padding (not zeros): bicubic taps of a crop
        # box touching the valid-region edge then see clamped pixels, exactly
        # like the reference's resize at the true image edge.
        canvas = tf.gather(resized, tf.minimum(tf.range(canvas_h), nh - 1), axis=0)
        canvas = tf.gather(canvas, tf.minimum(tf.range(canvas_w), nw - 1), axis=1)
        return (tf.cast(canvas, tf.uint8),
                tf.stack([nh, nw]))

    return fn


def make_train_crop_fn(height: int, width: int, num_views: int, seed: int):
    """TF map: the reference's train crop at ORIGINAL resolution — sample a
    distorted bounding box per view with the exact reference op and
    distribution (tf.image.sample_distorted_bounding_box, min_object_covered
    0.1, aspect ratio 3/4..4/3 x target aspect, area 8%..100%, 100 attempts
    — data_util.py:252-325), crop the box from the full-resolution source,
    and bicubic-resize it to the target size.  Emits uint8
    (num_views, height, width, 3); flip + color jitter + blur stay on
    device (ops/augment.py two_view_pretrain_batch(host_cropped=True)).

    This is the full-fidelity alternative to the letterbox canvas: an
    8%-area crop of a 1500px photo resamples ~400px of real detail instead
    of the ~100px a 256px canvas retains."""
    import tensorflow as tf

    aspect = width / height

    def one_crop(image, op_seed):
        begin, size, _ = tf.image.stateless_sample_distorted_bounding_box(
            tf.shape(image),
            bounding_boxes=tf.zeros((1, 0, 4), tf.float32),
            seed=op_seed,
            min_object_covered=0.1,
            aspect_ratio_range=(3.0 / 4.0 * aspect, 4.0 / 3.0 * aspect),
            area_range=(0.08, 1.0),
            max_attempts=100,
            use_image_if_no_bounding_boxes=True,
        )
        crop = tf.slice(image, begin, size)
        crop = tf.image.resize(crop, (height, width), method="bicubic")
        crop = tf.clip_by_value(tf.cast(crop, tf.float32), 0.0, 255.0)
        return tf.cast(crop, tf.uint8)

    def fn(image, index):
        # Stateless per-example x per-view seeds: deterministic under
        # num_parallel_calls=AUTOTUNE (unlike the reference's stateful op).
        idx = tf.cast(index, tf.int32)
        views = [one_crop(image, tf.stack([seed + v, idx]))
                 for v in range(num_views)]
        return tf.stack(views)

    return fn


def make_eval_crop_fn(height: int, width: int, test_crop: bool):
    """TF map: the reference eval preprocessing at ORIGINAL resolution —
    proportional center crop (0.875) + bicubic resize
    (data_util.py:184-249, center_crop/_compute_crop_shape), or plain
    resize when test_crop is off (<=32px datasets, data.py:152-165)."""
    import tensorflow as tf

    crop_proportion = 0.875
    aspect = width / height

    def fn(image):
        if test_crop:
            shape = tf.shape(image)
            ih = tf.cast(shape[0], tf.float32)
            iw = tf.cast(shape[1], tf.float32)
            # _compute_crop_shape (tf2/data_util.py:184-214)
            def portrait():
                return (tf.round(crop_proportion / aspect * iw),
                        tf.round(crop_proportion * iw))

            def landscape():
                return (tf.round(crop_proportion * ih),
                        tf.round(crop_proportion * aspect * ih))

            ch, cw = tf.cond(aspect > iw / ih, portrait, landscape)
            ch = tf.cast(ch, tf.int32)
            cw = tf.cast(cw, tf.int32)
            oy = (shape[0] - ch + 1) // 2
            ox = (shape[1] - cw + 1) // 2
            image = tf.image.crop_to_bounding_box(image, oy, ox, ch, cw)
        image = tf.image.resize(image, (height, width), method="bicubic")
        image = tf.clip_by_value(tf.cast(image, tf.float32), 0.0, 255.0)
        return tf.cast(image, tf.uint8)

    return fn


# ---------------------------------------------------------------------------
# Synthetic
# ---------------------------------------------------------------------------

class SyntheticDataset:
    """Deterministic fake data with the exact interface of the real loaders."""

    def __init__(self, config: Config, is_training: bool, num_examples: int, num_classes: int = 10):
        self.config = config
        self.is_training = is_training
        self.num_examples = num_examples
        self.num_classes = num_classes
        self.shape = _canvas_shape(config)
        self.batch_size = config.train_batch_size if is_training else config.eval_batch_size
        self.start_step = 0

    def set_start_step(self, step: int):
        """Resume support: continue the batch sequence from ``step`` instead
        of restarting at 0 (each batch is a stateless function of its index)."""
        self.start_step = int(step)

    def __iter__(self) -> Iterator[dict]:
        base = self.config.seed if self.is_training else self.config.seed + 1
        h, w, c = self.shape
        idx = self.start_step
        while True:
            rng = np.random.RandomState((base * 1000003 + idx) % (2 ** 31 - 1))
            # Global batch generated identically on every process, then each
            # takes its contiguous slice — so an N-process run consumes the
            # SAME global batch sequence as a single-process run (tested by
            # the multi-process equivalence test).
            images = rng.randint(0, 256, size=(self.batch_size, h, w, c), dtype=np.uint8)
            labels = rng.randint(0, self.num_classes, size=(self.batch_size,)).astype(np.int32)
            if self.is_training:
                images, labels = shard_for_process(images, labels)
                yield {"image": images, "label": labels}
            else:
                # Exact eval masks (first-tier loader contract): tag each row
                # with its global stream position; evaluate() masks rows by
                # index >= num_eval_examples under any process count.
                gidx = (idx * self.batch_size
                        + np.arange(self.batch_size)).astype(np.int32)
                images, labels, gidx = shard_for_process(images, labels, gidx)
                yield {"image": images, "label": labels, "index": gidx}
            idx += 1


# ---------------------------------------------------------------------------
# In-memory arrays (npz / tfds-materialized)
# ---------------------------------------------------------------------------

class ArrayDataset:
    """Shuffle/repeat/batch over in-memory uint8 arrays.

    Mirrors the reference pipeline structure (shuffle buffer -> repeat ->
    batch -> drop remainder in training, data.py:133-146) but over a full
    in-memory array, so the 'shuffle buffer' is an exact per-epoch
    permutation.  Eval pads the final partial batch with a mask-free repeat
    of the tail dropped at metric time via ``num_examples``.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 is_training: bool, seed: int = 0, num_parallel: int = 0):
        assert images.dtype == np.uint8, images.dtype
        self.images = images
        self.labels = labels.astype(np.int32)
        self.batch_size = batch_size
        self.is_training = is_training
        self.seed = seed
        self.num_examples = len(images)
        self.start_step = 0

    def set_start_step(self, step: int):
        """Resume support: continue mid-epoch from global step ``step``
        (per-epoch permutations are stateless functions of the epoch index,
        so any step's batch is reachable without replaying prior epochs)."""
        self.start_step = int(step)

    def __iter__(self) -> Iterator[dict]:
        n, bs = self.num_examples, self.batch_size
        if self.is_training:
            bpe = max(1, n // bs)  # batches per epoch (drop remainder)
            epoch = self.start_step // bpe
            offset = self.start_step % bpe
            while True:
                rng = np.random.RandomState((self.seed * 9973 + epoch) % (2 ** 31 - 1))
                perm = rng.permutation(n)
                for b in range(offset, bpe):
                    idx = perm[b * bs:(b + 1) * bs]
                    # Multi-process: same global permutation everywhere, each
                    # process yields its contiguous slice of the batch.
                    images, labels = shard_for_process(self.images[idx], self.labels[idx])
                    yield {"image": images, "label": labels}
                offset = 0
                epoch += 1
        else:
            for i in range(0, n, bs):
                idx = np.arange(i, min(i + bs, n))
                if len(idx) < bs:  # pad final batch; pad rows carry
                    # index == n so the caller's mask drops them exactly
                    pad = np.zeros(bs - len(idx), np.int64)
                    gidx = np.concatenate([idx, np.full(bs - len(idx), n)])
                    idx = np.concatenate([idx, pad])
                else:
                    gidx = idx
                images, labels, gidx = shard_for_process(
                    self.images[idx], self.labels[idx], gidx.astype(np.int32))
                yield {"image": images, "label": labels, "index": gidx}


# ---------------------------------------------------------------------------
# TFDS (optional)
# ---------------------------------------------------------------------------

class TFDSStream:
    """Streaming TFDS pipeline: decode + aspect-preserving letterbox (train)
    or reference center-crop at original resolution (eval) on host, batch
    uint8; the rest of the augmentation happens on device using the
    per-image valid-region metadata.

    Structure mirrors the reference host pipeline (data.py:133-146 /
    tf2/data.py:64-90): shuffle(buffer = bsz x 50 small / x10 large) ->
    repeat -> map -> batch(drop_remainder=train) -> prefetch(AUTOTUNE),
    sharded per process for multi-host.
    """

    def __init__(self, config: Config, is_training: bool):
        import tensorflow as tf
        import tensorflow_datasets as tfds

        from simclr_tpu.data import subsets as subsets_lib

        name = config.dataset.removeprefix("tfds:")
        # Semi-supervised subsets (C18): prefer the dedicated
        # imagenet2012_subset builder; fall back to filtering plain
        # imagenet2012 by the vendored ID lists when it is unavailable.
        pct = subsets_lib.parse_subset_pct(name)
        subset_fallback = False
        try:
            builder = tfds.builder(name, data_dir=config.data_dir)
            builder.download_and_prepare()
        except Exception:
            if pct is None:
                raise
            builder = tfds.builder("imagenet2012", data_dir=config.data_dir)
            builder.download_and_prepare()
            subset_fallback = True
        split = config.train_split if is_training else config.eval_split
        filter_ids = is_training and subset_fallback and split.startswith("train")
        if filter_ids:
            self.num_examples = subsets_lib._EXPECTED_COUNTS[pct]
        else:
            self.num_examples = builder.info.splits[split].num_examples
        self.num_classes = builder.info.features["label"].num_classes
        h, w, _ = _canvas_shape(config)
        bs = config.train_batch_size if is_training else config.eval_batch_size

        import jax

        if filter_ids:
            ids = sorted(subsets_lib.load_subset_ids(pct))
            table = tf.lookup.StaticHashTable(
                tf.lookup.KeyValueTensorInitializer(
                    tf.constant(ids), tf.ones(len(ids), tf.bool)),
                default_value=False,
            )
            ds = builder.as_dataset(split=split, shuffle_files=is_training)
            ds = ds.filter(lambda ex: table.lookup(ex["file_name"]))
            ds = ds.map(lambda ex: (ex["image"], ex["label"]))
        else:
            ds = builder.as_dataset(split=split, shuffle_files=is_training,
                                    as_supervised=True)
        if not is_training:
            # Exact multi-host eval masks: tag every example with its GLOBAL
            # index BEFORE sharding, so padding masks on ragged final shards
            # attribute rows exactly (TF1 pad_to_batch parity, data.py:31-100
            # — evaluate() masks rows by index >= num_examples).
            ds = ds.enumerate()
        if jax.process_count() > 1:
            ds = ds.shard(jax.process_count(), jax.process_index())
        if config.cache_dataset:
            ds = ds.cache()
        if is_training:
            buffer_multiplier = 50 if config.image_size <= 32 else 10
            ds = ds.shuffle(bs * buffer_multiplier, seed=config.seed)
            ds = ds.repeat(-1)

        self.train_host_cropped = False
        if is_training and config.host_crop_full_res and config.image_size > 32:
            # Full-fidelity path (default): distorted crops sampled and
            # resampled at ORIGINAL resolution on host; device does
            # flip/color/blur only.
            self.train_host_cropped = True
            views = 2 if config.train_mode == "pretrain" else 1
            crop_fn = make_train_crop_fn(config.image_size, config.image_size,
                                         views, seed=config.seed)
            ds = ds.enumerate()

            def map_fn(index, example):
                image, label = example
                crops = crop_fn(image, index)
                if views == 1:  # finetune: single view, no view axis
                    crops = crops[0]
                return {"image": crops, "label": tf.cast(label, tf.int32)}
        elif is_training:
            canvas_fn = make_train_canvas_fn(h, w)

            def map_fn(image, label):
                canvas, valid_hw = canvas_fn(image)
                return {"image": canvas, "label": tf.cast(label, tf.int32),
                        "valid_hw": valid_hw}
        else:
            eval_fn = make_eval_crop_fn(config.image_size, config.image_size,
                                        test_crop=config.image_size > 32)

            def map_fn(index, example):
                image, label = example
                return {"image": eval_fn(image), "label": tf.cast(label, tf.int32),
                        "index": tf.cast(index, tf.int32)}

        ds = ds.map(map_fn, num_parallel_calls=tf.data.AUTOTUNE)
        # Multi-process: the stream above is sharded per process, so each
        # host batches its 1/process_count share of the global batch
        # (reference input_context.get_per_replica_batch_size,
        # tf2/data.py:43-47).
        if jax.process_count() > 1:
            if bs % jax.process_count():
                raise ValueError(
                    f"batch size {bs} not divisible by {jax.process_count()} processes")
            bs = bs // jax.process_count()
        ds = ds.batch(bs, drop_remainder=is_training)
        self._ds = ds
        self._bs = bs
        self._is_training = is_training
        self._skip_batches = 0
        self.eval_host_preprocessed = not is_training

    def set_start_step(self, step: int):
        """Resume support: fast-forward the (deterministic, seeded) stream by
        the restored step's position within its epoch.  Exact continuation of
        a shuffled infinite stream would require replaying ``step`` batches;
        skipping ``step % steps_per_epoch`` restores the epoch phase — the
        property that matters (a resumed run must not repeat early-epoch
        order) — at bounded startup cost."""
        if not self._is_training or step <= 0:
            return
        steps_per_epoch = max(1, self.num_examples // self._bs)
        self._skip_batches = int(step) % steps_per_epoch

    def __iter__(self) -> Iterator[dict]:
        import jax
        import tensorflow as tf
        import tensorflow_datasets as tfds

        ds = self._ds
        if self._skip_batches:
            ds = ds.skip(self._skip_batches)
        ds = ds.prefetch(tf.data.AUTOTUNE)
        n_yielded = 0
        last = None
        for batch in tfds.as_numpy(ds):
            if len(batch["label"]) < self._bs:  # pad final eval batch
                pad = self._bs - len(batch["label"])
                batch = {k: np.concatenate([v, np.repeat(v[:1], pad, 0)])
                         for k, v in batch.items()}
                if "index" in batch:  # pad rows must be masked, not
                    # double-counted: index == num_examples drops them
                    batch["index"][-pad:] = self.num_examples
            yield dict(batch)
            last = batch
            n_yielded += 1
        if self._is_training or jax.process_count() <= 1 or last is None:
            return
        # Ragged multi-host eval: every process must join the SAME number of
        # collective eval steps.  Per-shard example counts differ by <=1, so
        # a process can be one batch short — emit fully-masked filler
        # batches up to the global maximum (index == num_examples on every
        # row drops them from all metrics).
        n_proc = jax.process_count()
        max_shard = -(-self.num_examples // n_proc)  # ceil: largest shard
        expected = -(-max_shard // self._bs)
        while n_yielded < expected:
            filler = dict(last)
            if "index" in filler:
                filler["index"] = np.full_like(filler["index"],
                                               self.num_examples)
            yield filler
            n_yielded += 1


def _load_tfds(config: Config, is_training: bool):
    stream = TFDSStream(config, is_training)
    return stream, stream.num_examples, stream.num_classes


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def shard_for_process(*arrays: np.ndarray):
    """Multi-host input sharding: each process reads its contiguous slice
    (the reference shards per input pipeline via input_context,
    tf2/data.py:43-47,64-75)."""
    import jax

    n_proc = jax.process_count()
    if n_proc <= 1:
        return arrays if len(arrays) > 1 else arrays[0]
    idx = jax.process_index()
    per = len(arrays[0]) // n_proc
    lo, hi = idx * per, (idx + 1) * per
    out = tuple(a[lo:hi] for a in arrays)
    return out if len(out) > 1 else out[0]


def make_array_pipeline(config: Config, images: np.ndarray, labels: np.ndarray,
                        batch_size: int, is_training: bool):
    """Dispatch an in-memory array source to the configured host batching
    backend (--input_pipeline): 'python' (ArrayDataset), 'native' (the C++
    threaded ring-buffer pipeline, data/native/pipeline.cc) or 'grain'.
    Native/grain degrade to the python backend with a warning when their
    runtime is unavailable on this host."""
    import logging

    kind = config.input_pipeline
    if kind == "native":
        try:
            from simclr_tpu.data.native_pipeline import (
                NativeArrayPipeline, NativePipelineUnavailable)
        except ImportError as e:
            NativeArrayPipeline = None
            logging.getLogger("simclr_tpu").warning(
                "native input pipeline unavailable (%s); using python", e)
        if NativeArrayPipeline is not None:
            import jax

            n_proc, p_idx = jax.process_count(), jax.process_index()
            seed, kw = config.seed, {}
            if n_proc > 1:
                # Per-process sharding: contiguous slice + local batch, like
                # the reference's per-pipeline input_context split
                # (tf2/data.py:43-47).  Training shuffles each shard with a
                # decorrelated seed (reference semantics: every input
                # pipeline shuffles its own shard independently); eval keeps
                # exact global index tags + filler batches for ragged shards.
                if batch_size % n_proc:
                    raise ValueError(
                        f"batch size {batch_size} not divisible by "
                        f"{n_proc} processes (native pipeline)")
                n = len(images)
                per = -(-n // n_proc)  # ceil-split: first shards are larger
                lo, hi = min(p_idx * per, n), min((p_idx + 1) * per, n)
                local_bs = batch_size // n_proc
                if is_training:
                    seed = config.seed + 7919 * p_idx
                else:
                    kw = dict(index_offset=lo, num_examples_global=n,
                              expected_batches=-(-per // local_bs))
                shard_images, shard_labels = images[lo:hi], labels[lo:hi]
                shard_bs = local_bs
            else:
                shard_images, shard_labels, shard_bs = images, labels, batch_size
            try:
                # NOTE: pass the SLICED arrays + LOCAL batch here only; the
                # fallback below must see the original globals, because
                # ArrayDataset shards + localizes internally — handing it the
                # pre-sliced shard would double-shard (global batch B/n_proc,
                # eval index tags relative to the slice).
                return NativeArrayPipeline(shard_images, shard_labels,
                                           shard_bs, is_training, seed=seed,
                                           **kw)
            except NativePipelineUnavailable as e:  # no g++ on this host
                logging.getLogger("simclr_tpu").warning(
                    "native input pipeline unavailable (%s); using python", e)
    elif kind == "grain":
        try:
            import jax

            from simclr_tpu.data.grain_loader import GrainArrayPipeline

            return GrainArrayPipeline(
                images, labels, batch_size, is_training, seed=config.seed,
                shard_index=jax.process_index(), shard_count=jax.process_count(),
            )
        except ImportError as e:
            logging.getLogger("simclr_tpu").warning(
                "grain unavailable (%s); using python input pipeline", e)
    elif kind != "python":
        raise ValueError(f"unknown --input_pipeline={kind!r}")
    return ArrayDataset(images, labels, batch_size, is_training, config.seed)


def build_dataset(config: Config, is_training: bool):
    """Returns (iterable, DatasetInfo)."""
    name = config.dataset
    eval_override = (not is_training and config.eval_dataset
                     and config.eval_dataset != config.dataset)
    if eval_override:
        # --eval_dataset: a dedicated held-out source (e.g. the real test
        # split shipped as its own npz); the WHOLE file is the eval set —
        # no 90/10 auto-split (tools/real_data_acceptance.py).
        name = config.eval_dataset
        if name.startswith("npz:"):
            data = np.load(name[4:])
            images, labels = data["images"], data["labels"]
            num_classes = int(labels.max()) + 1
            arr = make_array_pipeline(config, images, labels,
                                      config.eval_batch_size, False)
            n_train = config.num_images_default or len(images)
            info = DatasetInfo(n_train, len(images), num_classes,
                               images.shape[1:])
            return arr, info
        config = config.replace(dataset=name)
    if name == "synthetic":
        n_train = config.num_images_default or 4096
        n_eval = config.num_images_default or 1024
        num_classes = 10
        n = n_train if is_training else n_eval
        info = DatasetInfo(n_train, n_eval, num_classes, _canvas_shape(config))
        if config.input_pipeline != "python":
            # Drive the production (native/grain) batching path over a
            # materialized synthetic array so the full pipeline is testable
            # without dataset files.
            h, w, c = _canvas_shape(config)
            rng = np.random.RandomState(config.seed if is_training else config.seed + 1)
            images = rng.randint(0, 256, size=(n, h, w, c), dtype=np.uint8)
            labels = rng.randint(0, num_classes, size=(n,)).astype(np.int32)
            bs = config.train_batch_size if is_training else config.eval_batch_size
            return make_array_pipeline(config, images, labels, bs, is_training), info
        ds = SyntheticDataset(config, is_training, n, num_classes)
        return ds, info
    if name.startswith("npz:"):
        # 'npz:/path.npz' — arrays {'images','labels'[,'ids']};
        # 'npz:/path.npz@1pct' / '@10pct' — train split filtered to the
        # vendored ImageNet semi-supervised subset by the 'ids' array (C18).
        path, pct = name[4:], None
        for suffix, p in (("@1pct", 1), ("@10pct", 10)):
            if path.endswith(suffix):
                path, pct = path[: -len(suffix)], p
        data = np.load(path)
        images, labels = data["images"], data["labels"]
        num_classes = int(labels.max()) + 1
        if config.eval_dataset and config.eval_dataset != config.dataset:
            # A dedicated held-out eval source exists (--eval_dataset): train
            # on the WHOLE file.  The 90/10 auto-split below is only for
            # self-contained single-npz runs; holding out rows here would
            # silently shrink label-fraction subsets (1% of labels must mean
            # 1%, not 0.9% — README.md:157-167 semi-supervised recipes).
            split = len(images)
        else:
            split = len(images) * 9 // 10
        tr_images, tr_labels = images[:split], labels[:split]
        if pct is not None:
            from simclr_tpu.data import subsets as subsets_lib

            if "ids" not in data:
                raise ValueError(f"{path} has no 'ids' array; @{pct}pct "
                                 "subset filtering needs per-example IDs")
            keep = subsets_lib.subset_mask(data["ids"][:split],
                                           subsets_lib.load_subset_ids(pct))
            tr_images, tr_labels = tr_images[keep], tr_labels[keep]
        if is_training:
            arr = make_array_pipeline(config, tr_images, tr_labels,
                                      config.train_batch_size, True)
        else:
            arr = make_array_pipeline(config, images[split:], labels[split:],
                                      config.eval_batch_size, False)
        info = DatasetInfo(len(tr_images), len(images) - split, num_classes,
                           images.shape[1:])
        return arr, info
    # tfds path (cifar10, imagenet2012, imagenet2012_subset/1pct, ...)
    ds, num, num_classes = _load_tfds(config, is_training)
    host_eval = getattr(ds, "eval_host_preprocessed", False)
    if is_training:
        if getattr(ds, "train_host_cropped", False):
            shape = (config.image_size, config.image_size, 3)
            info = DatasetInfo(num, 0, num_classes, shape,
                               train_host_cropped=True)
        else:
            info = DatasetInfo(num, 0, num_classes, _canvas_shape(config))
    else:
        n_train = config.num_images_default or num
        info = DatasetInfo(n_train, num, num_classes, _canvas_shape(config),
                           eval_host_preprocessed=host_eval)
    return ds, info


class Prefetcher:
    """One-batch-ahead host prefetch thread (replaces tf.data prefetch /
    AUTOTUNE, tf2/data.py:79-89)."""

    def __init__(self, iterable, depth: int = 2):
        import queue

        self._q = queue.Queue(maxsize=depth)
        self._it = iter(iterable)
        self._done = object()
        self._stop = False
        self._exc = None

        def worker():
            try:
                for item in self._it:
                    self._q.put(item)
                    if self._stop:
                        break
            except BaseException as e:  # re-raised in the consumer —
                # a crashed pipeline must not masquerade as data exhaustion
                self._exc = e
            finally:
                self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self, timeout: float = 5.0):
        """Stop the prefetch thread (drains at most one in-flight batch) so
        backends with their own worker pools (grain, native) tear down
        before interpreter exit instead of aborting in a daemon thread."""
        self._stop = True
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=timeout)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item
