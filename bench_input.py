"""Benchmark the HOST input path: sustained images/sec from each batching
backend with live JPEG decode + preprocessing (VERDICT r2 #3 — the device
step was measured at ~1178 img/s/chip by bench.py, but the host side that
must feed it was only correctness-tested).

Pipelines measured (reference role: tf.data host pipeline,
tf2/data.py:64-90):
  * tf-stream + host full-res crop  — decode JPEG -> per-view distorted
    crop at original resolution -> bicubic resize (the default
    --host_crop_full_res path for tfds sources)
  * tf-stream + letterbox canvas    — decode JPEG -> aspect-preserving
    letterbox onto the 256 canvas (--host_crop_full_res=false path)
  * python / native (C++) / grain   — in-memory array batching backends
    (--input_pipeline) over pre-decoded canvases

No dataset files are needed: ImageNet-shaped JPEGs are synthesized and
encoded in memory (no egress on this host).  Prints one JSON line per
pipeline: {"pipeline", "images_per_sec", "per_view_images_per_sec",
"feeds_device_rate_chips"} where the last field is how many chips at
DEVICE_RATE img/s/chip this single host could keep fed.

Usage: python bench_input.py [--seconds 10] [--batch 128]
"""

import argparse
import json
import time

import numpy as np

DEVICE_RATE = 1178.0  # bench.py r2, img/s/chip on this TPU


def synth_jpegs(n=64, h=375, w=500, quality=90):
    """ImageNet-shaped photo-like JPEGs (smooth fields + texture compress
    like photos; pure noise would be a worst-case decode)."""
    import tensorflow as tf

    rng = np.random.RandomState(0)
    out = []
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        f1, f2 = rng.uniform(0.01, 0.05, 2)
        base = np.stack([
            127 + 90 * np.sin(xx * f1 + i) * np.cos(yy * f2),
            127 + 90 * np.cos(xx * f2) * np.sin(yy * f1 + i),
            127 + 90 * np.sin((xx + yy) * f1),
        ], axis=-1)
        base += rng.randn(h, w, 3) * 12
        img = np.clip(base, 0, 255).astype(np.uint8)
        out.append(tf.io.encode_jpeg(img, quality=quality).numpy())
    return out


def bench_tf_stream(jpegs, mode, batch, seconds, image_size=224):
    """tf.data: from encoded bytes -> shuffle/repeat -> decode+map -> batch,
    mirroring TFDSStream's structure (data/loader.py)."""
    import tensorflow as tf

    from simclr_tpu.data.loader import make_train_canvas_fn, make_train_crop_fn

    ds = tf.data.Dataset.from_tensor_slices(list(jpegs))
    ds = ds.shuffle(len(jpegs), seed=0).repeat(-1)
    if mode == "host_crop":
        crop_fn = make_train_crop_fn(image_size, image_size, num_views=2, seed=0)
        ds = ds.enumerate()

        def map_fn(idx, enc):
            img = tf.io.decode_jpeg(enc, channels=3)
            return crop_fn(img, idx)
    else:
        canvas_fn = make_train_canvas_fn(256, 256)

        def map_fn(enc):
            img = tf.io.decode_jpeg(enc, channels=3)
            canvas, _ = canvas_fn(img)
            return canvas

    ds = ds.map(map_fn, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch, drop_remainder=True).prefetch(tf.data.AUTOTUNE)
    it = iter(ds)
    next(it)  # warm
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += 1
    dt = time.perf_counter() - t0
    return n * batch / dt


def bench_array_backend(kind, batch, seconds):
    from simclr_tpu.config import Config
    from simclr_tpu.data.loader import Prefetcher, make_array_pipeline

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (2048, 256, 256, 3), np.uint8)
    labels = rng.randint(0, 1000, (2048,)).astype(np.int32)
    cfg = Config(input_pipeline=kind)
    pipe = Prefetcher(make_array_pipeline(cfg, images, labels, batch, True))
    it = iter(pipe)
    next(it)
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += 1
    dt = time.perf_counter() - t0
    pipe.close()
    return n * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--device_rate", type=float, default=DEVICE_RATE)
    args = ap.parse_args()

    results = []
    jpegs = synth_jpegs()
    for mode, views in (("host_crop", 2), ("canvas", 1)):
        rate = bench_tf_stream(jpegs, mode, args.batch, args.seconds)
        results.append({
            "pipeline": f"tf-stream/{mode}",
            "images_per_sec": round(rate, 1),
            # host_crop emits 2 resampled views per source image
            "views_per_sec": round(rate * views, 1),
            "feeds_device_rate_chips": round(rate / args.device_rate, 2),
        })
        print(json.dumps(results[-1]), flush=True)
    for kind in ("python", "native", "grain"):
        try:
            rate = bench_array_backend(kind, args.batch, args.seconds)
        except Exception as e:  # backend unavailable on this host
            print(json.dumps({"pipeline": f"array/{kind}", "error": str(e)}),
                  flush=True)
            continue
        results.append({
            "pipeline": f"array/{kind}",
            "images_per_sec": round(rate, 1),
            "feeds_device_rate_chips": round(rate / args.device_rate, 2),
        })
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    import os
    import sys

    main()
    sys.stdout.flush()
    # Grain/native backends keep worker pools alive in daemon threads;
    # normal interpreter teardown can abort (observed: grain executor
    # 'cannot schedule new futures after shutdown').  Results are printed —
    # exit hard.
    os._exit(0)
