"""'Intriguing Properties of Contrastive Losses' experiment suite
(reference C20: colabs/intriguing_properties/*.ipynb).

JAX re-design of the notebook components:
  * RandBits datasets: append ``extra_channel_bits`` constant per-image
    pseudo-random bit channels to each image (randbits_mnist.ipynb cell 4) —
    the competing easy-to-learn feature.  The notebook hashes the JPEG bytes
    with to_hash_bucket_fast; here the bits come from a stable CRC32 of the
    raw pixel bytes (same property: deterministic per image, uniform).
  * ConvN encoder (cell 6): 3 strided conv-BN-relu stages + dense latent,
    2-layer projection head, stop-gradient linear classifier.
  * Simplified NT-Xent with eye labels (cell 5): positives-only similarity
    matrix CE in both directions.
  * DigitOnImage composition (digits_on_tf_flowers.ipynb cell 3): paste a
    digit patch onto a background image at a random location.
"""

from __future__ import annotations

import zlib
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# RandBits
# ---------------------------------------------------------------------------

def image_to_bits(image: np.ndarray, extra_channel_bits: int) -> np.ndarray:
    """Deterministic per-image bits in {0,1}^k (host-side, numpy)."""
    h = zlib.crc32(np.ascontiguousarray(image).tobytes()) & 0xFFFFFFFF
    # Extend to arbitrary k bits by re-hashing with a counter.
    bits = []
    x, ctr = h, 0
    while len(bits) < extra_channel_bits:
        bits.extend(int(b) for b in format(x, "032b"))
        ctr += 1
        x = zlib.crc32(image.tobytes() + bytes([ctr])) & 0xFFFFFFFF
    return np.asarray(bits[:extra_channel_bits], np.float32)


def pack_extra_channels(images: np.ndarray, extra_channel_bits: int) -> np.ndarray:
    """(B, H, W, C) -> (B, H, W, C + k) with constant bit channels."""
    if extra_channel_bits <= 0:
        return images
    b, h, w, _ = images.shape
    bits = np.stack([image_to_bits(im, extra_channel_bits) for im in images])
    bits = np.broadcast_to(bits[:, None, None, :], (b, h, w, extra_channel_bits))
    return np.concatenate([images.astype(np.float32), bits], axis=-1)


# ---------------------------------------------------------------------------
# ConvN model (randbits_mnist.ipynb cell 6)
# ---------------------------------------------------------------------------

class ConvN(nn.Module):
    width_multiplier: int = 1
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        wm = self.width_multiplier
        latent_dim = 128 * wm

        def conv_bn_relu(y, feats, name):
            y = nn.Conv(feats, (3, 3), strides=(2, 2), use_bias=False, padding="VALID",
                        dtype=self.dtype, name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"{name}_batch_norm")(y)
            return nn.relu(y)

        def dense_bn_relu(y, feats, name):
            y = nn.Dense(feats, use_bias=False, dtype=self.dtype, name=f"{name}_dense")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"{name}_batch_norm")(y)
            return nn.relu(y)

        x = conv_bn_relu(x, 32 * wm, "enc0")
        x = conv_bn_relu(x, 64 * wm, "enc1")
        x = conv_bn_relu(x, 64 * wm, "enc2")
        x = x.reshape(x.shape[0], -1)
        y = dense_bn_relu(x, latent_dim, "enc3")

        z = dense_bn_relu(y, latent_dim * 2, "proj0")
        z = nn.Dense(latent_dim // 2, use_bias=False, dtype=self.dtype, name="proj1")(z)

        pred = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(
            jax.lax.stop_gradient(y)
        )
        return y, z.astype(jnp.float32), pred.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Simplified NT-Xent (randbits_mnist.ipynb cell 5)
# ---------------------------------------------------------------------------

def simple_contrastive_loss(z1, z2, temperature: float = 0.1):
    """CE against eye labels on the z1 x z2 similarity matrix, both ways."""
    z1 = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True).clip(1e-12)
    z2 = z2 / jnp.linalg.norm(z2, axis=-1, keepdims=True).clip(1e-12)
    sim = jnp.matmul(z1, z2.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.eye(z1.shape[0])

    def ce(logits):
        return -jnp.mean(jnp.sum(labels * jax.nn.log_softmax(logits, -1), -1))

    return (ce(sim) + ce(sim.T)) / 1.0, sim


# ---------------------------------------------------------------------------
# DigitOnImage composition (digits_on_tf_flowers.ipynb cell 3)
# ---------------------------------------------------------------------------

def digit_on_image(digit, background, key, digit_size: int = 28):
    """Paste a (28,28,1) digit onto an (H,W,3) background at a random
    offset; digit pixels overwrite the background where the digit is lit."""
    h, w, _ = background.shape
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - digit_size + 1)
    x0 = jax.random.randint(kx, (), 0, w - digit_size + 1)
    digit_rgb = jnp.repeat(digit, 3, axis=-1)
    patch = jax.lax.dynamic_slice(background, (y0, x0, 0), (digit_size, digit_size, 3))
    merged = jnp.where(digit_rgb > 0.1, digit_rgb, patch)
    return jax.lax.dynamic_update_slice(background, merged, (y0, x0, 0))
