"""Load an exported serving bundle and run inference (reference
colabs/load_and_inference.ipynb parity).

Usage:
  python examples/load_and_inference.py --model <model_dir>/saved_model/<step> \
      [--images batch.npz]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.export import load_serving
from simclr_tpu.ops.augment import preprocess_for_eval


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="serving bundle path")
    p.add_argument("--images", default=None, help="npz with 'images' uint8 array")
    p.add_argument("--image_size", type=int, default=224)
    args = p.parse_args()

    serve = load_serving(args.model)
    if args.images:
        images = np.load(args.images)["images"]
    else:
        images = np.random.RandomState(0).randint(
            0, 256, size=(4, 256, 256, 3), dtype=np.uint8)

    x = jnp.asarray(images, jnp.float32) / 255.0
    x = preprocess_for_eval(x, args.image_size, args.image_size,
                            crop=args.image_size > 32)
    out = serve(x, trainable=False)
    features = out["final_avg_pool"]
    print("features:", features.shape)
    if "logits_sup" in out:
        probs = jax.nn.softmax(out["logits_sup"], -1)
        top = jnp.argmax(probs, -1)
        print("predicted classes:", np.asarray(top))
        print("confidence:", np.asarray(jnp.max(probs, -1)))
    print("projection:", out["proj_head_output"].shape)


if __name__ == "__main__":
    main()
