"""TPU acceptance: the fused-Pallas pretrain path must LEARN end to end.

Runs a real SimCLR pretrain (two Pallas-augmented views, NT-Xent, LARS,
lineareval-while-pretraining head) on a small class-tinted synthetic
dataset, on the default backend (the real TPU on this host — the CPU test
suite exercises the XLA augmentation path; this drives the Pallas one),
then checks the learning signals:

  * train/contrast_acc  — instance discrimination over 2N=2*batch rows;
    chance is 1/(2N-1), the bar is >0.5;
  * eval label top-1 via the stop-gradient linear head — class tints are
    recoverable from SimCLR features; the bar is >0.6 (chance 0.25).

Usage: python tools/tpu_acceptance.py [--steps 300]
Prints PASS/FAIL lines and exits nonzero on failure.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tinted_npz(path, n=2048, num_classes=4, size=32, seed=0):
    """Low-frequency random images + class tints.  Low frequency matters:
    random crops of iid noise share no feature-level information, so
    instance discrimination collapses to the class clusters (observed:
    label top-1 1.0 but contrastive top-1 ~ 1/cluster-size); smooth images
    keep per-instance identity across crops/blur."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, size=n)
    low = rng.randint(0, 160, size=(n, 4, 4, 3))
    images = np.kron(low, np.ones((1, size // 4, size // 4, 1))).astype(np.int32)
    tints = np.array([[90, 0, 0], [0, 90, 0], [0, 0, 90], [70, 70, 0]])
    images += tints[labels][:, None, None, :]
    np.savez(path, images=np.clip(images, 0, 255).astype(np.uint8), labels=labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    from simclr_tpu.config import Config
    from simclr_tpu.training import trainer

    tmp = tempfile.mkdtemp(prefix="tpu_accept_")
    npz = os.path.join(tmp, "tinted.npz")
    make_tinted_npz(npz)

    config = Config(
        dataset=f"npz:{npz}",
        image_size=32,
        resnet_depth=18,
        train_mode="pretrain",
        lineareval_while_pretraining=True,
        train_batch_size=args.batch,
        eval_batch_size=args.batch,
        train_steps=args.steps,
        checkpoint_steps=args.steps,
        train_summary_steps=50,
        warmup_epochs=1,
        optimizer="lars",
        learning_rate=1.0,
        learning_rate_scaling="sqrt",
        weight_decay=1e-4,
        temperature=0.5,
        color_jitter_strength=0.5,
        use_blur=True,
        global_bn=True,
        model_dir=os.path.join(tmp, "model"),
        compute_dtype="bfloat16",
    )
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    state = trainer.train(config)
    result = trainer.evaluate(config, state=state)

    con = result.get("eval/contrast_top_1_accuracy", 0.0)
    top1 = result["eval/label_top_1_accuracy"]
    ok_con = con > 0.5
    ok_top1 = top1 > 0.6
    print(f"{'PASS' if ok_con else 'FAIL'} eval/contrast_top_1 = {con:.3f} (bar 0.5, chance {1.0/(2*args.batch-1):.4f})")
    print(f"{'PASS' if ok_top1 else 'FAIL'} eval/label_top_1    = {top1:.3f} (bar 0.6, chance 0.25)")
    sys.exit(0 if (ok_con and ok_top1) else 1)


if __name__ == "__main__":
    main()
