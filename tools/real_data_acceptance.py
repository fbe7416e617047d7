"""Unattended real-data acceptance: run a full reference recipe —
pretrain, then linear eval — against a real dataset and check the
published accuracy bar (VERDICT r2 #10).

The reference's de-facto acceptance contracts (BASELINE.md):
  * cifar10  — R18 pretrain (batch 512, 1000 epochs, temp 0.5, lr 1.0,
               no blur, jitter 0.5; /root/reference/README.md:79-84) then
               linear-head finetune (momentum, lr 0.1, frozen encoder;
               README.md:120-128) => ~91% top-1 (README.md:131).
  * imagenet — R50 pretrain (batch 4096, 100 epochs, temp 0.1, lr 0.075
               sqrt; README.md:100-107) then linear eval (momentum lr 0.1,
               90 epochs; README.md:135-146) => ~64.5% top-1
               (README.md:146); the released 800-epoch SimCLRv2 R50 1x
               reaches 71.7 (README.md:21).

Data arrives as a TFDS name (with --data_dir) or an npz path
(`npz:/path/arrays.npz` with 'images'/'labels', plus --eval_data for the
held-out split).  Nothing here needs network access.

The --dry_run flag executes the identical two-phase plumbing on a tiny
synthetic npz (seconds on CPU) so the unattended path stays proven while
the real datasets remain unavailable on this host; tests/test_examples.py
smokes it.

Usage:
  python tools/real_data_acceptance.py --recipe cifar10 \
      --data npz:/data/cifar10_train.npz --eval_data npz:/data/cifar10_test.npz
  python tools/real_data_acceptance.py --recipe cifar10 --data cifar10 \
      --data_dir /tfds            # TFDS variant (train/test splits)
  python tools/real_data_acceptance.py --dry_run

Exits 0 with a PASS line iff the final eval top-1 clears the bar.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recipe_configs(recipe: str, data: str, eval_data, data_dir, model_dir,
                   scale: float = 1.0):
    """(pretrain_config, lineareval_config, top1_bar) for a named recipe.

    ``scale`` < 1 shrinks epochs/batch for dry runs; flag values follow the
    reference commands verbatim otherwise."""
    from simclr_tpu.config import Config

    common = dict(dataset=data, data_dir=data_dir)
    if eval_data:
        common["eval_dataset"] = eval_data
    common = {k: v for k, v in common.items() if v is not None}

    if recipe == "cifar10":
        pre = Config(
            train_mode="pretrain", train_batch_size=max(8, int(512 * scale)),
            train_epochs=max(1, int(1000 * scale)), learning_rate=1.0,
            weight_decay=1e-4, temperature=0.5, image_size=32,
            eval_split="test", resnet_depth=18, use_blur=False,
            color_jitter_strength=0.5, model_dir=os.path.join(model_dir, "pretrain"),
            **common)
        lin = Config(
            mode="train_then_eval", train_mode="finetune",
            fine_tune_after_block=4, zero_init_logits_layer=True,
            variable_schema=r"(?!global_step|(?:.*/|^)Momentum|head)",
            global_bn=False, optimizer="momentum", learning_rate=0.1,
            weight_decay=0.0, train_epochs=max(1, int(100 * scale)),
            train_batch_size=max(8, int(512 * scale)), warmup_epochs=0,
            image_size=32, eval_split="test", resnet_depth=18,
            checkpoint=pre.model_dir,
            model_dir=os.path.join(model_dir, "lineareval"), **common)
        bar = 0.91
    elif recipe == "imagenet":
        pre = Config(
            train_mode="pretrain", train_batch_size=max(8, int(4096 * scale)),
            train_epochs=max(1, int(100 * scale)), temperature=0.1,
            learning_rate=0.075, learning_rate_scaling="sqrt",
            weight_decay=1e-4, image_size=224, eval_split="validation",
            resnet_depth=50, model_dir=os.path.join(model_dir, "pretrain"),
            **common)
        lin = Config(
            mode="train_then_eval", train_mode="finetune",
            fine_tune_after_block=4, zero_init_logits_layer=True,
            variable_schema=r"(?!global_step|(?:.*/|^)Momentum|head)",
            global_bn=False, optimizer="momentum", learning_rate=0.1,
            weight_decay=1e-6, train_epochs=max(1, int(90 * scale)),
            train_batch_size=max(8, int(4096 * scale)), warmup_epochs=0,
            image_size=224, eval_split="validation", resnet_depth=50,
            checkpoint=pre.model_dir,
            model_dir=os.path.join(model_dir, "lineareval"), **common)
        bar = 0.645  # README.md:146 recipe bar; released 800-ep ckpt: 71.7
    elif recipe == "digits":
        # REAL natural images available offline: sklearn's handwritten
        # digits (1797 genuine 8x8 scans, upsampled to 32x32 RGB by
        # make_digits_npz).  Not a reference benchmark, but the only
        # real-image learning acceptance this no-egress host can execute —
        # same two-phase contract as cifar10 at digit scale.  Chance is
        # 0.1; an R18 SimCLR pretrain + linear eval clears 0.85 easily.
        pre = Config(
            train_mode="pretrain", train_batch_size=max(8, int(256 * scale)),
            train_epochs=max(1, int(300 * scale)), learning_rate=1.0,
            weight_decay=1e-4, temperature=0.5, image_size=32,
            eval_split="test", resnet_depth=18, use_blur=False,
            color_jitter_strength=0.5,
            # ~5.6 steps/epoch at this scale: the default 1-epoch checkpoint
            # cadence would save every 5 steps and dominate the run.
            checkpoint_epochs=100,
            model_dir=os.path.join(model_dir, "pretrain"), **common)
        lin = Config(
            mode="train_then_eval", train_mode="finetune",
            fine_tune_after_block=4, zero_init_logits_layer=True,
            variable_schema=r"(?!global_step|(?:.*/|^)Momentum|head)",
            global_bn=False, optimizer="momentum", learning_rate=0.1,
            weight_decay=0.0, train_epochs=max(1, int(50 * scale)),
            train_batch_size=max(8, int(256 * scale)), warmup_epochs=0,
            image_size=32, eval_split="test", resnet_depth=18,
            checkpoint=pre.model_dir, checkpoint_epochs=25,
            model_dir=os.path.join(model_dir, "lineareval"), **common)
        # First full run (TPU, 2026-08-19) scored 0.9638; the bar sits just
        # under it so a regression can't hide beneath the original 0.85
        # feasibility bar (VERDICT r4 weak #7).
        bar = 0.93
    else:
        raise ValueError(f"unknown recipe {recipe!r}")
    return pre, lin, bar


def make_label_fraction_npz(train_npz, fraction, out_path, seed=0):
    """Balanced per-class label subset of an npz train file: keep
    max(1, round(fraction * n_c)) examples of each class, mirroring the
    reference's per-class ImageNet subset ID lists
    (/root/reference/imagenet_subsets/ — ~13 and ~128 images per class for
    1%/10%).  Deterministic under ``seed``."""
    import numpy as np

    data = np.load(train_npz)
    images, labels = data["images"], data["labels"]
    rng = np.random.RandomState(seed)
    keep = []
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        n_keep = max(1, int(round(len(idx) * fraction)))
        keep.append(rng.permutation(idx)[:n_keep])
    keep = np.sort(np.concatenate(keep))
    np.savez(out_path, images=images[keep], labels=labels[keep])
    return out_path, len(keep)


def semisup_finetune_config(data, eval_data, checkpoint_dir, model_dir,
                            epochs, batch, image_size=32, resnet_depth=18):
    """The reference's semi-supervised whole-network fine-tune, flag for
    flag (/root/reference/README.md:157-167): fine_tune_after_block=-1,
    zero-init logits, variable_schema keeping the PROJECTION head (SimCLRv2
    warm start), global BN, LARS lr 0.005 sqrt-scaled, weight decay 0,
    num_proj_layers=3 + ft_proj_selector=1.  Only epochs/batch/image size
    are re-scaled to the dataset (as the reference itself varies them
    between ImageNet and CIFAR commands)."""
    from simclr_tpu.config import Config

    return Config(
        mode="train_then_eval", train_mode="finetune",
        fine_tune_after_block=-1, zero_init_logits_layer=True,
        variable_schema=r"(?!global_step|(?:.*/|^)Momentum|head_supervised)",
        global_bn=True, optimizer="lars", learning_rate=0.005,
        learning_rate_scaling="sqrt", weight_decay=0.0,
        train_epochs=epochs, train_batch_size=batch, warmup_epochs=0,
        image_size=image_size, eval_split="test", resnet_depth=resnet_depth,
        num_proj_layers=3, ft_proj_selector=1,
        checkpoint=checkpoint_dir,
        checkpoint_epochs=max(1, epochs // 4),
        dataset=data, eval_dataset=eval_data, model_dir=model_dir)


# First-run calibration (TPU v5e-lite, 2026-08-19, unattended): 1pct
# (13 labeled digits) top-1 0.7604, 10pct (144) 0.9331 — chance 0.1.  Bars
# sit a few points under the observed numbers so real regressions (a broken
# warm start, a dead projection-head graft) fail loudly while day-to-day
# training noise does not.  Recorded in docs/PARITY.md.
SEMISUP_BARS = {0.01: 0.70, 0.10: 0.85}

# First-run calibration (TPU v5e-lite, 2026-08-19, unattended): student
# top-1 0.9721 — ABOVE its 0.9331 teacher (10% labels, chance 0.1), the
# SimCLRv2 self-training effect: KD on unlabeled data beats the teacher's
# own label-limited fine-tune.  Bar sits a few points under the observed
# number, like SEMISUP_BARS.  Recorded in docs/PARITY.md.
DISTILL_BAR = 0.93


def run_distill(data, eval_data, model_dir, scale=1.0, bar=None,
                label_fraction=0.10, student_upsample=3,
                distill_steps=2000, distill_batch=64):
    """Distillation / self-training acceptance (reference C19,
    tf2/colabs/distillation_self_training.ipynb): pretrain on ALL images,
    fine-tune a teacher on ``label_fraction`` of labels (the SimCLRv2
    semi-supervised story, README.md:157-167), then distill the teacher
    into the notebook's small StudentConvNet with the temperature-scaled KD
    loss on the UNLABELED training images (cell 8: no ground-truth labels
    reach the student), and check the student's test top-1 against the bar.

    The student sees ``student_upsample``× nearest-upsampled images (the
    notebook's ConvNet has VALID 3x3 convs + two 4x4 pools sized for
    larger-than-32px inputs); the teacher consumes the exact original
    pixels via stride subsampling, so no information is invented."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from simclr_tpu.distill import (StudentConvNet, default_student_optimizer,
                                    make_distill_step)
    from simclr_tpu.export import EXPORT_DIR, load_serving
    from simclr_tpu.training import trainer

    assert data.startswith("npz:") and eval_data.startswith("npz:"), (
        "distill acceptance needs npz train/test sources")
    bar = DISTILL_BAR if bar is None else bar

    pre, _, _ = recipe_configs("digits", data, eval_data, None, model_dir,
                               scale)
    print(f"[acceptance] phase 1/4: pretrain ({pre.train_epochs} epochs, "
          f"batch {pre.train_batch_size})", flush=True)
    trainer.train(pre)

    tag = f"{int(round(label_fraction * 100))}pct"
    sub_npz, n_sub = make_label_fraction_npz(
        data[4:], label_fraction, os.path.join(model_dir, f"labels_{tag}.npz"))
    batch = max(8, min(32, n_sub // 4))
    steps_per_epoch = max(1, n_sub // batch)
    epochs = max(1, int(round(1000 * scale / steps_per_epoch)))
    ft = semisup_finetune_config(
        f"npz:{sub_npz}", eval_data, pre.model_dir,
        os.path.join(model_dir, f"teacher_{tag}"), epochs, batch)
    print(f"[acceptance] phase 2/4: teacher fine-tune on {tag} "
          f"({n_sub} labeled images, {epochs} epochs)", flush=True)
    trainer.train(ft)
    teacher_eval = trainer.evaluate(ft)  # also exports the serving bundle
    teacher_top1 = float(teacher_eval["eval/label_top_1_accuracy"])

    # Teacher = the serving artifact, exactly like the notebook (cell 10
    # loads the finetuned SavedModel and reads logits_sup).
    base = os.path.join(ft.model_dir, EXPORT_DIR)
    step_dir = str(max(int(d) for d in os.listdir(base) if d.isdigit()))
    serve = load_serving(os.path.join(base, step_dir))
    up = student_upsample

    def teacher_fn(images):
        return serve(images[:, ::up, ::up, :])["logits_sup"]

    train_arrs = np.load(data[4:])
    images_u8 = np.kron(train_arrs["images"],
                        np.ones((1, up, up, 1), np.uint8))
    num_classes = int(train_arrs["labels"].max()) + 1

    distill_steps = max(20, int(round(distill_steps * scale)))
    student = StudentConvNet(num_classes=num_classes)
    sample = jnp.zeros((2,) + images_u8.shape[1:], jnp.float32)
    variables = student.init(jax.random.PRNGKey(1), sample, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    # Notebook recipe lr 2.0 is calibrated for batch 512; sqrt-scale down.
    lr = 2.0 * float(np.sqrt(distill_batch / 512.0))
    tx = default_student_optimizer(distill_steps, learning_rate=lr)
    opt_state = tx.init(params)
    step = jax.jit(make_distill_step(student, teacher_fn, tx, temperature=1.0))

    print(f"[acceptance] phase 3/4: distill ({distill_steps} steps, batch "
          f"{distill_batch}, {len(images_u8)} unlabeled images)", flush=True)
    rng = np.random.RandomState(0)
    order = rng.permutation(len(images_u8))
    cursor = 0
    for i in range(distill_steps):
        if cursor + distill_batch > len(order):
            order = rng.permutation(len(images_u8))
            cursor = 0
        idx = order[cursor:cursor + distill_batch]
        cursor += distill_batch
        images = jnp.asarray(images_u8[idx], jnp.float32) / 255.0
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, images)
        if i % max(1, distill_steps // 10) == 0:
            print(f"  distill step {i}: kd_loss={float(loss):.4f}", flush=True)

    print("[acceptance] phase 4/4: student eval", flush=True)
    test_arrs = np.load(eval_data[4:])
    test_u8 = np.kron(test_arrs["images"], np.ones((1, up, up, 1), np.uint8))
    labels = test_arrs["labels"]
    infer = jax.jit(lambda im: jnp.argmax(student.apply(
        {"params": params, "batch_stats": batch_stats}, im, train=False),
        axis=-1))
    preds = []
    for i in range(0, len(test_u8), 256):
        im = jnp.asarray(test_u8[i:i + 256], jnp.float32) / 255.0
        preds.append(np.asarray(infer(im)))
    student_top1 = float(np.mean(np.concatenate(preds) == labels))

    verdict = {"recipe": "digits_distill", "teacher_top_1": teacher_top1,
               "student_top_1": student_top1, "bar": bar,
               "n_labeled": n_sub, "pass": student_top1 >= bar}
    with open(os.path.join(model_dir, "acceptance.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict), flush=True)
    print(("PASS" if verdict["pass"] else "FAIL") +
          f": digits_distill student top-1 {student_top1:.4f} vs bar {bar} "
          f"(teacher {teacher_top1:.4f})", flush=True)
    return verdict


def run_semisup(data, eval_data, model_dir, scale=1.0, bars=None,
                fractions=(0.01, 0.10)):
    """Semi-supervised label-fraction acceptance (VERDICT r4 #1): pretrain
    on ALL images, then fine-tune the WHOLE network on 1% / 10% of labels
    with the exact reference flag shape, and check each top-1 bar.

    The reference's contract is /root/reference/README.md:157-167 (ImageNet
    1%/10% subsets); this executes the same two-phase recipe at digits
    scale — the only real-image dataset available offline."""
    import numpy as np

    from simclr_tpu.training import trainer

    assert data.startswith("npz:") and eval_data.startswith("npz:"), (
        "semisup acceptance needs npz train/test sources")
    pre, _, _ = recipe_configs("digits", data, eval_data, None, model_dir,
                               scale)
    print(f"[acceptance] phase 1/{1 + len(fractions)}: pretrain "
          f"({pre.train_epochs} epochs, batch {pre.train_batch_size}, "
          f"num_proj_layers={pre.num_proj_layers})", flush=True)
    trainer.train(pre)

    bars = {**SEMISUP_BARS, **(bars or {})}
    results = {}
    for i, frac in enumerate(fractions):
        tag = f"{int(round(frac * 100))}pct"
        sub_npz, n_sub = make_label_fraction_npz(
            data[4:], frac, os.path.join(model_dir, f"labels_{tag}.npz"))
        # Constant optimization budget across fractions (~1000 steps), like
        # the reference's per-subset epoch tuning (60 epochs at 1% of
        # ImageNet != 60 at 10%).
        batch = max(8, min(32, n_sub // 4))
        steps_per_epoch = max(1, n_sub // batch)
        epochs = max(1, int(round(1000 * scale / steps_per_epoch)))
        ft = semisup_finetune_config(
            f"npz:{sub_npz}", eval_data, pre.model_dir,
            os.path.join(model_dir, f"finetune_{tag}"), epochs, batch)
        print(f"[acceptance] phase {2 + i}/{1 + len(fractions)}: fine-tune "
              f"on {tag} ({n_sub} labeled images, {epochs} epochs, "
              f"batch {batch})", flush=True)
        trainer.train(ft)
        result = trainer.evaluate(ft)
        top1 = float(result["eval/label_top_1_accuracy"])
        bar = bars.get(frac, 0.0)
        results[tag] = {"top_1": top1, "bar": bar, "n_labeled": n_sub,
                        "pass": top1 >= bar}
        print(("PASS" if top1 >= bar else "FAIL") +
              f": digits_semisup {tag} fine-tune top-1 {top1:.4f} vs bar {bar}",
              flush=True)

    verdict = {"recipe": "digits_semisup", "results": results,
               "pass": all(r["pass"] for r in results.values())}
    with open(os.path.join(model_dir, "acceptance.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict), flush=True)
    return verdict


def run(recipe, data, eval_data, data_dir, model_dir, scale=1.0, bar=None):
    from simclr_tpu.training import trainer

    pre, lin, recipe_bar = recipe_configs(recipe, data, eval_data, data_dir,
                                          model_dir, scale)
    bar = recipe_bar if bar is None else bar
    print(f"[acceptance] phase 1/2: pretrain "
          f"({pre.train_epochs} epochs, batch {pre.train_batch_size})",
          flush=True)
    trainer.train(pre)
    print("[acceptance] phase 2/2: linear eval "
          f"({lin.train_epochs} epochs)", flush=True)
    trainer.train(lin)
    result = trainer.evaluate(lin)
    top1 = float(result["eval/label_top_1_accuracy"])

    verdict = {"recipe": recipe, "top_1": top1, "bar": bar,
               "pass": top1 >= bar}
    with open(os.path.join(model_dir, "acceptance.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict), flush=True)
    print(("PASS" if verdict["pass"] else "FAIL") +
          f": {recipe} linear-eval top-1 {top1:.4f} vs bar {bar}", flush=True)
    return verdict


def make_dry_npz(dirname, n=256, num_classes=4, size=32):
    """Tiny tinted synthetic train/test npz pair (tools/tpu_acceptance.py
    tint scheme) — enough signal that even a 2-epoch run beats chance."""
    import numpy as np

    paths = []
    for split, seed in (("train", 0), ("test", 1)):
        rng = np.random.RandomState(seed)
        labels = rng.randint(0, num_classes, size=n)
        low = rng.randint(0, 160, size=(n, 4, 4, 3))
        images = np.kron(low, np.ones((1, size // 4, size // 4, 1))).astype(np.int32)
        tints = np.array([[90, 0, 0], [0, 90, 0], [0, 0, 90], [70, 70, 0]])
        images += tints[labels][:, None, None, :]
        path = os.path.join(dirname, f"dry_{split}.npz")
        np.savez(path, images=np.clip(images, 0, 255).astype(np.uint8),
                 labels=labels)
        paths.append(path)
    return paths


def make_digits_npz(dirname, test_fraction=0.2, size=32):
    """Write train/test npz of sklearn's REAL handwritten digits: 1797
    genuine 8x8 grayscale scans -> uint8 (n, 32, 32, 3) by 4x nearest
    upsampling + channel replication.  Deterministic stratified-ish split
    (plain shuffled split; classes are near-balanced)."""
    import numpy as np
    from sklearn.datasets import load_digits

    d = load_digits()
    images = np.clip(d.images / 16.0 * 255.0, 0, 255).astype(np.uint8)
    rep = size // images.shape[1]
    images = np.kron(images, np.ones((1, rep, rep), np.uint8))
    images = np.repeat(images[..., None], 3, axis=-1)
    labels = d.target.astype(np.int64)

    order = np.random.RandomState(0).permutation(len(images))
    n_test = int(len(images) * test_fraction)
    splits = {"test": order[:n_test], "train": order[n_test:]}
    paths = {}
    for split, idx in splits.items():
        path = os.path.join(dirname, f"digits_{split}.npz")
        np.savez(path, images=images[idx], labels=labels[idx])
        paths[split] = path
    return paths["train"], paths["test"]


def _require_npz_pair(ap, args):
    """The semisup/distill recipes need BOTH --data and --eval_data as
    npz: paths (label-subset filtering + a dedicated held-out test split);
    validate up front instead of failing later with a confusing np.load
    error after `args.data[4:]` silently strips a non-npz value."""
    if not (args.data and args.data.startswith("npz:")):
        ap.error(f"--recipe {args.recipe} needs --data npz:/path/train.npz "
                 f"(got {args.data!r})")
    if not (args.eval_data and args.eval_data.startswith("npz:")):
        ap.error(f"--recipe {args.recipe} needs --eval_data "
                 f"npz:/path/test.npz (got {args.eval_data!r})")
    return args.data[4:], args.eval_data[4:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", default="cifar10",
                    choices=["cifar10", "imagenet", "digits",
                             "digits_semisup", "digits_distill"])
    ap.add_argument("--data", help="TFDS name or npz:/path/train.npz")
    ap.add_argument("--eval_data", default=None,
                    help="npz:/path/test.npz for npz sources")
    ap.add_argument("--data_dir", default=None, help="TFDS data dir")
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--bar", type=float, default=None,
                    help="Override the accuracy bar")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="Shrink epochs/batch by this factor (quick runs)")
    ap.add_argument("--dry_run", action="store_true",
                    help="Prove the two-phase plumbing on tiny synthetic "
                         "npz data (bar 0.3 over 0.25 chance)")
    args = ap.parse_args()

    model_dir = args.model_dir or tempfile.mkdtemp(prefix="simclr_acceptance_")
    os.makedirs(model_dir, exist_ok=True)

    if args.dry_run and args.recipe == "digits_semisup":
        # Plumbing-only: tiny synthetic npz, ~a dozen steps per phase, bars
        # at 0 — proves the pretrain -> label-subset -> whole-network
        # fine-tune chain end to end on CPU in minutes.
        train_npz, test_npz = make_dry_npz(model_dir, n=128)
        verdict = run_semisup(f"npz:{train_npz}", f"npz:{test_npz}",
                              model_dir, scale=0.01,
                              bars={0.01: 0.0, 0.10: 0.0},
                              fractions=(0.10, 0.25))
    elif args.dry_run:
        # Sized for the 1-core CI host: 128 images x 5 pretrain epochs
        # (80 steps) + 1 linear epoch.  The earlier 10-epoch/256-image dry
        # run proved the same plumbing but ran ~40 min inside the full
        # pytest suite (per-step dispatch on the virtual 8-device CPU mesh
        # dominates); learning quality is covered by tools/tpu_acceptance.py.
        train_npz, test_npz = make_dry_npz(model_dir, n=128)
        verdict = run("cifar10", f"npz:{train_npz}", f"npz:{test_npz}",
                      None, model_dir, scale=0.005,
                      bar=0.3 if args.bar is None else args.bar)
    elif args.recipe == "digits_semisup":
        if args.data:
            train_npz, test_npz = _require_npz_pair(ap, args)
        else:
            # Self-contained like --recipe digits: build the sklearn digits
            # npz pair (1797 real 8x8 scans).
            train_npz, test_npz = make_digits_npz(model_dir)
        verdict = run_semisup(f"npz:{train_npz}", f"npz:{test_npz}",
                              model_dir, scale=args.scale)
    elif args.recipe == "digits_distill":
        if args.data:
            train_npz, test_npz = _require_npz_pair(ap, args)
        else:
            train_npz, test_npz = make_digits_npz(model_dir)
        verdict = run_distill(f"npz:{train_npz}", f"npz:{test_npz}",
                              model_dir, scale=args.scale, bar=args.bar)
    elif args.recipe == "digits" and not args.data:
        # Self-contained: the digits scans ship with sklearn (no egress
        # needed), so the recipe builds its own npz pair.
        train_npz, test_npz = make_digits_npz(model_dir)
        verdict = run("digits", f"npz:{train_npz}", f"npz:{test_npz}",
                      None, model_dir, scale=args.scale, bar=args.bar)
    else:
        if not args.data:
            ap.error("--data is required without --dry_run")
        verdict = run(args.recipe, args.data, args.eval_data, args.data_dir,
                      model_dir, scale=args.scale, bar=args.bar)
    sys.exit(0 if verdict["pass"] else 1)


if __name__ == "__main__":
    main()
