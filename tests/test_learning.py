"""Learning sanity: supervised finetune on a linearly separable synthetic
dataset must reach high accuracy within a few dozen steps — validates the
whole loop (augment -> forward -> loss -> LARS/SGD -> BN stats -> eval)
end to end, not just shapes."""

import numpy as np
import pytest

import jax

from simclr_tpu.config import Config
from simclr_tpu.training import trainer


def _make_separable_npz(path, n=512, num_classes=4, size=32):
    rng = np.random.RandomState(0)
    labels = rng.randint(0, num_classes, size=n)
    images = rng.randint(0, 60, size=(n, size, size, 3)).astype(np.int32)
    # Class signal must survive random crop + flip (the finetune train path
    # crops): class k gets a global color tint, not a positional pattern.
    tints = np.array([[180, 0, 0], [0, 180, 0], [0, 0, 180], [150, 150, 0]])
    for i, k in enumerate(labels):
        images[i] += tints[k][None, None, :]
    np.savez(path, images=np.clip(images, 0, 255).astype(np.uint8), labels=labels)


@pytest.mark.slow
def test_supervised_finetune_learns(tmp_path):
    npz = str(tmp_path / "sep.npz")
    _make_separable_npz(npz)
    config = Config(
        dataset=f"npz:{npz}",
        image_size=32,
        resnet_depth=18,
        train_mode="finetune",
        fine_tune_after_block=-1,
        lineareval_while_pretraining=True,
        train_batch_size=64,
        eval_batch_size=64,
        train_steps=40,
        checkpoint_steps=40,
        train_summary_steps=10,
        warmup_epochs=0,
        steps_per_loop=1,  # keep CPU test compile small (no scan unroll)
        optimizer="momentum",
        learning_rate=0.05,
        learning_rate_scaling="linear",
        weight_decay=0.0,
        global_bn=True,
        model_dir=str(tmp_path / "model"),
        compute_dtype="float32",
        use_blur=False,
    )
    state = trainer.train(config)
    result = trainer.evaluate(config, state=state)
    assert result["eval/label_top_1_accuracy"] > 0.7, result
