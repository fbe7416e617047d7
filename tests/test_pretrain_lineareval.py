"""Flagship integration: contrastive pretraining must produce linearly
separable features — pretrain (NT-Xent, no labels used) -> warm-start ->
linear eval (frozen encoder, fine_tune_after_block=4) on color-separable
synthetic classes.  Exercises the full reference workflow of README.md:79-131
end to end at toy scale."""

import os

import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.training import trainer
from tests.test_learning import _make_separable_npz


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SIMCLR_SKIP_HEAVY") == "1",
    reason="~17 min on a 1-core host; set SIMCLR_SKIP_HEAVY=1 to skip",
)
def test_pretrain_then_linear_eval(tmp_path):
    npz = str(tmp_path / "sep.npz")
    _make_separable_npz(npz, n=512, num_classes=4)

    common = dict(
        dataset=f"npz:{npz}", image_size=32, resnet_depth=18,
        train_batch_size=64, eval_batch_size=64, train_summary_steps=20,
        warmup_epochs=0, steps_per_loop=1, compute_dtype="float32",
        use_blur=False, weight_decay=0.0,
    )

    # 1) contrastive pretrain (supervised head trains on stop-grad features
    #    via lineareval_while_pretraining, not influencing the encoder).
    pre = Config(train_mode="pretrain", optimizer="lars", learning_rate=1.0,
                 learning_rate_scaling="sqrt", temperature=0.5,
                 train_steps=50, checkpoint_steps=50,
                 color_jitter_strength=0.5,
                 model_dir=str(tmp_path / "pretrain"), **common)
    trainer.train(pre)

    # 2) linear eval: frozen encoder, train only the head from scratch.
    lin = Config(train_mode="finetune", fine_tune_after_block=4,
                 optimizer="momentum", learning_rate=0.4,
                 train_steps=30, checkpoint_steps=30, zero_init_logits_layer=True,
                 checkpoint=str(tmp_path / "pretrain"), global_bn=False,
                 model_dir=str(tmp_path / "lineareval"), **common)
    state = trainer.train(lin)
    result = trainer.evaluate(lin, state=state)

    # Features from unsupervised pretraining must beat chance (0.25) by a
    # wide margin on color-coded classes.
    assert result["eval/label_top_1_accuracy"] > 0.6, result
