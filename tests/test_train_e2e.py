"""End-to-end smoke: pretrain a tiny model on synthetic data over the
8-device mesh, checkpoint, resume, evaluate, finetune-warm-start."""

import glob
import json
import os

import jax
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.training import trainer


def _tiny_config(tmp_path, **kw):
    base = dict(
        dataset="synthetic",
        num_images_default=64,
        image_size=32,
        resnet_depth=18,
        train_batch_size=16,
        eval_batch_size=16,
        train_steps=3,
        checkpoint_steps=2,
        eval_steps=2,
        train_summary_steps=1,
        warmup_epochs=0,
        optimizer="lars",
        learning_rate=0.1,
        model_dir=str(tmp_path / "model"),
        compute_dtype="float32",  # CPU test: avoid bf16 emulation cost
        use_blur=False,           # keep the CPU compile small
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_pretrain_eval_resume(tmp_path):
    config = _tiny_config(tmp_path)
    state = trainer.train(config)
    assert int(jax.device_get(state.step)) == 3

    # flags.json artifact
    flags = json.load(open(os.path.join(config.model_dir, "flags.json")))
    assert flags["resnet_depth"] == 18

    # Evaluate from the saved checkpoint.
    result = trainer.evaluate(config)
    assert 0.0 <= result["eval/label_top_1_accuracy"] <= 1.0
    assert os.path.exists(os.path.join(config.model_dir, "result.json"))
    assert glob.glob(os.path.join(config.model_dir, "result_*.json"))

    # Resume: extending train_steps continues from step 3; exercise the
    # scan-based steps_per_loop device loop on the way.
    config2 = config.replace(train_steps=5, steps_per_loop=2)
    state2 = trainer.train(config2)
    assert int(jax.device_get(state2.step)) == 5


@pytest.mark.slow
def test_finetune_warm_start_from_pretrain(tmp_path):
    pre = _tiny_config(tmp_path, model_dir=str(tmp_path / "pretrain"))
    trainer.train(pre)

    ft = _tiny_config(
        tmp_path,
        model_dir=str(tmp_path / "finetune"),
        train_mode="finetune",
        fine_tune_after_block=4,
        checkpoint=str(tmp_path / "pretrain"),
        zero_init_logits_layer=True,
        optimizer="momentum",
        train_steps=2,
    )
    state = trainer.train(ft)
    assert int(jax.device_get(state.step)) == 2


@pytest.mark.slow
def test_train_summary_steps_zero_disables_summaries(tmp_path):
    """--train_summary_steps=0 = summaries off (reference run.py:82-84; the
    flagship ImageNet recipes use it).  Must train without dividing by zero
    and write no train scalars."""
    config = _tiny_config(tmp_path, train_summary_steps=0, train_steps=3)
    state = trainer.train(config)
    assert int(jax.device_get(state.step)) == 3
    jsonl = os.path.join(config.model_dir, "metrics.jsonl")
    if os.path.exists(jsonl):
        lines = [json.loads(l) for l in open(jsonl) if l.strip()]
        assert not any(k.startswith("train/") for l in lines for k in l), lines


@pytest.mark.slow
def test_linear_eval_recipe_shape(tmp_path):
    """The reference linear-eval recipe's exact flag combination
    (README.md:119-127): momentum + global_bn=False (ghost BN on the GSPMD
    path) + fine_tune_after_block=4 + variable_schema + zero-init head,
    warm-started from a pretrain run, trained and evaluated."""
    pre = _tiny_config(tmp_path, model_dir=str(tmp_path / "pretrain"))
    trainer.train(pre)

    ft = _tiny_config(
        tmp_path,
        model_dir=str(tmp_path / "lineareval"),
        train_mode="finetune",
        fine_tune_after_block=4,
        checkpoint=str(tmp_path / "pretrain"),
        zero_init_logits_layer=True,
        variable_schema="(?!global_step|(?:.*/|^)Momentum|head)",
        global_bn=False,
        optimizer="momentum",
        learning_rate=0.1,
        weight_decay=0.0,
        train_steps=2,
    )
    state = trainer.train(ft)
    assert int(jax.device_get(state.step)) == 2
    result = trainer.evaluate(ft)
    assert 0.0 <= result["eval/label_top_1_accuracy"] <= 1.0
