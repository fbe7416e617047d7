"""Continuous-eval watcher test: evaluates each existing checkpoint and
terminates once the final-step checkpoint has been evaluated
(run.py:421-435 semantics)."""

import glob
import os

import pytest

from simclr_tpu.config import Config
from simclr_tpu.training import trainer


@pytest.mark.slow
def test_continuous_eval_consumes_checkpoints(tmp_path):
    config = Config(
        dataset="synthetic", num_images_default=64, image_size=32,
        resnet_depth=18, train_batch_size=16, eval_batch_size=16,
        train_steps=4, checkpoint_steps=2, eval_steps=1, train_summary_steps=2,
        warmup_epochs=0, steps_per_loop=1, optimizer="lars",
        model_dir=str(tmp_path / "model"), compute_dtype="float32",
        use_blur=False,
    )
    trainer.train(config)  # writes checkpoints at steps 2 and 4
    trainer.continuous_eval(config, min_interval_secs=1)  # must terminate
    results = glob.glob(os.path.join(config.model_dir, "result_*.json"))
    assert results, "continuous eval wrote no results"
    assert os.path.exists(os.path.join(config.model_dir, "result_4.json"))
