"""Combined chaos drill (VERDICT r4 #8): SIGTERM mid-training on an 8-device
mesh -> preemption checkpoint -> elastic restore onto a 4-device mesh ->
train to completion.  test_preemption.py and test_elastic_resume.py prove
the two mechanisms separately; this composes them the way a real spot-VM
downsize does, and checks the composed run ends where an uninterrupted run
ends.

Bitwise equality holds for every step up to the preemption save (same mesh,
same batches).  After the elastic restore the surviving steps run on half
the devices, so collective reduction ORDER differs — final parameters agree
to float tolerance, the step count and data order exactly.
"""

import os
import signal

import jax
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import checkpoint as ckpt_lib
from simclr_tpu.training import trainer


class _SignalAtBatch:
    """Deliver SIGTERM to this process while the train loop consumes batch
    ``at`` (after the PreemptionGuard installed — see test_preemption.py)."""

    def __init__(self, inner, at: int):
        self.inner, self.at = inner, at

    def set_start_step(self, step):
        if hasattr(self.inner, "set_start_step"):
            self.inner.set_start_step(step)

    def __iter__(self):
        for i, batch in enumerate(iter(self.inner)):
            if i == self.at:
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch


def _checksum(params):
    return float(sum(np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
                     for x in jax.tree_util.tree_leaves(params)))


@pytest.mark.slow
def test_preempt_then_elastic_resume_on_smaller_mesh(tmp_path, monkeypatch):
    total_steps = 6
    base = dict(
        dataset="synthetic", num_images_default=64, image_size=32,
        resnet_depth=18, train_batch_size=16, eval_batch_size=16,
        train_steps=total_steps, checkpoint_steps=10_000, steps_per_loop=1,
        train_summary_steps=0, warmup_epochs=0, optimizer="momentum",
        learning_rate=0.01, compute_dtype="float32", use_blur=False,
    )

    # Uninterrupted reference run on the full 8-device mesh.
    ref = trainer.train(Config(model_dir=str(tmp_path / "ref"), **base))
    assert int(jax.device_get(ref.step)) == total_steps
    ref_sum = _checksum(ref.params)

    # Chaos run, phase 1: SIGTERM lands mid-loop -> preemption checkpoint.
    config = Config(model_dir=str(tmp_path / "chaos"), **base)
    real_build = trainer.build_dataset

    def build_with_signal(cfg, is_training):
        ds, info = real_build(cfg, is_training)
        return _SignalAtBatch(ds, at=3), info

    monkeypatch.setattr(trainer, "build_dataset", build_with_signal)
    state = trainer.train(config)
    monkeypatch.setattr(trainer, "build_dataset", real_build)
    preempted_at = int(jax.device_get(state.step))
    assert 0 < preempted_at < total_steps
    manager = ckpt_lib.create_manager(config.model_dir)
    assert manager.latest_step() == preempted_at

    # Phase 2: the replacement allocation has HALF the devices.  resume
    # restores the preemption checkpoint onto the 4-device mesh (elastic
    # cross-mesh restore) and set_start_step continues the data order.
    real_mesh = mesh_lib.create_mesh

    def half_mesh(cfg, devices=None):
        return real_mesh(cfg, devices=jax.devices()[:4])

    monkeypatch.setattr(trainer.mesh_lib, "create_mesh", half_mesh)
    try:
        final = trainer.train(config)
    finally:
        monkeypatch.setattr(trainer.mesh_lib, "create_mesh", real_mesh)

    assert int(jax.device_get(final.step)) == total_steps
    # Completed on the SMALL mesh.
    leaf = jax.tree_util.tree_leaves(final.params)[0]
    assert len(leaf.sharding.device_set) == 4
    # The post-resume steps ran on a different device count, so collective
    # reduction order differs from the uninterrupted run — agreement is to
    # float tolerance, not bitwise (pre-preemption steps ARE bitwise equal,
    # covered by test_elastic_resume.py).
    np.testing.assert_allclose(_checksum(final.params), ref_sum, rtol=1e-4)
    # The resumed run saved its final checkpoint at completion.
    assert ckpt_lib.create_manager(config.model_dir).latest_step() == total_steps
