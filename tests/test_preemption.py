"""Async checkpointing + preemption-safe training (SIGTERM -> clean
checkpoint-and-exit).  The reference has no preemption handling (SURVEY §5:
restart-resume only, losing up to checkpoint_steps of work on a TPU
maintenance event); here SIGTERM converts to a save at the next loop
boundary, and periodic saves are asynchronous (off the train critical
path)."""

import os
import signal
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.training import checkpoint as ckpt_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.state import TrainState


def _tiny_state(value: float) -> TrainState:
    return TrainState(
        step=jnp.asarray(3, jnp.int32),
        params={"dense": {"kernel": jnp.full((4, 2), value, jnp.float32)}},
        batch_stats={"bn": {"mean": jnp.zeros((2,), jnp.float32)}},
        opt_state={"momentum": jnp.ones((4, 2), jnp.float32)},
    )


def test_async_save_then_restore_roundtrip(tmp_path):
    """save(wait=False) returns before the files are final; a later
    wait_until_finished makes the checkpoint durable and restorable."""
    manager = ckpt_lib.create_manager(str(tmp_path / "ckpt"), keep_max=2)
    state = _tiny_state(0.5)
    ckpt_lib.save(manager, state, wait=False)
    manager.wait_until_finished()
    assert manager.latest_step() == 3

    restored = ckpt_lib.restore(manager, _tiny_state(0.0))
    np.testing.assert_array_equal(np.asarray(restored.params["dense"]["kernel"]),
                                  np.asarray(state.params["dense"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(restored.opt_state["momentum"]),
                                  np.asarray(state.opt_state["momentum"]))
    assert int(restored.step) == 3


def test_preemption_guard_outside_main_thread_is_noop():
    """Installing from a non-main thread must degrade gracefully (training
    embedded in a host framework), not raise."""
    result = {}

    def run():
        guard = trainer.PreemptionGuard().install()
        result["triggered"] = guard.triggered
        guard.uninstall()  # must be a no-op, not raise

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert result["triggered"] is False


def test_guard_sync_single_process_is_local_flag():
    """guard.sync() with one process is just the local flag (no collective)."""
    guard = trainer.PreemptionGuard()
    assert guard.sync() is False
    guard.triggered = True
    assert guard.sync() is True


class _RaiseAtBatch:
    """Dataset that raises mid-training, to exercise the trainer's cleanup
    path (ADVICE r3: an exception must not leak the SIGTERM handler or
    abandon an in-flight async save)."""

    def __init__(self, inner, at: int):
        self.inner, self.at = inner, at

    def set_start_step(self, step):
        if hasattr(self.inner, "set_start_step"):
            self.inner.set_start_step(step)

    def __iter__(self):
        for i, batch in enumerate(iter(self.inner)):
            if i == self.at:
                raise RuntimeError("injected data failure")
            yield batch


@pytest.mark.slow
def test_exception_mid_training_restores_sigterm_and_finalizes(
        tmp_path, monkeypatch):
    """A crash inside the train loop must still wait for async saves,
    uninstall the SIGTERM handler, and close the metric writer."""
    config = Config(
        dataset="synthetic", num_images_default=64, image_size=32,
        resnet_depth=18, train_batch_size=16, eval_batch_size=16,
        train_steps=10_000, checkpoint_steps=2, steps_per_loop=1,
        train_summary_steps=0, warmup_epochs=0, optimizer="momentum",
        learning_rate=0.01, model_dir=str(tmp_path / "model"),
        compute_dtype="float32", use_blur=False,
    )
    real_build = trainer.build_dataset

    def build_with_raise(cfg, is_training):
        ds, info = real_build(cfg, is_training)
        return _RaiseAtBatch(ds, at=6), info

    monkeypatch.setattr(trainer, "build_dataset", build_with_raise)
    with pytest.raises(RuntimeError, match="injected data failure"):
        trainer.train(config)
    # Handler restored despite the crash (try/finally), and the periodic
    # async save issued at step 2/4 was made durable before propagating.
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
    manager = ckpt_lib.create_manager(config.model_dir)
    assert manager.latest_step() is not None


class _SignalAtBatch:
    """Wrap a train dataset so SIGTERM is raised while the train loop is
    consuming batch ``at`` — deterministically after the PreemptionGuard is
    installed (the prefetch queue holds at most depth+1 batches, so batch
    ``at`` >= depth+2 is only produced once the loop has consumed some)."""

    def __init__(self, inner, at: int):
        self.inner = inner
        self.at = at

    def set_start_step(self, step):
        if hasattr(self.inner, "set_start_step"):
            self.inner.set_start_step(step)

    def __iter__(self):
        for i, batch in enumerate(iter(self.inner)):
            if i == self.at:
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch


@pytest.mark.slow
def test_sigterm_saves_checkpoint_and_exits(tmp_path, monkeypatch):
    """A SIGTERM mid-training (TPU maintenance event / spot preemption)
    checkpoints the current state and exits the loop; resume-latest picks up
    from exactly that step."""
    config = Config(
        dataset="synthetic",
        num_images_default=64,
        image_size=32,
        resnet_depth=18,
        train_batch_size=16,
        eval_batch_size=16,
        train_steps=10_000,        # far more than the signal allows
        checkpoint_steps=10_000,   # no periodic save before the signal
        steps_per_loop=1,
        train_summary_steps=0,
        warmup_epochs=0,
        optimizer="momentum",
        learning_rate=0.01,
        model_dir=str(tmp_path / "model"),
        compute_dtype="float32",
        use_blur=False,
    )
    real_build = trainer.build_dataset

    def build_with_signal(cfg, is_training):
        ds, info = real_build(cfg, is_training)
        return _SignalAtBatch(ds, at=6), info

    monkeypatch.setattr(trainer, "build_dataset", build_with_signal)
    state = trainer.train(config)
    stopped_at = int(jax.device_get(state.step))
    assert 0 < stopped_at < config.train_steps

    manager = ckpt_lib.create_manager(config.model_dir)
    assert manager.latest_step() == stopped_at
    # And the default SIGTERM disposition is restored after train().
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
