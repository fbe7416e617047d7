"""LARS / schedule / weight-decay-policy tests vs NumPy oracles
(SURVEY.md §4: 'LARS step equivalence vs a NumPy oracle')."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import add_weight_decay, build_optimizer, masked, trainable_mask
from simclr_tpu.optim.lars import lars, param_path_strings
from simclr_tpu.optim.schedule import warmup_cosine_schedule, scaled_learning_rate


def _lars_oracle(w, g, v, lr, momentum, wd, eeta, use_wd, do_adapt):
    """Classic-momentum LARS single step (tf2/lars_optimizer.py:99-117)."""
    w, g, v = map(lambda x: np.asarray(x, np.float64), (w, g, v))
    if use_wd:
        g = g + wd * w
    trust = 1.0
    if do_adapt:
        w_norm = np.linalg.norm(w)
        g_norm = np.linalg.norm(g)
        if w_norm > 0 and g_norm > 0:
            trust = eeta * w_norm / g_norm
    scaled_lr = lr * trust
    next_v = momentum * v + scaled_lr * g
    return w - next_v, next_v


def test_lars_matches_oracle_with_exclusions():
    params = {
        "resnet": {
            "conv2d": {"kernel": jnp.array([[1.0, 2.0], [3.0, 4.0]])},
            "batch_norm": {"scale": jnp.array([1.0, 1.0]), "bias": jnp.array([0.1, 0.2])},
        },
        "head_supervised": {"dense": {"kernel": jnp.array([[0.5, -0.5]])}},
    }
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    lr, mom, wd, eeta = 0.2, 0.9, 1e-4, 1e-3

    tx = lars(lr, momentum=mom, weight_decay=wd)
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)

    # conv kernel: decayed + adapted
    w = np.array([[1.0, 2.0], [3.0, 4.0]])
    exp, _ = _lars_oracle(w, 0.1 * np.ones((2, 2)), 0, lr, mom, wd, eeta, True, True)
    np.testing.assert_allclose(np.asarray(new_params["resnet"]["conv2d"]["kernel"]), exp, rtol=1e-6)

    # batch_norm scale: excluded from wd AND adaptation -> plain momentum SGD
    w = np.array([1.0, 1.0])
    exp, _ = _lars_oracle(w, 0.1 * np.ones(2), 0, lr, mom, wd, eeta, False, False)
    np.testing.assert_allclose(np.asarray(new_params["resnet"]["batch_norm"]["scale"]), exp, rtol=1e-6)

    # head_supervised: excluded
    w = np.array([[0.5, -0.5]])
    exp, _ = _lars_oracle(w, 0.1 * np.ones((1, 2)), 0, lr, mom, wd, eeta, False, False)
    np.testing.assert_allclose(np.asarray(new_params["head_supervised"]["dense"]["kernel"]), exp, rtol=1e-6)


def test_lars_two_steps_momentum_accumulates():
    params = {"w": jnp.array([1.0, 2.0, 3.0])}
    tx = lars(0.1, momentum=0.9, weight_decay=0.0, exclude_from_weight_decay=None)
    state = tx.init(params)
    g = {"w": jnp.array([0.1, 0.1, 0.1])}
    p = params
    for _ in range(2):
        updates, state = tx.update(g, state, p)
        p = jax.tree.map(lambda a, b: a + b, p, updates)

    w = np.array([1.0, 2.0, 3.0])
    v = np.zeros(3)
    for _ in range(2):
        w, v = _lars_oracle(w, np.full(3, 0.1), v, 0.1, 0.9, 0.0, 1e-3, False, True)
    np.testing.assert_allclose(np.asarray(p["w"]), w, rtol=1e-5)


def test_schedule_warmup_and_cosine():
    config = Config(learning_rate=0.3, learning_rate_scaling="linear",
                    train_batch_size=512, warmup_epochs=10, train_epochs=100)
    n = 51200  # => warmup_steps = 1000, total = 10001
    sched = warmup_cosine_schedule(config, n)
    scaled = 0.3 * 512 / 256
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(sched(500)), scaled / 2, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1000)), scaled, rtol=1e-4)
    assert float(sched(10000)) < 1e-4 * scaled + 1e-6  # near-zero at end


def test_sqrt_scaling():
    config = Config(learning_rate=0.1, learning_rate_scaling="sqrt", train_batch_size=1024)
    np.testing.assert_allclose(scaled_learning_rate(config), 0.1 * math.sqrt(1024), rtol=1e-6)


def test_weight_decay_policy_lars_vs_momentum():
    params = {
        "resnet": {"conv2d": {"kernel": jnp.full((2, 2), 2.0)}},
        "head_supervised": {"linear_layer": {"dense": {
            "kernel": jnp.full((2, 2), 3.0), "bias": jnp.full((2,), 1.0)}}},
    }
    config = Config(optimizer="lars", weight_decay=0.01)
    # LARS: only head_supervised non-bias params through the loss.
    expected = 0.01 * 0.5 * (4 * 9.0)
    np.testing.assert_allclose(float(add_weight_decay(config, params)), expected, rtol=1e-6)

    config = Config(optimizer="momentum", weight_decay=0.01)
    # non-LARS: all non-BN params (kernels + bias here).
    expected = 0.01 * 0.5 * (4 * 4.0 + 4 * 9.0 + 2 * 1.0)
    np.testing.assert_allclose(float(add_weight_decay(config, params)), expected, rtol=1e-6)


def test_trainable_mask_finetune():
    params = {
        "resnet": {
            "initial_conv": {"conv2d": {"kernel": jnp.zeros((1,))}},
            "block_group1": {"block_0": {"conv_0": {"conv2d": {"kernel": jnp.zeros((1,))}}}},
            "block_group3": {"block_0": {"conv_0": {"conv2d": {"kernel": jnp.zeros((1,))}}}},
        },
        "projection_head": {"nl_0": {"dense": {"kernel": jnp.zeros((1,))}}},
        "head_supervised": {"linear_layer": {"dense": {"kernel": jnp.zeros((1,))}}},
    }
    config = Config(train_mode="finetune", fine_tune_after_block=2)
    mask = trainable_mask(config, params)
    assert mask["resnet"]["initial_conv"]["conv2d"]["kernel"] is False
    assert mask["resnet"]["block_group1"]["block_0"]["conv_0"]["conv2d"]["kernel"] is False
    assert mask["resnet"]["block_group3"]["block_0"]["conv_0"]["conv2d"]["kernel"] is True
    assert mask["projection_head"]["nl_0"]["dense"]["kernel"] is True
    assert mask["head_supervised"]["linear_layer"]["dense"]["kernel"] is True

    config = Config(train_mode="pretrain", fine_tune_after_block=-1)
    assert all(jax.tree_util.tree_leaves(trainable_mask(config, params)))


def test_masked_optimizer_zeroes_frozen():
    params = {"resnet": {"initial_conv": {"k": jnp.ones(3)}},
              "head_supervised": {"k": jnp.ones(3)}}
    config = Config(train_mode="finetune", fine_tune_after_block=4, optimizer="momentum")
    mask = trainable_mask(config, params)
    tx = masked(build_optimizer(config, 0.1), mask)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.sum(jnp.abs(updates["resnet"]["initial_conv"]["k"]))) == 0.0
    assert float(jnp.sum(jnp.abs(updates["head_supervised"]["k"]))) > 0.0


def test_param_path_strings():
    params = {"a": {"b": jnp.zeros(1)}, "c": [jnp.zeros(1), jnp.zeros(1)]}
    names = param_path_strings(params)
    assert "a/b" in names and "c/0" in names and "c/1" in names
