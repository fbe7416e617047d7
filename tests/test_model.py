"""Model-family tests: shapes, endpoints, variants, freezing."""

import jax
import jax.numpy as jnp
import pytest

from simclr_tpu.config import Config
from simclr_tpu.models.model import SimCLRModel
from simclr_tpu.models.resnet import ResNet


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables, x, train=train, mutable=["batch_stats"] if train else []
    )
    return variables, out


def test_resnet18_cifar_shapes():
    model = ResNet(resnet_depth=18, width_multiplier=1, cifar_stem=True)
    x = jnp.ones((2, 32, 32, 3))
    _, (feats, endpoints) = _init_and_apply(model, x)
    assert feats.shape == (2, 512)
    assert endpoints["block_group1"].shape == (2, 32, 32, 64)
    assert endpoints["block_group4"].shape == (2, 4, 4, 512)
    assert endpoints["final_avg_pool"].shape == (2, 512)


def test_resnet50_imagenet_shapes():
    model = ResNet(resnet_depth=50, width_multiplier=1)
    x = jnp.ones((2, 64, 64, 3))
    _, (feats, endpoints) = _init_and_apply(model, x)
    assert feats.shape == (2, 2048)
    # 64 -> stem/2 -> pool/2 -> 16, then /2 per group 2..4 -> 2
    assert endpoints["initial_conv"].shape == (2, 32, 32, 64)
    assert endpoints["initial_max_pool"].shape == (2, 16, 16, 64)
    assert endpoints["block_group4"].shape == (2, 2, 2, 2048)


def test_resnet_sk_se_variant():
    model = ResNet(resnet_depth=50, width_multiplier=1, sk_ratio=0.0625, se_ratio=0.25)
    x = jnp.ones((2, 64, 64, 3))
    variables, (feats, _) = _init_and_apply(model, x)
    assert feats.shape == (2, 2048)
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "sk_conv2d" in names and "se" in names and "initial_conv_2" in names


def test_width_multiplier():
    model = ResNet(resnet_depth=18, width_multiplier=2, cifar_stem=True)
    x = jnp.ones((2, 32, 32, 3))
    _, (feats, _) = _init_and_apply(model, x)
    assert feats.shape == (2, 1024)


def test_invalid_depth_raises():
    model = ResNet(resnet_depth=77)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), train=False)


def test_simclr_model_pretrain_outputs():
    config = Config(resnet_depth=18, image_size=32, train_mode="pretrain",
                    proj_out_dim=128, num_proj_layers=3)
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.ones((8, 32, 32, 3))  # 2 views x 4 images stacked on batch
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    proj, logits_sup = model.apply(variables, x, train=False)
    assert proj.shape == (8, 128)
    assert logits_sup.shape == (8, 10)  # lineareval_while_pretraining default
    assert proj.dtype == jnp.float32


def test_simclr_model_finetune_head_grafting():
    # ft_proj_selector=1 grafts from the first projection intermediate.
    config = Config(resnet_depth=18, image_size=32, train_mode="finetune",
                    ft_proj_selector=1, fine_tune_after_block=-1)
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.ones((4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    proj, logits_sup = model.apply(variables, x, train=False)
    assert logits_sup.shape == (4, 10)


def test_finetune_stop_gradient_freezes_blocks():
    """With fine_tune_after_block=4, encoder grads must be exactly zero."""
    config = Config(resnet_depth=18, image_size=32, train_mode="finetune",
                    fine_tune_after_block=4)
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        _, logits = model.apply({**variables, "params": params}, x, train=False)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    resnet_grad_norm = sum(
        jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads["resnet"])
    )
    head_grad_norm = sum(
        jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads["head_supervised"])
    )
    assert resnet_grad_norm == 0.0
    assert head_grad_norm > 0.0


def test_bn_stats_update_in_train_mode():
    model = ResNet(resnet_depth=18, cifar_stem=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["initial_bn"]["batch_norm"]["mean"]
    after = mutated["batch_stats"]["initial_bn"]["batch_norm"]["mean"]
    assert not jnp.allclose(before, after)
