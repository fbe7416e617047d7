"""Tests for generalized losses, distillation, export, data loader, mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.data.loader import ArrayDataset, SyntheticDataset, build_dataset
from simclr_tpu.distill import StudentConvNet, add_kd_loss, default_student_optimizer, make_distill_step
from simclr_tpu.objectives.generalized import generalized_contrastive_loss, get_logsumexp_loss
from simclr_tpu.parallel import mesh as mesh_lib


# --- generalized losses (C20) ------------------------------------------------

def test_decoupled_ntxent_logsumexp():
    h1 = jax.random.normal(jax.random.PRNGKey(0), (16, 32))
    h2 = h1 + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (16, 32))
    loss = generalized_contrastive_loss(h1, h2, dist="logsumexp", temperature=0.5)
    assert np.isfinite(float(loss))
    # With lambda=0 only the alignment term remains: aligned pairs beat
    # random pairs (uniformity term would penalize near-duplicate rows).
    h3 = jax.random.normal(jax.random.PRNGKey(2), (16, 32))
    loss_align = generalized_contrastive_loss(h1, h2, dist="logsumexp", lambda_weight=0.0)
    loss_rand = generalized_contrastive_loss(h1, h3, dist="logsumexp", lambda_weight=0.0)
    assert float(loss_align) < float(loss_rand)
    # logsumexp uniformity term >= 0 contribution on top of alignment.
    assert float(loss) != float(loss_align)


@pytest.mark.parametrize("dist,norm", [("normal", False), ("normal", True), ("uniform", False)])
def test_swd_losses_finite(dist, norm):
    h1 = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
    h2 = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    loss = generalized_contrastive_loss(
        h1, h2, key=jax.random.PRNGKey(2), dist=dist, hidden_norm=norm
    )
    assert np.isfinite(float(loss)) and float(loss) >= 0


def test_swd_matches_prior_is_small():
    """Embeddings drawn FROM the prior should have near-zero SWD term."""
    h = jax.random.normal(jax.random.PRNGKey(0), (512, 8))
    h1, h2 = h[:256], h[:256]
    loss_same = generalized_contrastive_loss(
        h1, h2, key=jax.random.PRNGKey(1), dist="normal", hidden_norm=False, lambda_weight=1.0
    )
    far = jax.random.normal(jax.random.PRNGKey(2), (256, 8)) * 5.0
    loss_far = generalized_contrastive_loss(
        far, far, key=jax.random.PRNGKey(1), dist="normal", hidden_norm=False, lambda_weight=1.0
    )
    assert float(loss_same) < float(loss_far)


# --- distillation (C19) ------------------------------------------------------

def test_kd_loss_zero_when_matched():
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 10)) * 3
    loss_same = add_kd_loss(logits, logits, temperature=2.0)
    loss_diff = add_kd_loss(-logits, logits, temperature=2.0)
    assert float(loss_same) < float(loss_diff)


def test_distill_step_improves_kd_loss():
    student = StudentConvNet(num_classes=5)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = student.init(jax.random.PRNGKey(1), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    target = jax.random.normal(jax.random.PRNGKey(2), (4, 5)) * 2

    tx = default_student_optimizer(total_steps=10, learning_rate=0.5)
    opt_state = tx.init(params)
    step = jax.jit(make_distill_step(student, lambda im: target, tx, temperature=1.0))

    losses = []
    for _ in range(5):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, x)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


# --- export (C17) ------------------------------------------------------------

@pytest.mark.slow
def test_export_and_load_serving(tmp_path):
    from simclr_tpu.export import export_serving, load_serving
    from simclr_tpu.models.model import SimCLRModel
    from simclr_tpu.training.state import TrainState

    config = Config(resnet_depth=18, image_size=32, model_dir=str(tmp_path),
                    compute_dtype="float32")
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = TrainState(step=jnp.asarray(7, jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"], opt_state=())

    path = export_serving(config, state, num_classes=10)
    assert path.endswith("7")
    serve = load_serving(path)
    out = serve(jnp.ones((2, 32, 32, 3)))
    for key in ("initial_conv", "initial_max_pool", "block_group1", "block_group2",
                "block_group3", "block_group4", "final_avg_pool", "default",
                "proj_head_input", "proj_head_output", "logits_sup"):
        assert key in out, key
    assert out["default"].shape == (2, 512)
    assert out["logits_sup"].shape == (2, 10)

    # trainable=True runs the training graph: BN normalizes with batch
    # statistics instead of the stored moving averages (the reference's two
    # concrete functions, tf2/run.py:263-284), so on inputs whose statistics
    # differ from the (init-default) moving stats the outputs must differ.
    rng_imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 3 + 1
    frozen = serve(rng_imgs, trainable=False)
    trainmode = serve(rng_imgs, trainable=True)
    assert not np.allclose(np.asarray(frozen["default"]),
                           np.asarray(trainmode["default"]))
    # and the two modes are each deterministic / repeatable
    again = serve(rng_imgs, trainable=True)
    np.testing.assert_allclose(np.asarray(trainmode["default"]),
                               np.asarray(again["default"]))


# --- data layer --------------------------------------------------------------

def test_synthetic_dataset_batches():
    config = Config(dataset="synthetic", image_size=32, train_batch_size=8)
    ds, info = build_dataset(config, is_training=True)
    batch = next(iter(ds))
    assert batch["image"].shape == (8, 32, 32, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["label"].shape == (8,)
    assert info.num_classes == 10


def test_array_dataset_epoch_permutation_and_padding():
    images = np.arange(10)[:, None, None, None].repeat(4, 1).repeat(4, 2).repeat(3, 3).astype(np.uint8)
    labels = np.arange(10)
    train = ArrayDataset(images, labels, batch_size=4, is_training=True, seed=0)
    it = iter(train)
    seen = np.concatenate([next(it)["label"], next(it)["label"]])
    assert len(np.unique(seen)) == 8  # one epoch permutation, no repeats

    ev = ArrayDataset(images, labels, batch_size=4, is_training=False)
    batches = list(iter(ev))
    assert len(batches) == 3  # 4+4+2(padded)
    assert batches[-1]["label"].shape == (4,)


# --- mesh --------------------------------------------------------------------

def test_mesh_creation_and_shardings():
    config = Config()
    mesh = mesh_lib.create_mesh(config)
    assert mesh.shape["data"] == 8
    bs = mesh_lib.batch_sharding(mesh)
    assert bs.spec == jax.sharding.PartitionSpec("data")


def test_fsdp_spec():
    from jax.sharding import PartitionSpec as P
    leaf = jnp.zeros((2048, 512))
    assert mesh_lib.fsdp_spec(leaf, 8) == P("data", None)
    small = jnp.zeros((64,))
    assert mesh_lib.fsdp_spec(small, 8) == P()
