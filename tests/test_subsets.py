"""Semi-supervised subset construction (reference C18,
imagenet_subsets/{1,10}percent.txt + README.md:157-167 recipe) — tested
against the vendored ID lists and a synthetic registry, no network."""

import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.data import subsets


def test_vendored_id_lists_parse_and_count():
    ids1 = subsets.load_subset_ids(1)
    assert len(ids1) == 12811  # /root/reference/imagenet_subsets/1percent.txt
    ids10 = subsets.load_subset_ids(10)
    assert len(ids10) == 128116
    assert ids1 <= ids10  # the 1% split is a subset of the 10% split
    sample = next(iter(ids1))
    assert sample.endswith(".JPEG") and "_" in sample


def test_load_subset_ids_rejects_other_pct():
    with pytest.raises(ValueError):
        subsets.load_subset_ids(5)


def test_subset_mask_synthetic_registry():
    chosen = frozenset({"n01_1.JPEG", "n02_5.JPEG"})
    registry = ["n01_1.JPEG", b"n01_2.JPEG", "train/n02/n02_5.JPEG", "n03_9.JPEG"]
    mask = subsets.subset_mask(registry, chosen)
    np.testing.assert_array_equal(mask, [True, False, True, False])


def test_parse_subset_pct():
    assert subsets.parse_subset_pct("imagenet2012_subset/1pct") == 1
    assert subsets.parse_subset_pct("tfds:imagenet2012_subset/10pct") == 10
    assert subsets.parse_subset_pct("imagenet2012") is None


def test_finetune_recipe_preset_matches_readme():
    cfg = subsets.semi_supervised_finetune_config(Config(), pct=1)
    assert cfg.train_mode == "finetune"
    assert cfg.fine_tune_after_block == -1
    assert cfg.zero_init_logits_layer
    assert cfg.optimizer == "lars"
    assert cfg.learning_rate == 0.005
    assert cfg.learning_rate_scaling == "sqrt"
    assert cfg.weight_decay == 0.0
    assert cfg.train_epochs == 60 and cfg.train_batch_size == 1024
    assert cfg.num_proj_layers == 3 and cfg.ft_proj_selector == 1
    assert cfg.dataset == "imagenet2012_subset/1pct"
    # the README's real-regex schema must compile under our TF1-semantics
    # matcher (checkpoint.schema_matcher)
    from simclr_tpu.training.checkpoint import schema_matcher

    m = schema_matcher(cfg.variable_schema)
    assert m("base_model/conv2d/kernel")
    assert not m("head_supervised/dense/kernel")
    assert not m("global_step")
    assert not m("base_model/conv2d/Momentum")


def test_npz_subset_filtering(tmp_path):
    from simclr_tpu.data.loader import build_dataset

    real_ids = sorted(subsets.load_subset_ids(1))[:8]
    other_ids = [f"fake_{i}.JPEG" for i in range(32)]
    ids = np.array(real_ids + other_ids)
    n = len(ids)
    images = np.random.RandomState(0).randint(0, 256, (n, 8, 8, 3), np.uint8)
    labels = np.arange(n) % 4
    path = tmp_path / "d.npz"
    np.savez(path, images=images, labels=labels, ids=ids)

    config = Config(dataset=f"npz:{path}@1pct", train_batch_size=4,
                    eval_batch_size=4, image_size=8)
    ds, info = build_dataset(config, is_training=True)
    # 90% split keeps the first 36 examples; the 8 real IDs are all in it.
    assert info.num_train_examples == 8
    batch = next(iter(ds))
    assert batch["image"].shape == (4, 8, 8, 3)

    with pytest.raises(ValueError):
        np.savez(tmp_path / "noids.npz", images=images, labels=labels)
        build_dataset(Config(dataset=f"npz:{tmp_path/'noids.npz'}@1pct"),
                      is_training=True)
