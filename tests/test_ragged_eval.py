"""Exact ragged-eval masks (VERDICT r2 #5): loaders tag eval rows with
their global example index; evaluate() masks index >= num_examples, which
is exact under any sharding layout."""

import numpy as np

from simclr_tpu.data.loader import ArrayDataset


def test_array_dataset_eval_index_marks_pads():
    rng = np.random.RandomState(0)
    ds = ArrayDataset(rng.randint(0, 256, (11, 8, 8, 3), np.uint8),
                      rng.randint(0, 10, (11,)), batch_size=8,
                      is_training=False)
    batches = list(ds)
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0]["index"], np.arange(8))
    # Final ragged batch: 3 real rows, 5 pads carrying index == n (masked).
    np.testing.assert_array_equal(batches[1]["index"],
                                  [8, 9, 10, 11, 11, 11, 11, 11])
    assert batches[1]["image"].shape == (8, 8, 8, 3)


def test_evaluate_ragged_npz_counts_each_example_once(tmp_path):
    """End-to-end: 11-example eval set / batch 8 — the index-masked metric
    must equal a dense single-batch computation over exactly the 11 rows."""
    import jax
    import jax.numpy as jnp

    from simclr_tpu.config import Config
    from simclr_tpu.training import trainer

    rng = np.random.RandomState(3)
    images = rng.randint(0, 256, (110, 32, 32, 3), np.uint8)
    labels = rng.randint(0, 10, (110,)).astype(np.int64)
    npz = str(tmp_path / "d.npz")
    np.savez(npz, images=images, labels=labels)

    cfg = Config(dataset=f"npz:{npz}", image_size=32, resnet_depth=18,
                 train_batch_size=16, eval_batch_size=8, train_mode="finetune",
                 model_dir=str(tmp_path / "m"), compute_dtype="float32")
    result = trainer.evaluate(cfg)

    # Oracle: forward the 11 eval rows (the 90/10 split's tail) in one
    # dense pass with the same seed-derived init params.
    model, tx, _ = trainer.build_model_and_optimizer(cfg, 99, 10)
    from simclr_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh(cfg)
    state = trainer.init_state(cfg, model, tx, mesh, (32, 32, 3))
    ev_images = jnp.asarray(images[99:], jnp.float32) / 255.0
    _, logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        ev_images, train=False)
    top1 = float(jnp.mean(
        (jnp.argmax(logits, -1) == jnp.asarray(labels[99:])).astype(
            jnp.float32)))
    np.testing.assert_allclose(result["eval/label_top_1_accuracy"], top1,
                               atol=1e-6)
