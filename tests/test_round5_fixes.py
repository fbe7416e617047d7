"""Regression tests for the round-5 self-review findings.

1. The fused NT-Xent 'auto' gate must divide by the BATCH shard count, not
   mesh.size — the shard_map island shards its row block over the batch
   axes only, so a model/spatial mesh axis does not shrink the tile.
2. The native-pipeline fallback under multi-process must hand ArrayDataset
   the ORIGINAL global arrays + global batch (ArrayDataset shards
   internally; the pre-sliced shard would double-shard).
3. The semisup/distill acceptance recipes validate their npz: arguments up
   front instead of silently stripping four characters.
"""

import os
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fused_auto_gate_uses_batch_shards_not_mesh_size():
    import jax
    from jax.sharding import Mesh

    from simclr_tpu.config import Config, resolve_use_fused_ntxent
    from simclr_tpu.parallel import mesh as mesh_lib
    from simclr_tpu.training import steps

    devices = jax.devices()
    assert len(devices) == 8, "conftest provides 8 virtual devices"
    # B=4096: rows_global = 8192.  Tile over 4 batch shards =
    # 2048 x 8192 = 2^24 (the measured >=1.11x win regime); over 8 it is
    # 2^23 (measured parity).  A 4x2 data-x-model mesh has 4 batch shards.
    cfg = Config(train_batch_size=4096, use_fused_ntxent="auto")
    tp_mesh = Mesh(np.asarray(devices).reshape(4, 2),
                   (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))
    dp_mesh = Mesh(np.asarray(devices), (mesh_lib.DATA_AXIS,))
    assert mesh_lib.num_batch_shards(tp_mesh) == 4
    assert steps._resolve_fused(cfg, tp_mesh) is True
    assert steps._resolve_fused(cfg, dp_mesh) is False
    # the trainer-side gate composes the same way
    assert resolve_use_fused_ntxent(
        cfg, mesh_lib.num_batch_shards(tp_mesh)) is True
    # spatial meshes: 'spatial' axis must not shrink the tile either
    sp_mesh = Mesh(np.asarray(devices).reshape(4, 2),
                   (mesh_lib.DATA_AXIS, mesh_lib.SPATIAL_AXIS))
    assert steps._resolve_fused(cfg, sp_mesh) is True


def test_native_fallback_multiprocess_not_double_sharded(monkeypatch):
    """When NativeArrayPipeline is unavailable at runtime (no g++), the
    multi-process branch has already sliced arrays + localized the batch;
    the python fallback must still receive the GLOBAL arrays and batch
    size, because ArrayDataset shards per process internally."""
    import jax

    from simclr_tpu.config import Config
    from simclr_tpu.data import loader as loader_lib
    from simclr_tpu.data import native_pipeline as np_mod

    class _Unavailable:
        def __init__(self, *a, **kw):
            raise np_mod.NativePipelineUnavailable("forced by test")

    monkeypatch.setattr(np_mod, "NativeArrayPipeline", _Unavailable)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(37, 4, 4, 3), dtype=np.uint8)
    labels = np.arange(37, dtype=np.int64)
    cfg = Config(input_pipeline="native", seed=3)

    for is_training in (False, True):
        ds = loader_lib.make_array_pipeline(cfg, images, labels, 8,
                                            is_training)
        assert type(ds) is loader_lib.ArrayDataset
        assert ds.num_examples == 37  # global, not the 18-row slice
        assert ds.batch_size == 8     # global, not 4

    # eval index tags are global: ArrayDataset's internal shard keeps the
    # unsliced positions, so process 1's first row is NOT index 0
    ds = loader_lib.make_array_pipeline(cfg, images, labels, 8, False)
    first = next(iter(ds))
    assert first["index"][0] != 0


def test_acceptance_recipes_validate_npz_args():
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        import real_data_acceptance as acc
    finally:
        sys.path.pop(0)

    for recipe in ("digits_semisup", "digits_distill"):
        for argv in (["--recipe", recipe, "--data", "cifar10"],
                     ["--recipe", recipe, "--data", "npz:/tmp/x.npz"]):
            old = sys.argv
            sys.argv = ["real_data_acceptance.py"] + argv
            try:
                with pytest.raises(SystemExit) as e:
                    acc.main()
                assert e.value.code == 2  # argparse error, not a traceback
            finally:
                sys.argv = old


def test_fused_ntxent_step_on_tensor_parallel_mesh():
    """Full GSPMD train step with --use_fused_ntxent=true on a 4x2
    data-x-model mesh: the composition the corrected 'auto' gate can now
    enable at flagship scale.  Loss must match the dense objective on the
    same mesh (the island stays batch-sharded, replicated over 'model')."""
    import jax

    from test_spatial_tp import _config, _run_one_step

    dense = _run_one_step(_config(mesh_shape="4,2", use_fused_ntxent=False))
    fused = _run_one_step(_config(mesh_shape="4,2", use_fused_ntxent=True))
    assert fused[0].axis_names == ("data", "model")
    np.testing.assert_allclose(fused[3]["train/contrast_loss"],
                               dense[3]["train/contrast_loss"], rtol=1e-4)
    np.testing.assert_allclose(fused[3]["train/total_loss"],
                               dense[3]["train/total_loss"], rtol=1e-4)
