"""Smoke tests for the colab-analogue example scripts (reference L7:
colabs/ + tf2/colabs/) — they must keep working against the current APIs.

Each runs as a real subprocess on a tiny exported bundle / tiny config so
API drift in export/load_serving/augment surfaces breaks loudly here.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simclr_tpu.config import Config

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_bundle(tmp_path_factory):
    from simclr_tpu.export import export_serving
    from simclr_tpu.models.model import SimCLRModel
    from simclr_tpu.training.state import TrainState

    tmp = tmp_path_factory.mktemp("bundle")
    config = Config(resnet_depth=18, image_size=32, model_dir=str(tmp),
                    compute_dtype="float32")
    model = SimCLRModel.from_config(config, num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 32, 32, 3)), train=False)
    state = TrainState(step=jnp.asarray(1, jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"], opt_state=())
    return export_serving(config, state, num_classes=10)


def _run(script, *args, timeout=600):
    env = dict(os.environ, PYTHONPATH=_REPO)
    return subprocess.run(
        [sys.executable, os.path.join(_REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=_REPO)


@pytest.mark.slow
def test_load_and_inference_example(tiny_bundle, tmp_path):
    npz = str(tmp_path / "imgs.npz")
    np.savez(npz, images=np.random.RandomState(0).randint(
        0, 256, (3, 48, 48, 3), dtype=np.uint8))
    r = _run("load_and_inference.py", "--model", tiny_bundle,
             "--images", npz, "--image_size", "32")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "features: (3, 512)" in r.stdout, r.stdout


@pytest.mark.slow
def test_finetuning_example(tiny_bundle):
    r = _run("finetuning.py", "--model", tiny_bundle, "--dataset", "synthetic",
             "--steps", "3", "--batch_size", "8", "--image_size", "32")
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_distill_example(tiny_bundle):
    r = _run("distill.py", "--teacher", tiny_bundle, "--dataset", "synthetic",
             "--steps", "3", "--batch_size", "8", "--image_size", "32")
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_randbits_example():
    r = _run("randbits_experiment.py", "--extra_channel_bits", "2",
             "--steps", "3", "--batch_size", "16")
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
@pytest.mark.parametrize("dist", ["normal", "logsumexp"])
def test_generalized_contrastive_loss_example(dist):
    r = _run("generalized_contrastive_loss.py", "--dist", dist,
             "--steps", "3", "--batch_size", "16")
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_digits_on_images_example():
    r = _run("digits_on_images.py", "--steps", "3", "--batch_size", "16",
             "--image_size", "40")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "background_probe_acc" in r.stdout


@pytest.mark.slow
def test_real_data_acceptance_dry_run(tmp_path):
    """The unattended real-data acceptance runner (VERDICT r2 #10) executes
    its full two-phase recipe — pretrain -> linear-eval warm-start -> eval
    bar check — on the synthetic dry-run path, writing acceptance.json.
    --bar 0.0 makes this a plumbing assertion, not a learning one (the
    tiny dry run's accuracy is covered by tools/tpu_acceptance.py)."""
    env = dict(os.environ, PYTHONPATH=_REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "real_data_acceptance.py"),
         "--dry_run", "--bar", "0.0", "--model_dir", str(tmp_path / "acc")],
        # Two training phases + eval in a subprocess: on this 1-core host the
        # wall time balloons when anything else competes for the CPU, so the
        # timeout is generous (observed ~6 min alone, >15 min under load).
        capture_output=True, text=True, timeout=2400, env=env, cwd=_REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "PASS" in r.stdout, r.stdout
    import json as _json

    verdict = _json.loads(open(tmp_path / "acc" / "acceptance.json").read())
    assert verdict["recipe"] == "cifar10" and "top_1" in verdict


@pytest.mark.slow
def test_semisup_acceptance_smoke(tmp_path):
    """The semi-supervised label-fraction acceptance (VERDICT r4 #1)
    executes its full three-phase chain — SimCLRv2-style pretrain ->
    balanced per-class label subset -> whole-network fine-tune with the
    reference's exact flag shape (README.md:157-167) -> eval — in-process
    at minuscule scale.  Plumbing assertion (bars 0); the real learning
    result (1pct 0.7604 / 10pct 0.9331 on TPU) is recorded in
    docs/PARITY.md."""
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        import real_data_acceptance as acc
    finally:
        sys.path.pop(0)

    train_npz, test_npz = acc.make_dry_npz(str(tmp_path), n=64)
    verdict = acc.run_semisup(
        f"npz:{train_npz}", f"npz:{test_npz}", str(tmp_path),
        scale=0.004, bars={0.25: 0.0}, fractions=(0.25,))
    assert verdict["pass"]
    assert verdict["results"]["25pct"]["n_labeled"] >= 4  # >=1 per class
    # the fine-tune phase really warm-started from the pretrain run
    import json as _json

    saved = _json.loads(open(tmp_path / "acceptance.json").read())
    assert saved["recipe"] == "digits_semisup"


@pytest.mark.slow
def test_distill_acceptance_smoke(tmp_path):
    """The distillation acceptance (reference C19,
    tf2/colabs/distillation_self_training.ipynb) executes its full
    four-phase chain — pretrain -> 25%-label teacher fine-tune -> KD
    self-training of the small student on the UNLABELED images via the
    exported serving bundle's logits_sup -> student eval — in-process at
    minuscule scale.  Plumbing assertion (bar 0); the real learning result
    on digits is recorded in docs/PARITY.md."""
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        import real_data_acceptance as acc
    finally:
        sys.path.pop(0)

    train_npz, test_npz = acc.make_dry_npz(str(tmp_path), n=64)
    verdict = acc.run_distill(
        f"npz:{train_npz}", f"npz:{test_npz}", str(tmp_path),
        scale=0.004, bar=0.0, label_fraction=0.25,
        distill_steps=6000, distill_batch=16)
    assert verdict["pass"]
    assert 0.0 <= verdict["student_top_1"] <= 1.0
    assert verdict["n_labeled"] >= 4  # >=1 per class
    import json as _json

    saved = _json.loads(open(tmp_path / "acceptance.json").read())
    assert saved["recipe"] == "digits_distill"
    assert "teacher_top_1" in saved


@pytest.mark.slow
def test_export_tf_checkpoint_tool(tmp_path):
    """Train 2 tiny steps via the CLI, export the run as a TF2-named TF
    checkpoint with tools/export_tf_checkpoint.py, and re-import it through
    the compat shim."""
    model_dir = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, "-m", "simclr_tpu.run",
         "--mode=train", "--train_mode=pretrain", "--dataset=synthetic",
         "--resnet_depth=18", "--image_size=32", "--train_batch_size=8",
         "--train_steps=2", "--warmup_epochs=0", "--compute_dtype=float32",
         "--use_blur=false", f"--model_dir={model_dir}"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, PYTHONPATH=_REPO), cwd=_REPO)
    assert r.returncode == 0, r.stdout + r.stderr

    out_prefix = str(tmp_path / "export" / "model.ckpt")
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "export_tf_checkpoint.py"),
         f"--model_dir={model_dir}", f"--out={out_prefix}",
         "--naming=tf2", "--num_classes=10"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, PYTHONPATH=_REPO), cwd=_REPO)
    assert r.returncode == 0, r.stdout + r.stderr

    from simclr_tpu.checkpoint_compat import import_tf_checkpoint

    config = Config.load(os.path.join(model_dir, "flags.json"))
    params, batch_stats = import_tf_checkpoint(config, out_prefix)
    assert "resnet" in params and "projection_head" in params


@pytest.mark.slow
def test_reproduce_imagenet_results_example(tmp_path):
    """The results-reproduction script (port of imagenet_results.ipynb) runs
    against a TF checkpoint written by our own export shim + a synthetic
    eval split."""
    from simclr_tpu.checkpoint_compat import export_tf_checkpoint
    from simclr_tpu.models.model import SimCLRModel
    import jax as _jax
    import jax.numpy as _jnp

    config = Config(resnet_depth=18, image_size=32, compute_dtype="float32",
                    train_mode="finetune", fine_tune_after_block=-1)
    model = SimCLRModel.from_config(config, num_classes=10)
    variables = model.init(_jax.random.PRNGKey(0),
                           _jnp.zeros((2, 32, 32, 3)), train=False)
    ckpt = export_tf_checkpoint(config, variables["params"],
                                variables["batch_stats"],
                                str(tmp_path / "model.ckpt"), naming="tf1")

    env = dict(os.environ, PYTHONPATH=_REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "examples",
                                      "reproduce_imagenet_results.py"),
         "--checkpoint", ckpt, "--resnet_depth", "18",
         "--dataset", "synthetic", "--image_size", "32",
         "--eval_batch_size", "16"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=_REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "top_1" in r.stdout, r.stdout
