"""Decompose the bench train-step time on real hardware.

Times each stage of the fused step separately with the same methodology as
bench.py (lax.scan device loop, one host fetch per timing), at the bench
config (R50, 224^2, per-chip batch 128, 256^2 uint8 host canvas):

  aug        on-device two-view augmentation only
  fwd        model forward only (pre-augmented bf16 input)
  fwd_bwd    forward + backward (grads materialised)
  model_opt  fwd+bwd + LARS update (no augmentation)
  full       the real train step (augment + fwd/bwd + NT-Xent + LARS)

Usage: python tools/perf_breakdown.py [--steps 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, inner_steps, label, per_images):
    """Scan fn inner_steps times on device; min-of-3 wall time, one fetch."""

    def loop(carry, _):
        carry = fn(carry)
        return carry, ()

    @jax.jit
    def run(carry):
        carry, _ = jax.lax.scan(loop, carry, None, length=inner_steps)
        return carry

    carry = run(*args)  # compile + warmup
    jax.tree.map(lambda x: x.block_until_ready(), carry)
    _fetch(carry)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry = run(carry)
        _fetch(carry)
        trials.append(time.perf_counter() - t0)
    dt = min(trials) / inner_steps
    print(f"{label:>10}: {dt * 1e3:8.2f} ms/step   {per_images / dt:8.1f} img/s")
    return dt


def _fetch(tree):
    leaves = jax.tree.leaves(tree)
    x = leaves[0]
    float(jnp.sum(x.ravel()[:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from simclr_tpu.config import Config
    from simclr_tpu.ops import augment
    from simclr_tpu.optim.builder import masked, trainable_mask
    from simclr_tpu.parallel import mesh as mesh_lib
    from simclr_tpu.training import trainer
    from simclr_tpu.training.steps import make_train_step

    batch = args.batch
    config = Config(
        dataset="synthetic", num_images_default=1281167, image_size=224,
        resnet_depth=50, train_batch_size=batch, warmup_epochs=10,
        optimizer="lars", learning_rate=0.3, compute_dtype="bfloat16",
        use_blur=True, color_jitter_strength=1.0, train_mode="pretrain",
    )
    mesh = mesh_lib.create_mesh(config)
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 1281167, 1000)
    state = trainer.init_state(config, model, tx, mesh, (256, 256, 3))
    mask = trainable_mask(config, state.params)
    tx_m = masked(tx, mask)
    train_step = make_train_step(config, model, tx_m, lr_fn)

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 256, size=(batch, 256, 256, 3), dtype=np.uint8))
    base_rng = jax.random.PRNGKey(0)
    n = args.steps

    # --- aug only: carry a counter so each iteration differs ---------------
    def aug_only(carry):
        i, img = carry
        k = jax.random.fold_in(base_rng, i)
        x = raw.astype(jnp.float32) / 255.0
        out = augment.two_view_pretrain_batch(
            x, k, 224, 224, color_jitter_strength=1.0, use_blur=True,
            dtype=jnp.bfloat16)
        return (i + 1, out)

    aug_init = (jnp.zeros((), jnp.int32),
                jnp.zeros((2 * batch, 224, 224, 3), jnp.bfloat16))
    t_aug = timed(aug_only, aug_init, inner_steps=n, label="aug", per_images=batch)

    # --- model fwd only on pre-augmented input ------------------------------
    pre = jax.random.normal(base_rng, (2 * batch, 224, 224, 3), jnp.bfloat16)

    def fwd_only(carry):
        s = carry
        (proj, logits_sup), _ = model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, pre,
            train=True, mutable=["batch_stats"])
        # fold output back into a param so scan iterations chain
        return s.replace(step=s.step + jnp.sum(proj).astype(jnp.int32) * 0 + 1)

    t_fwd = timed(fwd_only, state, inner_steps=n, label="fwd", per_images=batch)

    # --- fwd+bwd (grads materialised, no optimizer) -------------------------
    from simclr_tpu.objectives import ntxent

    def fwd_bwd(carry):
        s = carry

        def loss_fn(params):
            (proj, logits_sup), mutated = model.apply(
                {"params": params, "batch_stats": s.batch_stats}, pre,
                train=True, mutable=["batch_stats"])
            loss, _, _ = ntxent.add_contrastive_loss(
                proj, hidden_norm=True, temperature=config.temperature)
            return loss, mutated["batch_stats"]

        grads, bs = jax.grad(loss_fn, has_aux=True)(s.params)
        new_params = jax.tree.map(lambda p, g: p - 0.0 * g.astype(p.dtype), s.params, grads)
        return s.replace(params=new_params, batch_stats=bs, step=s.step + 1)

    t_bwd = timed(fwd_bwd, state, inner_steps=n, label="fwd_bwd", per_images=batch)

    # --- fwd+bwd + LARS ------------------------------------------------------
    import optax

    def model_opt(carry):
        s = carry

        def loss_fn(params):
            (proj, logits_sup), mutated = model.apply(
                {"params": params, "batch_stats": s.batch_stats}, pre,
                train=True, mutable=["batch_stats"])
            loss, _, _ = ntxent.add_contrastive_loss(
                proj, hidden_norm=True, temperature=config.temperature)
            return loss, mutated["batch_stats"]

        grads, bs = jax.grad(loss_fn, has_aux=True)(s.params)
        updates, opt_state = tx_m.update(grads, s.opt_state, s.params)
        new_params = optax.apply_updates(s.params, updates)
        return s.replace(params=new_params, batch_stats=bs,
                         opt_state=opt_state, step=s.step + 1)

    t_mo = timed(model_opt, state, inner_steps=n, label="model_opt", per_images=batch)

    # --- full step -----------------------------------------------------------
    labels = jnp.asarray(rng.randint(0, 1000, size=(batch,)).astype(np.int32))

    def full(carry):
        s = carry
        s, _ = train_step(s, {"image": raw, "label": labels}, base_rng)
        return s

    t_full = timed(full, state, inner_steps=n, label="full", per_images=batch)

    print()
    flops_step = 2 * batch * 3 * 4.1e9  # two views, fwd+2x bwd, R50@224
    print(f"aug share of full: {t_aug / t_full * 100:.1f}%")
    print(f"opt overhead (model_opt - fwd_bwd): {(t_mo - t_bwd) * 1e3:.2f} ms")
    print(f"aug+model_opt vs full (fusion gain): {(t_aug + t_mo - t_full) * 1e3:.2f} ms")
    print(f"model TFLOP/s (fwd_bwd): {flops_step / t_bwd / 1e12:.1f}")
    print(f"full-step TFLOP/s: {flops_step / t_full / 1e12:.1f}")


if __name__ == "__main__":
    main()
