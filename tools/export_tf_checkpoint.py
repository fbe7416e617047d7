"""Export a trained simclr_tpu checkpoint as a TF checkpoint in a released
naming scheme, so reference-side tooling (run.py --checkpoint warm start,
model.py:162-168 init_from_checkpoint, the colabs) can consume it.

Usage:
  python tools/export_tf_checkpoint.py --model_dir=/path/to/run \
      --out=/path/to/export/model.ckpt [--naming=tf2|tf1] \
      [--num_classes=1000]

Model flags (resnet_depth, width_multiplier, sk_ratio, ...) are read from
the run's flags.json; --num_classes must match the trained supervised head.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--out", required=True, help="checkpoint prefix to write")
    ap.add_argument("--naming", default="tf2", choices=["tf1", "tf2"])
    ap.add_argument("--num_classes", type=int, default=1000,
                    help="supervised-head width of the trained run")
    args = ap.parse_args()

    from simclr_tpu.config import Config
    from simclr_tpu.checkpoint_compat import export_tf_checkpoint
    from simclr_tpu.parallel import mesh as mesh_lib
    from simclr_tpu.training import checkpoint as ckpt_lib, trainer

    config = Config.load(os.path.join(args.model_dir, "flags.json"))
    config = config.replace(model_dir=args.model_dir, checkpoint=None)

    mesh = mesh_lib.create_mesh(config)
    model, tx, _ = trainer.build_model_and_optimizer(config, 1, args.num_classes)
    state = trainer.init_state(config, model, tx, mesh,
                               (config.image_size, config.image_size, 3))
    manager = ckpt_lib.create_manager(args.model_dir, config.keep_checkpoint_max)
    state = ckpt_lib.try_restore_or_warm_start(config, state, manager)
    prefix = export_tf_checkpoint(config, state.params, state.batch_stats,
                                  args.out, naming=args.naming)
    print(f"wrote TF checkpoint ({args.naming} naming): {prefix}")


if __name__ == "__main__":
    main()
