"""CLI entry point: ``python -m simclr_tpu.run --mode=train ...``

Flag-compatible with the reference's run.py / tf2/run.py launch commands.
"""

from simclr_tpu.config import parse_flags
from simclr_tpu.training.trainer import run


def main():
    run(parse_flags())


if __name__ == "__main__":
    main()
