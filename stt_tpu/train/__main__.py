"""python -m stt_tpu.train — the training CLI (train.py shim parity)."""

from stt_tpu.config import initialize_globals_from_cli
from stt_tpu.train.trainer import train


def main(argv=None):
    config = initialize_globals_from_cli(argv)
    train(config)


if __name__ == "__main__":
    main()
