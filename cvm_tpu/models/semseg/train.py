"""Entry point parity shim: `python -m cvm_tpu.models.semseg.train` (reference UX,
SURVEY.md §2 "Training entry"). Delegates to the registry-driven CLI."""

import sys

from cvm_tpu.cli.train import main as _main


def main(argv=None):
    return _main(["--model", "semseg"] + list(argv if argv is not None else sys.argv[1:]))


if __name__ == "__main__":
    sys.exit(main())
