"""Entry point parity shim: `python -m cvm_tpu.models.depth.evaluate`
(headless val-set metrics, SURVEY.md §3.2). Delegates to the registry CLI."""

import sys

from cvm_tpu.cli.evaluate import main as _main


def main(argv=None):
    return _main(["--model", "depth"] + list(argv if argv is not None else sys.argv[1:]))


if __name__ == "__main__":
    sys.exit(main())
