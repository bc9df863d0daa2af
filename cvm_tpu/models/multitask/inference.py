"""Entry point parity shim: `python -m cvm_tpu.models.multitask.inference`
(reference UX, SURVEY.md §3.2). Delegates to the registry-driven CLI."""

import sys

from cvm_tpu.cli.infer import main as _main


def main(argv=None):
    return _main(["--model", "multitask"] + list(argv if argv is not None else sys.argv[1:]))


if __name__ == "__main__":
    sys.exit(main())
