"""CLI entry point: python -m idvs.morec_tpu.run --flags...

Same flag surface as the reference's parameters.py files (union of all 12
variants) plus the variant axes (--loss/--user_tower/--stage/--modality) that
replace the reference's directory choice.
"""

import os

os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")  # reference run.py:23

from .config import parse_args
from .train.runner import run


def main(argv=None):
    cfg = parse_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main()
