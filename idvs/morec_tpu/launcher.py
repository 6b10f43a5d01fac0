"""Grid-search launcher core — the reference's train_*.py/test_*.py scripts
(e.g. inbatch_sasrec_e2e_text/train_bert_base.py:30-50) are nested hparam
loops that format a torch.distributed.launch command line and os.system it.

TPU edition: one process per experiment, same nested-product semantics, same
flag names, same label_screen format. Each grid point invokes the unified
runner in-process (or in a subprocess with fresh_process=True, which mirrors
the reference's isolation and frees all device memory between points).
"""

from __future__ import annotations

import itertools
import subprocess
import sys
from typing import Dict, List, Sequence


def grid_launch(base: Dict[str, object], grid: Dict[str, Sequence],
                label_keys: Sequence[str] = ("item_tower", "batch_size",
                                             "embedding_dim", "lr",
                                             "drop_rate", "l2_weight",
                                             "fine_tune_lr"),
                fresh_process: bool = False) -> List[tuple]:
    """Run every point of the hparam grid. Returns [(flags, result)]."""
    results = []
    keys = list(grid.keys())
    for values in itertools.product(*(grid[k] for k in keys)):
        flags = dict(base)
        flags.update(dict(zip(keys, values)))
        label = "_".join(str(flags.get(k, "")) for k in label_keys)
        flags.setdefault("label_screen", label)
        argv = []
        for k, v in flags.items():
            argv += [f"--{k}", str(v)]
        if fresh_process:
            cmd = [sys.executable, "-m", "idvs.morec_tpu.run"] + argv
            res = subprocess.run(cmd).returncode
        else:
            from .run import main
            res = main(argv)
        results.append((flags, res))
    return results
