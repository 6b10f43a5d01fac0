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
from typing import Dict, List, Optional, Sequence


def _known_flags() -> set:
    """Every flag the runner's CLI accepts: Config fields + the reference's
    own flag spellings (config.REF_FLAG_ALIASES) + launcher-only keys."""
    import dataclasses

    from .config import Config, REF_FLAG_ALIASES
    names = {f.name for f in dataclasses.fields(Config)}
    names.update(REF_FLAG_ALIASES)
    names.update({"label_screen", "local_rank"})
    return names


def grid_launch(base: Dict[str, object], grid: Dict[str, Sequence],
                label_keys: Sequence[str] = ("item_tower", "batch_size",
                                             "embedding_dim", "lr",
                                             "drop_rate", "l2_weight",
                                             "fine_tune_lr"),
                fresh_process: bool = False,
                zipped: Optional[Dict[str, Sequence]] = None) -> List[tuple]:
    """Run every point of the hparam grid. Returns [(flags, result)].

    zipped: axes iterated TOGETHER (positionally) instead of in the product —
    the reference's test_*.py scripts pair load_ckpt_name_list[i] with
    dnn_layers_list[i]/mo_dnn_layers_list[i] by index
    (bce_text/id_plus_mo-2stage/test_bert_add.py:38-41).

    A shim that names a flag the runner cannot express must fail HERE, not
    silently run a different model (VERDICT r3: the _m8 shims dropped
    mo_dnn_layers) — every key is validated against the Config fields and
    the reference flag aliases before anything launches.
    """
    zipped = zipped or {}
    known = _known_flags()
    unknown = (set(base) | set(grid) | set(zipped)) - known
    if unknown:
        raise ValueError(
            f"grid_launch: flags {sorted(unknown)} are not expressible — "
            "add them to Config (or REF_FLAG_ALIASES) instead of silently "
            "dropping a reference grid axis")
    if zipped:
        lens = {k: len(v) for k, v in zipped.items()}
        if len(set(lens.values())) > 1:
            raise ValueError(f"grid_launch: zipped axes differ in length: {lens}")
        zip_points = [dict(zip(zipped.keys(), vals))
                      for vals in zip(*zipped.values())]
    else:
        zip_points = [{}]

    results = []
    keys = list(grid.keys())
    for values in itertools.product(*(grid[k] for k in keys)):
        for zp in zip_points:
            flags = dict(base)
            flags.update(dict(zip(keys, values)))
            flags.update(zp)
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
