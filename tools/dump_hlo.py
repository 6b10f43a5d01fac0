"""Dump the optimized HLO of a bench config's train step.

Usage: BENCH_CONFIG=text_morec_uniform python tools/dump_hlo.py /tmp/step.hlo
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    config = os.environ.get("BENCH_CONFIG", "text_morec_uniform")
    step, state, pack, raws, GB, n_chips = bench._build(config)
    batch0 = pack(raws[0])
    compiled = step.lower(state, batch0).compile()
    txt = compiled.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
