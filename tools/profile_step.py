"""Profile one bench config's train step and print the hot-op summary.

Usage: BENCH_CONFIG=text_morec_uniform python tools/profile_step.py [top_n]

Builds the exact bench.py step, warms it up, traces a few steps with
jax.profiler, and runs tools/trace_summary.py over the captured xplane.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain


def main():
    import jax
    import bench
    from tools import trace_summary

    config = os.environ.get("BENCH_CONFIG", "text_morec_uniform")
    step, state, pack, raws, GB, n_chips = bench._build(config)
    batch0 = pack(raws[0])
    for _ in range(3):
        state, loss = step(state, batch0)
    drain(loss)

    out_dir = os.environ.get("PROFILE_DIR", "/tmp/step_trace")
    with jax.profiler.trace(out_dir):
        for _ in range(5):
            state, loss = step(state, batch0)
        drain(loss)

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane under {out_dir}"
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    raw = open(paths[-1], "rb").read()
    for name, totals, counts in trace_summary.parse_space(raw):
        total = sum(totals.values())
        if total == 0 or "TPU" not in name and "/device" not in name.lower():
            continue
        print(f"\n== plane '{name}': {total/1e9:.3f} ms total (all lines)")
        for (line, op), ps in totals.most_common(top):
            print(f"  {ps/1e9:9.3f} ms {ps/total*100:5.1f}% "
                  f"x{counts[(line, op)]:<5} [{line}] {op[:90]}")


if __name__ == "__main__":
    main()
