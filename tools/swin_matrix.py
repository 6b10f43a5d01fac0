"""In-context Swin-tiny cost matrix at the vision-bench chunk geometry
(176 images, 224px, fwd+bwd, bf16 compute) — same methodology as
tools/encoder_matrix.py. Env toggles in models/swin.py (trace-time):

  base     — as trained
  noattn   — windowed attention replaced by identity (keeps projections)
  noshift  — shifted windows disabled (no roll, no shift mask)
  nobias   — relative position bias not added
  nowin    — window partition/reverse replaced by a flat reshape

Usage: python tools/swin_matrix.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

N = int(os.environ.get("SWIN_N", 176))   # the vision bench encoder_chunk


def main():
    import jax
    import jax.numpy as jnp
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel

    which = sys.argv[1:] or ["base", "noattn", "noshift", "nobias", "nowin"]
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    bf = jnp.bfloat16

    def cast(tree):
        return jax.tree.map(lambda a: a.astype(bf)
                            if a.dtype == jnp.float32 else a, tree)

    def run(name, env=()):
        model = SwinModel(SwinConfig())
        params = model.init(key, imgs[:1])
        for k in env:
            os.environ[k] = "1"

        def loss(p):
            h = model.apply(cast(p), imgs, False, rngs={"dropout": key})
            return jnp.sum(h.astype(jnp.float32))

        @jax.jit
        def step(p):
            g = jax.grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b.astype(a.dtype),
                                p, g)

        p = params
        for _ in range(2):
            p = step(p)
        drain(p)
        t0 = time.perf_counter()
        for _ in range(8):
            p = step(p)
        drain(p)
        ms = (time.perf_counter() - t0) / 8 * 1e3
        for k in env:
            del os.environ[k]
        print(f"{name:>8}: {ms:8.1f} ms  ({N / (ms/1e3):6.0f} img/s fwd+bwd)",
              flush=True)

    if "base" in which:
        run("base")
    if "nofmlp" in which:     # XLA MLP composition instead of the fused kernel
        run("nofmlp", env=("IDVS_SWIN_NO_FMLP",))
    if "nomlp" in which:      # MLP sub-block ablated to identity
        run("nomlp", env=("IDVS_SWIN_NO_MLP",))
    if "noattn" in which:
        run("noattn", env=("IDVS_SWIN_NO_ATTN",))
    if "noshift" in which:
        run("noshift", env=("IDVS_SWIN_NO_SHIFT",))
    if "nobias" in which:
        run("nobias", env=("IDVS_SWIN_NO_BIAS",))
    if "nowin" in which:
        run("nowin", env=("IDVS_SWIN_NO_WIN",))


if __name__ == "__main__":
    main()
