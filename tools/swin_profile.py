"""Trace ONE Swin-tiny 176-image chunk (fwd+bwd) and print the hot ops.

Same computation as tools/swin_matrix.py base; writes an xplane trace and
runs tools/trace_summary.py over it.

Usage: python tools/swin_profile.py [top_n]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

N = 176


def main():
    import jax
    import jax.numpy as jnp
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel
    from tools import trace_summary

    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    bf = jnp.bfloat16
    model = SwinModel(SwinConfig())
    params = model.init(key, imgs[:1])

    def cast(tree):
        return jax.tree.map(lambda a: a.astype(bf)
                            if a.dtype == jnp.float32 else a, tree)

    def loss(p):
        h = model.apply(cast(p), imgs, False, rngs={"dropout": key})
        return jnp.sum(h.astype(jnp.float32))

    @jax.jit
    def step(p):
        g = jax.grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-30 * b.astype(a.dtype), p, g)

    p = params
    for _ in range(2):
        p = step(p)
    drain(p)

    out_dir = os.environ.get("PROFILE_DIR", "/tmp/swin_trace")
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            p = step(p)
        drain(p)

    paths = sorted(glob.glob(os.path.join(out_dir, "**/*.xplane.pb"),
                             recursive=True))
    top_n = sys.argv[1] if len(sys.argv) > 1 else "30"
    sys.argv = [sys.argv[0], paths[-1], top_n]
    trace_summary.main()


if __name__ == "__main__":
    main()
