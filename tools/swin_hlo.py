"""Dump the optimized HLO of the tools/swin_matrix.py base step (the
SWIN_N-image Swin-tiny fwd+bwd chunk) so trace op names (fusion.N,
copy.N) can be mapped back to HLO instructions with shapes.

Usage: SWIN_N=88 python tools/swin_hlo.py /tmp/swin_step.hlo
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SWIN_N", 88))


def main():
    import jax
    import jax.numpy as jnp
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel

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

    txt = step.lower(params).compile().as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/swin_step.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
