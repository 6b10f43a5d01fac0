"""TPU behavioral check for the epilogue kernels' in-kernel dropout
(fused_mlp_resln / fused_proj_resln). The kernel PRNG has no CPU lowering,
so — like tools/check_dropout_grid.py for the attention kernel — this runs
on the chip.

Method (exact, no finite differences): the dropout mask depends only on
(seed, block partition, shape), never on the data. A level probe (zero
weights, large constant bias) makes every pre-dropout entry a known
constant, so the forward mask is recoverable exactly from the output's two
well-separated levels. The kernel's forward AND its VJP are then compared
against a plain-XLA reference that applies the RECOVERED mask — if backward
regenerated a different mask than forward applied (the BMf==BMb invariant,
PARITY r3 item 13), the cotangent comparison fails grossly.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from idvs.morec_tpu.models.layers import layer_norm
from idvs.morec_tpu.ops.pallas.mlp import fused_mlp_resln, fused_proj_resln

P = 0.5
EPS = 1e-6


def recover_mask_proj(M, C, seed):
    """Forward keep-mask of the proj edition at (M, C): w=0, b=8 makes
    y in {0, 16}; res = tiny distinct values keeps LN monotone per row."""
    x = jnp.zeros((M, C), jnp.float32)
    res = jnp.broadcast_to(jnp.arange(C, dtype=jnp.float32) / 1e4, (M, C))
    w = jnp.zeros((C, C), jnp.float32)
    b = jnp.full((C,), 8.0, jnp.float32)
    gm, bt = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)
    out = fused_proj_resln(x, res, w, b, ln2=(gm, bt), eps2=EPS,
                           drop_rate=P, seed=seed, interpret=False)
    # ln(y_pre) with y_pre per row a {0, 16} pattern (+tiny res): kept
    # entries normalize to > 0, dropped to < 0 — threshold at 0 (a per-row
    # median would misclassify rows whose kept count != C/2)
    return jnp.asarray(np.asarray(out) > 0)


def recover_mask_mlp(M, C, F, seed):
    x = jnp.zeros((M, C), jnp.float32)
    w1 = jnp.zeros((C, F), jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.zeros((F, C), jnp.float32)
    b2 = jnp.full((C,), 8.0, jnp.float32)
    gm, bt = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)
    out = fused_mlp_resln(x, w1, b1, w2, b2, ln2=(gm, bt), eps2=EPS,
                          drop_rate=P, seed=seed, interpret=False)
    # x=0 residual: out = LN(drop(b2-row)); kept entries normalize > 0,
    # dropped < 0 (see recover_mask_proj)
    return jnp.asarray(np.asarray(out) > 0)


def check(tag, kernel_fn, ref_fn, args):
    kv, kvjp = jax.vjp(kernel_fn, *args)
    rv, rvjp = jax.vjp(ref_fn, *args)
    d = float(jnp.max(jnp.abs(kv - rv)))
    print(f"[{tag}] fwd max abs diff vs recovered-mask ref: {d:.3e}",
          flush=True)
    assert d < 5e-2, d          # bf16 MXU rounding bounds the fwd diff
    ct = jnp.asarray(np.random.default_rng(5).normal(
        size=kv.shape).astype(np.float32))
    gk, gr = kvjp(ct), rvjp(ct)
    for i, (a, b) in enumerate(zip(gk, gr)):
        da = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        print(f"[{tag}] cotangent {i}: max abs {da:.3e} "
              f"(rel {da / scale:.3e})", flush=True)
        assert da / scale < 5e-2, (tag, i, da, scale)
    print(f"[{tag}] fwd/bwd masks agree", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    M, C, F = 2048, 512, 2048   # spans several row blocks at bench dims
    seed = jnp.asarray([12345], jnp.int32)
    gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bt = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))

    # ---- proj edition ----
    mask_p = recover_mask_proj(M, C, seed)
    frac = float(1.0 - jnp.mean(mask_p.astype(jnp.float32)))
    print(f"[proj] dropped fraction {frac:.3f} (target {P})", flush=True)
    assert abs(frac - P) < 0.03
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32) * 0.5)
    res = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)

    def proj_kernel(x, res, w, b):
        return fused_proj_resln(x, res, w, b, ln2=(gm, bt), eps2=EPS,
                                drop_rate=P, seed=seed, interpret=False)

    def proj_ref(x, res, w, b):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        y = jnp.where(mask_p, y / (1.0 - P), 0.0)
        return layer_norm(res + y, gm, bt, EPS)

    check("proj", proj_kernel, proj_ref, (x, res, w, b))

    # ---- mlp edition ----
    mask_m = recover_mask_mlp(M, C, F, seed)
    frac = float(1.0 - jnp.mean(mask_m.astype(jnp.float32)))
    print(f"[mlp] dropped fraction {frac:.3f} (target {P})", flush=True)
    assert abs(frac - P) < 0.03
    w1 = jnp.asarray(rng.normal(size=(C, F)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(F, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)

    def mlp_kernel(x, w1, b1, w2, b2):
        return fused_mlp_resln(x, w1, b1, w2, b2, ln2=(gm, bt), eps2=EPS,
                               drop_rate=P, seed=seed, interpret=False)

    def mlp_ref(x, w1, b1, w2, b2):
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        g = jax.nn.gelu(h, approximate=False)
        y = jnp.dot(g.astype(x.dtype), w2,
                    preferred_element_type=jnp.float32) + b2
        y = jnp.where(mask_m, y / (1.0 - P), 0.0)
        return layer_norm(x + y, gm, bt, EPS)

    check("mlp", mlp_kernel, mlp_ref, (x, w1, b1, w2, b2))
    print("OK", flush=True)


if __name__ == "__main__":
    main()
