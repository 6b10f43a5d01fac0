"""Micro-bench: Pallas scatter-add embedding backward vs the XLA scatter.

Geometry = the text_morec bench's word-embedding backward (PARITY.md sgemb
ablation row): M = B*S*num_words token rows into the (30522, 512) table.

Run on the real TPU:  python tools/embed_scatter_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from idvs.morec_tpu.ops.pallas.embed_scatter import scatter_add_rows
from tools._timing import drain

B, S, W, V, D = 128, 21, 30, 30522, 512
M = B * S * W
ITERS = 20

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, V, size=(M,)).astype(np.int32))
dx = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))


@jax.jit
def xla_scatter(ids, dx):
    return jnp.zeros((V, D), jnp.float32).at[ids].add(dx)


@jax.jit
def pallas_scatter(ids, dx):
    return scatter_add_rows(ids, dx, V)


def timeit(fn, name):
    out = fn(ids, dx)
    drain(out)
    # chain iterations through a data dependency so the timer is honest
    t0 = time.perf_counter()
    d = dx
    for _ in range(ITERS):
        out = fn(ids, d)
        d = dx + out[0, 0]
    drain(d)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms")
    return out, dt


print(f"backend={jax.default_backend()} M={M} V={V} D={D}")
ox, tx = timeit(xla_scatter, "xla scatter-add  ")
op, tp = timeit(pallas_scatter, "pallas scatter-add")
err = float(jnp.abs(ox - op).max())
print(f"max |xla - pallas| = {err:.3e}   speedup = {tx / tp:.2f}x")
