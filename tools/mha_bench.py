"""Microbench fused_mha variants on TPU: fwd and fwd+bwd, sweeping the
item-merge group G and dropout. Usage: python tools/mha_bench.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

import jax
import jax.numpy as jnp

from idvs.morec_tpu.ops.pallas import attention as A

M, T, H, NH = 2688, 30, 512, 8


def timeit(name, fn, x, iters=30):
    y = x
    for _ in range(3):
        y = fn(y)
    drain(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    drain(y)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:>28}: {ms:7.3f} ms")


def main():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (M, T, 3 * H), jnp.bfloat16)
    mask = jnp.ones((M, T), jnp.bfloat16)

    for G, NB in ((1, 16), (2, 16), (2, 32), (4, 16), (4, 32), (4, 64)):
        A._pick_group_orig = A._pick_group
        A._pick_group = lambda nb, T, _g=G: _g
        A._pick_block_orig = A._pick_block
        A._pick_block = lambda b, _nb=NB: _nb
        A._build.cache_clear()
        for drop in (0.1,):
            @jax.jit
            def fwd(x):
                o = A.fused_mha(x, mask, n_heads=NH, drop_rate=drop,
                                dropout_rng=key)
                # chain: feed output back as q to keep data dependence
                return jnp.concatenate([o, x[:, :, H:]], axis=-1)

            @jax.jit
            def fwdbwd(x):
                def loss(q):
                    o = A.fused_mha(q, mask, n_heads=NH, drop_rate=drop,
                                    dropout_rng=key)
                    return jnp.sum(o.astype(jnp.float32))
                g = jax.grad(loss)(x)
                return x - (1e-30 * g).astype(x.dtype)

            timeit(f"G={G} NB={NB} p={drop} fwd", fwd, qkv)
            timeit(f"G={G} NB={NB} p={drop} fwd+bwd", fwdbwd, qkv)
        A._pick_group = A._pick_group_orig
        A._pick_block = A._pick_block_orig


if __name__ == "__main__":
    main()
