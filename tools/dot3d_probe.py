"""Does the Swin MLP's 3D dot shape pick a slow conv emitter? (trace finding:
stage0 intermediate dot (88,3136,96)x(96,384) runs at ~12 TFLOPS via
EmitAllInputFeatureInSublanesOutputBatchInSublanes, and its backward uses the
XposeReuse transpose-reuse emitter; the optimized HLO also assigns the
{1,2,0} transposed layout to parts of the stage0 residual stream.)

A/B: a 12-deep MLP residual stack (LN -> dense 4C -> gelu -> dense C -> add)
over (N, L, C) activations, 3D dots (as flax nn.Dense emits on 3D input)
vs the same math with activations flattened to (N*L, C) 2D. fwd+bwd through
a donated chained loop, closed with a D2H read (tools/_timing.py).

Usage: python tools/dot3d_probe.py [N L C depth]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain


def main():
    import jax
    import jax.numpy as jnp

    args = sys.argv[1:]
    N, L, C, depth = (int(a) for a in args) if len(args) == 4 else (88, 3136, 96, 12)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2 * depth + 1)
    W1 = [jax.random.normal(ks[2 * i], (C, 4 * C), jnp.bfloat16) * 0.02
          for i in range(depth)]
    W2 = [jax.random.normal(ks[2 * i + 1], (4 * C, C), jnp.bfloat16) * 0.02
          for i in range(depth)]
    x = jax.random.normal(ks[-1], (N, L, C), jnp.bfloat16)

    def ln(h):
        h32 = h.astype(jnp.float32)
        mu = h32.mean(-1, keepdims=True)
        v = ((h32 - mu) ** 2).mean(-1, keepdims=True)
        return ((h32 - mu) * jax.lax.rsqrt(v + 1e-5)).astype(h.dtype)

    def mlp_stack(params, x, flat: bool):
        w1s, w2s = params
        if flat:
            x = x.reshape(-1, C)
        for w1, w2 in zip(w1s, w2s):
            h = ln(x)
            h = jnp.dot(h, w1)
            h = jax.nn.gelu(h, approximate=False)
            x = x + jnp.dot(h, w2)
        return x.reshape(N, L, C)

    def bench(flat: bool, iters: int = 20):
        @jax.jit
        def step(params, x):
            def loss(p):
                return jnp.sum(mlp_stack(p, x, flat).astype(jnp.float32))
            g = jax.grad(loss)(params)
            # thread grads back into params: data-dependent chain
            return jax.tree.map(lambda a, b: a + 1e-30 * b, params, g)

        p = (W1, W2)
        for _ in range(3):
            p = step(p, x)
        drain(p)
        t0 = time.perf_counter()
        for _ in range(iters):
            p = step(p, x)
        drain(p)
        dt = (time.perf_counter() - t0) / iters
        flops = 3 * depth * 2 * 2 * N * L * C * 4 * C  # fwd+bwd(2x), 2 dots
        print(f"{'2D' if flat else '3D'}: {dt * 1e3:8.2f} ms/step "
              f"({flops / dt / 1e12:6.1f} TFLOPS on the MLP dots)", flush=True)

    bench(False)
    bench(True)


if __name__ == "__main__":
    main()
