"""Per-geometry probe of the fused Swin windowed attention vs the XLA
composition, on the real TPU, at the vision-bench chunk geometry.

For each (stage, shifted) of Swin-tiny at 224px with 176 images/chunk this
times fwd+bwd of JUST the attention body (qkv given, context out, summed
loss) — chained-loop timing on donated buffers so the tunneled platform
reports honestly. Reports ms per call and the implied per-step cost
(x chunks x blocks-per-stage).

Usage: python tools/swin_kernel_probe.py [xla|fused] [stage ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

N_IMG = int(os.environ.get("SWIN_N", 176))     # vision bench encoder chunk
RES = 56        # stage0 feature map (224/4)

# swin-tiny: (C, nh, depth) per stage; window 7
STAGES = [(96, 3, 2), (192, 6, 2), (384, 12, 6), (768, 24, 2)]
W = 7


def geoms():
    for s, (C, nh, depth) in enumerate(STAGES):
        r = RES >> s
        nw = (r // W) ** 2 if r >= W else 1
        for shifted in (False, True):
            if shifted and r <= W:
                continue  # s=0 at w==resolution: no shift
            # blocks alternate non-shift/shift
            n_blocks = depth - depth // 2 if not shifted else depth // 2
            yield s, shifted, C, nh, max(nw, 1), n_blocks


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from idvs.morec_tpu.models.swin import _rel_pos_index, _shift_mask
    from idvs.morec_tpu.ops.pallas.attention import fused_mha

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    only = {int(a) for a in sys.argv[2:]} or set(range(4))
    key = jax.random.PRNGKey(0)

    for s, shifted, C, nh, nw, n_blocks in geoms():
        if s not in only:
            continue
        B = N_IMG * nw
        T = W * W
        dh = C // nh
        qkv = jax.random.normal(key, (B, T, 3 * C), jnp.bfloat16)
        rel = np.zeros((nh, T, T), np.float32)
        rel[:] = np.random.default_rng(0).standard_normal((nh, T, T))
        bias = jnp.asarray(rel)[None]
        if shifted:
            r = RES >> s
            amask = jnp.asarray(_shift_mask(r, r, W, W // 2))
            bias = bias + amask[:, None]
        bias_full = jnp.broadcast_to(bias, (nw, nh, T, T))

        def xla_loss(qkv):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, T, nh, dh)
            k = k.reshape(B, T, nh, dh)
            v = v.reshape(B, T, nh, dh)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                              preferred_element_type=jnp.float32) / dh ** 0.5
            attn = (attn.reshape(-1, nw, nh, T, T) + bias_full[None]
                    ).reshape(B, nh, T, T)
            p = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
            return jnp.sum(out.astype(jnp.float32))

        def fused_loss(qkv):
            # natural cyclic bias: (1 | nw, nh, T, T)
            out = fused_mha(qkv, bias=bias, bias_grad=True, n_heads=nh)
            return jnp.sum(out.astype(jnp.float32))

        for name, loss in (("xla", xla_loss), ("fused", fused_loss)):
            if which not in (name, "both"):
                continue

            @jax.jit
            def step(x):
                g = jax.grad(loss)(x)
                return (x + 1e-30 * g).astype(x.dtype)

            x = qkv
            try:
                for _ in range(2):
                    x = step(x)
                drain(x)
            except Exception as e:
                print(f"s{s} {'shift' if shifted else 'plain':5} {name:5}: "
                      f"FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            t0 = time.perf_counter()
            iters = 20
            for _ in range(iters):
                x = step(x)
            drain(x)
            ms = (time.perf_counter() - t0) / iters * 1e3
            per_step = ms * n_blocks * 4   # x blocks x 4 chunks
            print(f"s{s} {'shift' if shifted else 'plain':5} {name:5}: "
                  f"{ms:7.2f} ms/call  -> {per_step:7.1f} ms/train-step "
                  f"(B={B}, nh={nh}, nw={nw})", flush=True)


if __name__ == "__main__":
    main()
