"""Component-level timing decomposition of the flagship text-MoRec step.

Times each piece fwd+bwd at the exact bench geometry with data-dependent
chained loops (param threading — block_until_ready alone is unreliable on
the tunneled platform). Prints ms/step per component.

Usage: python tools/decompose_step.py [component ...]
Components: encoder mha matmuls sasrec ce embed  (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

B, L, Hh = 128, 20, 512
S = L + 1
M = B * S          # 2688 sequences through the encoder
T = 30             # title tokens
DROP = 0.1


def time_grad(name, loss_fn, params, iters=20):
    """ms per fwd+bwd, chained through params so the loop is data-dependent."""
    import jax

    @jax.jit
    def step(p):
        g = jax.grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 1e-30 * b.astype(a.dtype), p, g)

    p = params
    for _ in range(3):
        p = step(p)
    drain(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p = step(p)
    drain(p)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:>10}: {ms:8.2f} ms/step")
    return ms


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import numpy as np

    which = set(sys.argv[1:]) or {"encoder", "mha", "matmuls", "sasrec",
                                  "ce", "embed"}
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    def cast(tree):
        return jax.tree.map(lambda a: a.astype(bf)
                            if a.dtype == jnp.float32 else a, tree)

    if "encoder" in which or "embed" in which:
        from idvs.morec_tpu.models.bert import BertConfig, BertModel
        bcfg = BertConfig(vocab_size=30522, hidden_size=Hh,
                          num_hidden_layers=4, num_attention_heads=8,
                          intermediate_size=2048, max_position_embeddings=512)
        ids = jax.random.randint(key, (M, T), 1, 30000)
        mask = jnp.ones((M, T), jnp.int32)
        model = BertModel(bcfg)
        params = model.init(key, ids[:2], mask[:2])

        if "encoder" in which:
            dkey = (jax.random.key(0, impl="rbg")
                    if os.environ.get("IDVS_RBG") else key)

            def enc_loss(p):
                h = model.apply(cast(p), ids, mask, False,
                                rngs={"dropout": dkey})
                return jnp.sum(h.astype(jnp.float32))
            time_grad("encoder", enc_loss, params)

        if "embed" in which:
            ecfg = BertConfig(vocab_size=30522, hidden_size=Hh,
                              num_hidden_layers=0, num_attention_heads=8,
                              intermediate_size=2048,
                              max_position_embeddings=512)
            emodel = BertModel(ecfg)
            eparams = emodel.init(key, ids[:2], mask[:2])

            def emb_loss(p):
                h = emodel.apply(cast(p), ids, mask, False,
                                 rngs={"dropout": key})
                return jnp.sum(h.astype(jnp.float32))
            time_grad("embed", emb_loss, eparams)

    if "mha" in which:
        from idvs.morec_tpu.ops.pallas.attention import fused_mha
        qkv = jax.random.normal(key, (M, T, 3 * Hh), bf)
        amask = jnp.ones((M, T), bf)

        def mha_loss(p):
            out = fused_mha(p["qkv"], amask, n_heads=8, drop_rate=DROP,
                            dropout_rng=key)
            return jnp.sum(out.astype(jnp.float32))
        time_grad("mha", mha_loss, {"qkv": qkv})

    if "matmuls" in which:
        # the encoder's matmul skeleton: per layer QKV(512->1536),
        # out(512->512), FFN(512->2048->512), x4 layers, no attention/LN
        k = jax.random.split(key, 16)
        params = {}
        for i in range(4):
            params[f"qkv{i}"] = jax.random.normal(k[4*i], (Hh, 3*Hh)) * 0.02
            params[f"o{i}"] = jax.random.normal(k[4*i+1], (Hh, Hh)) * 0.02
            params[f"up{i}"] = jax.random.normal(k[4*i+2], (Hh, 4*Hh)) * 0.02
            params[f"dn{i}"] = jax.random.normal(k[4*i+3], (4*Hh, Hh)) * 0.02
        x0 = jax.random.normal(key, (M * T, Hh), bf)

        def mm_loss(p):
            p = cast(p)
            x = x0
            for i in range(4):
                q = jax.lax.optimization_barrier(x @ p[f"qkv{i}"])
                x = jax.lax.optimization_barrier(q[:, :Hh] @ p[f"o{i}"]) + x
                u = jax.lax.optimization_barrier(x @ p[f"up{i}"])
                x = jax.lax.optimization_barrier(u @ p[f"dn{i}"]) + x
            return jnp.sum(x.astype(jnp.float32))
        time_grad("matmuls", mm_loss, params)

    if "sasrec" in which:
        from idvs.morec_tpu.models.sasrec import SASRecEncoder
        sas = SASRecEncoder(d_model=Hh, n_heads=2, n_layers=2,
                            max_seq_len=L, drop_rate=DROP)
        embs = jax.random.normal(key, (B, L, Hh), bf)
        lm = jnp.ones((B, L), jnp.float32)
        sparams = sas.init(key, embs[:2], lm[:2])

        def sas_loss(p):
            h = sas.apply(cast(p), embs, lm, False, rngs={"dropout": key})
            return jnp.sum(h.astype(jnp.float32))
        time_grad("sasrec", sas_loss, sparams)

    if "ce" in which:
        from idvs.morec_tpu.ops.losses import inbatch_debiased_ce
        ids2 = jax.random.randint(key, (B, S), 1, 100_000)
        lm = jnp.ones((B, L), jnp.float32)
        lp = jnp.zeros((B, S), jnp.float32)
        uv0 = jax.random.normal(key, (B, L, Hh), bf)
        ie0 = jax.random.normal(key, (B, S, Hh), bf)

        def ce_loss(p):
            return inbatch_debiased_ce(p["uv"], p["ie"], ids2, lm, lp)
        time_grad("ce", ce_loss, {"uv": uv0, "ie": ie0})


if __name__ == "__main__":
    main()
