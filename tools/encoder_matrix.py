"""In-context encoder cost matrix: time the full BERT-small encoder fwd+bwd
at the bench geometry under ablations, in ONE process (env toggles are read
at trace time):

  base     — as trained (fused Pallas attention, fences, dropout 0.1)
  noattn   — attention replaced by identity (isolates MHA in context)
  nodrop   — all dropout rates 0 (isolates dropout/threefry cost)
  rbg      — dropout keys use the hardware rbg PRNG instead of threefry
  nofence  — fusion fences disabled
  xla_attn — the plain XLA attention path (what the Pallas kernel replaces)

Usage: python tools/encoder_matrix.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

B, L, Hh = 128, 20, 512
M, T = B * (L + 1), 30


def main():
    import jax
    import jax.numpy as jnp
    from idvs.morec_tpu.models.bert import BertConfig, BertModel

    which = sys.argv[1:] or ["base", "noattn", "nodrop", "rbg", "nofence",
                             "xla_attn"]
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (M, T), 1, 30000)
    amask = jnp.ones((M, T), jnp.int32)
    bf = jnp.bfloat16

    def cast(tree):
        return jax.tree.map(lambda a: a.astype(bf)
                            if a.dtype == jnp.float32 else a, tree)

    def run(name, *, drop=0.1, env=(), rbg=False, fused=None):
        cfg = BertConfig(vocab_size=30522, hidden_size=Hh,
                         num_hidden_layers=4, num_attention_heads=8,
                         intermediate_size=2048, max_position_embeddings=512,
                         hidden_dropout_prob=drop,
                         attention_probs_dropout_prob=drop,
                         fused_attention=fused)
        model = BertModel(cfg)
        params = model.init(key, ids[:2], amask[:2])
        dkey = jax.random.key(0, impl="rbg") if rbg else key
        for k in env:
            os.environ[k] = "1"

        def loss(p):
            h = model.apply(cast(p), ids, amask, False,
                            rngs={"dropout": dkey})
            return jnp.sum(h.astype(jnp.float32))

        @jax.jit
        def step(p):
            g = jax.grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b.astype(a.dtype),
                                p, g)

        p = params
        for _ in range(3):
            p = step(p)
        drain(p)
        t0 = time.perf_counter()
        for _ in range(20):
            p = step(p)
        drain(p)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        for k in env:
            del os.environ[k]
        print(f"{name:>9}: {ms:8.2f} ms/step", flush=True)

    if "base" in which:
        run("base")
    if "nofmlp" in which:     # XLA FFN composition instead of the fused kernel
        run("nofmlp", env=("IDVS_NO_FMLP",))
    if "rbg_nofmlp" in which:  # the pre-kernel bench composition (rbg dropout)
        run("rbg_nofmlp", rbg=True, env=("IDVS_NO_FMLP",))
    if "rbg_fmlp" in which:    # the bench composition with the fused FFN
        run("rbg_fmlp", rbg=True)
    if "noattn" in which:
        run("noattn", env=("IDVS_NO_ATTN",))
    if "nodrop" in which:
        run("nodrop", drop=0.0)
    if "rbg" in which:
        run("rbg", rbg=True)
    if "nofence" in which:
        run("nofence", env=("IDVS_NO_FENCE",))
    if "xla_attn" in which:
        run("xla_attn", fused=False)
    if "sgemb" in which:
        run("sgemb", env=("IDVS_SG_EMB",))


if __name__ == "__main__":
    main()
