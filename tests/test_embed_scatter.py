"""Pallas embedding-backward scatter-add kernel (ops/pallas/embed_scatter.py).

Exactness vs numpy add.at (the semantics of torch's embedding backward
`index_add_`, which the reference hits inside HF BertModel —
reference inbatch_sasrec_e2e_text/run.py word_embeddings path), the custom
VJP wiring, and the in-model gate: a BertModel with fused_embed_backward=True
must produce the same grads as the plain nn.Embed edition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idvs.morec_tpu.ops.pallas.embed_scatter import (embed_gather,
                                                     kernel_supported,
                                                     scatter_add_rows)


def test_scatter_add_rows_exact_vs_numpy():
    rng = np.random.default_rng(0)
    M, D, V = 300, 65, 50
    ids = rng.integers(0, V, size=(M,)).astype(np.int32)
    dx = rng.normal(size=(M, D)).astype(np.float32)
    ref = np.zeros((V, D), np.float32)
    np.add.at(ref, ids, dx)
    out = scatter_add_rows(jnp.asarray(ids), jnp.asarray(dx), V,
                           bm=128, bd=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_scatter_add_rows_bf16_accumulates_f32():
    rng = np.random.default_rng(1)
    M, D, V = 257, 130, 20   # heavy duplicates, unpadded shapes
    ids = rng.integers(0, V, size=(M,)).astype(np.int32)
    dx = rng.normal(size=(M, D)).astype(np.float32)
    dxb = jnp.asarray(dx).astype(jnp.bfloat16)
    ref = np.zeros((V, D), np.float32)
    np.add.at(ref, ids, np.asarray(dxb).astype(np.float32))
    out = scatter_add_rows(jnp.asarray(ids), dxb, V,
                           bm=128, bd=128, interpret=True)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_embed_gather_vjp():
    rng = np.random.default_rng(2)
    V, D = 40, 33
    ids = rng.integers(0, V, size=(6, 11)).astype(np.int32)
    cot = rng.normal(size=(6, 11, D)).astype(np.float32)
    table = rng.normal(size=(V, D)).astype(np.float32)

    def loss(t):
        return (embed_gather(t, jnp.asarray(ids), interpret=True)
                * jnp.asarray(cot)).sum()

    # forward is the plain gather
    np.testing.assert_array_equal(
        np.asarray(embed_gather(jnp.asarray(table), jnp.asarray(ids),
                                interpret=True)), table[ids])
    g = jax.grad(loss)(jnp.asarray(table))
    ref = np.zeros((V, D), np.float32)
    np.add.at(ref, ids.reshape(-1), cot.reshape(-1, D))
    np.testing.assert_allclose(np.asarray(g), ref, rtol=0, atol=1e-6)


def test_kernel_supported_bounds():
    assert kernel_supported(30522, 512)        # BERT vocab
    assert kernel_supported(100_001, 512)      # IDRec table at bd=128
    assert not kernel_supported(300_000, 512)  # stripe exceeds VMEM


def test_bert_scatter_embed_matches_plain_grads():
    from idvs.morec_tpu.models.bert import BertConfig, BertModel

    kw = dict(vocab_size=97, hidden_size=32, num_hidden_layers=1,
              num_attention_heads=2, intermediate_size=64,
              max_position_embeddings=16, type_vocab_size=2,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
              fused_attention=False, fused_ffn=False)
    plain = BertModel(BertConfig(**kw, fused_embed_backward=False))
    fused = BertModel(BertConfig(**kw, fused_embed_backward=True))

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 97, size=(4, 12)).astype(np.int32))
    mask = jnp.ones((4, 12), jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), ids, mask)

    def loss(model, p):
        return (model.apply(p, ids, mask) ** 2).sum()

    out_p = plain.apply(params, ids, mask)
    out_f = fused.apply(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_f))

    g_p = jax.grad(lambda p: loss(plain, p))(params)
    g_f = jax.grad(lambda p: loss(fused, p))(params)
    for kp, a in jax.tree_util.tree_leaves_with_path(g_p):
        b = g_f
        for k in kp:
            b = b[k.key]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(kp))
