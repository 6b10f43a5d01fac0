"""SASRec / RecModel behavior tests: causality, padding-key masking,
dropout determinism, tower composition shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idvs.morec_tpu.models.sasrec import SASRecEncoder
from idvs.morec_tpu.models.model import RecModel
from idvs.morec_tpu.ops.masking import causal_additive_mask


def _enc(L=6, D=16):
    return SASRecEncoder(d_model=D, n_heads=2, n_layers=2,
                         max_seq_len=L, drop_rate=0.1)


def test_causal_mask_values():
    lm = jnp.asarray([[0., 1., 1.], [1., 1., 1.]])
    m = causal_additive_mask(lm)
    assert m.shape == (2, 1, 3, 3)
    # query 2 of user 0: key 0 is padding -> -1e9; keys 1,2 visible
    np.testing.assert_array_equal(np.asarray(m[0, 0, 2]), [-1e9, 0, 0])
    # future keys masked
    np.testing.assert_array_equal(np.asarray(m[1, 0, 0]), [0, -1e9, -1e9])


def test_causality_future_inputs_dont_affect_past():
    enc = _enc()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 16))
    lm = jnp.ones((2, 6))
    params = enc.init(jax.random.PRNGKey(1), x, lm, True)
    out1 = enc.apply(params, x, lm, True)
    x2 = x.at[:, 4:, :].set(999.0)  # perturb only positions 4,5
    out2 = enc.apply(params, x2, lm, True)
    np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]),
                               rtol=1e-5)
    assert not np.allclose(np.asarray(out1[:, 4:]), np.asarray(out2[:, 4:]))


def test_padded_keys_dont_leak():
    enc = _enc()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16))
    lm = jnp.asarray([[0., 0., 1., 1., 1., 1.]])
    params = enc.init(jax.random.PRNGKey(1), x, lm, True)
    out1 = enc.apply(params, x, lm, True)
    x2 = x.at[:, :2, :].set(-777.0)  # perturb only padded positions
    out2 = enc.apply(params, x2, lm, True)
    # valid positions unchanged (padding enters only through masked keys)
    np.testing.assert_allclose(np.asarray(out1[:, 2:]), np.asarray(out2[:, 2:]),
                               rtol=1e-5)


def test_dropout_rng_determinism():
    enc = _enc()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    lm = jnp.ones((2, 6))
    params = enc.init(jax.random.PRNGKey(1), x, lm, True)
    d = jax.random.PRNGKey(42)
    a = enc.apply(params, x, lm, False, rngs={"dropout": d})
    b = enc.apply(params, x, lm, False, rngs={"dropout": d})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = enc.apply(params, x, lm, False, rngs={"dropout": jax.random.PRNGKey(43)})
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_id_model_item_and_user_shapes():
    model = RecModel(user_tower="sasrec", item_tower="id", item_num=50,
                     embedding_dim=16, num_attention_heads=2,
                     transformer_block=2, max_seq_len=4, drop_rate=0.1)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 51, (3, 5)))
    lm = jnp.ones((3, 4))
    params = model.init(jax.random.PRNGKey(0), ids, None, lm, True)
    embs = model.apply(params, ids.reshape(-1), None, True,
                       method=RecModel.item_embs)
    assert embs.shape == (15, 16)
    # padding id 0 embeds to exactly zero (padding_idx parity)
    z = model.apply(params, jnp.zeros((2,), jnp.int32), None, True,
                    method=RecModel.item_embs)
    np.testing.assert_array_equal(np.asarray(z), 0.0)
    states = model.apply(params, embs.reshape(3, 5, 16)[:, :-1], lm, True,
                         method=RecModel.user_states)
    assert states.shape == (3, 4, 16)


def test_dssm_model_shapes():
    model = RecModel(user_tower="dssm", item_tower="id", item_num=50,
                     user_num=20, embedding_dim=16, dnn_layers=2, drop_rate=0.1)
    users = jnp.asarray([1, 2, 3])
    items = jnp.asarray(np.random.default_rng(0).integers(1, 51, (3, 3)))
    params = model.init(jax.random.PRNGKey(0), items, None, None)
    uv = model.apply(params, users, True, method=RecModel.user_vec)
    assert uv.shape == (3, 16)
    iv = model.apply(params, items.reshape(-1), None, True,
                     method=RecModel.item_embs)
    assert iv.shape == (9, 16)


def test_two_stage_tower():
    model = RecModel(user_tower="sasrec", item_tower="modal", stage="two_stage",
                     item_num=50, embedding_dim=16, word_embedding_dim=32,
                     num_attention_heads=2, transformer_block=1,
                     max_seq_len=4, dnn_layers=2, drop_rate=0.1)
    ids = jnp.ones((6,), jnp.int32)
    cached = jnp.asarray(np.random.default_rng(0).normal(size=(6, 32)),
                         dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, cached, True,
                        method=RecModel.item_embs)
    out = model.apply(params, ids, cached, True, method=RecModel.item_embs)
    assert out.shape == (6, 16)


def test_fusion_towers():
    for tower in ("modal_id_add", "modal_id_cat"):
        model = RecModel(user_tower="sasrec", item_tower=tower, stage="two_stage",
                         item_num=50, embedding_dim=16, word_embedding_dim=32,
                         num_attention_heads=2, transformer_block=1,
                         max_seq_len=4, dnn_layers=1, drop_rate=0.1)
        ids = jnp.asarray([1, 2, 3])
        cached = jnp.ones((3, 32), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), ids, cached, True,
                            method=RecModel.item_embs)
        out = model.apply(params, ids, cached, True, method=RecModel.item_embs)
        assert out.shape == (3, 16)


def test_transformer_block_mixed_tail_fallback(monkeypatch):
    """At large d_model only the projection epilogue fits VMEM
    (fused_proj_resln succeeds, fused_mlp_resln declines). The block must
    keep the fused projection tail's output and fall back ONLY for the FFN
    — not discard it and recompute the whole block (the pre-fix behavior).
    Simulated off-TPU: gates forced open (kernels run in interpret mode,
    drop 0 exact) with the FFN edition forced to decline."""
    from idvs.morec_tpu.models import layers as L
    from idvs.morec_tpu.ops.pallas import mlp as M
    from idvs.morec_tpu.models.sasrec import TransformerBlock

    rng = np.random.default_rng(5)
    B, T, D = 2, 6, 16
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    lm = jnp.ones((B, T), jnp.float32)
    mask = causal_additive_mask(lm)
    blk = TransformerBlock(d_model=D, n_heads=2, drop_rate=0.0)
    params = blk.init(jax.random.PRNGKey(0), x, mask, True)

    want = blk.apply(params, x, mask, True)   # gates closed: full XLA path

    monkeypatch.setattr(L, "fused_tail_gates", lambda override=None:
                        (True, True))
    monkeypatch.setattr(M, "fused_mlp_resln",
                        lambda *a, **k: None)   # FFN edition declines
    got = blk.apply(params, x, mask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
