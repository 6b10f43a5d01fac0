"""Mesh-sharded eval == single-device eval, exactly.

The catalog-through-encoder pass (compute_item_embeddings) and the user
scoring loop (evaluate) shard their work P('data') over the mesh — this
asserts both produce the same numbers as the unsharded path on the 8-device
virtual CPU mesh (the reference shards this work across ranks:
inbatch_sasrec_e2e_text/data_utils/dataset.py:68-94, metrics.py:33-46).
"""

import jax
import jax.numpy as jnp
import numpy as np

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.data.loader import EvalBatches, pad_user_sequences
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.parallel.mesh import make_mesh, replicate
from idvs.morec_tpu.train.evaluate import compute_item_embeddings, evaluate

ITEM_NUM, N_USERS, L, D = 67, 21, 8, 16


def _users(rng):
    users_valid, hist = {}, {}
    for uid in range(N_USERS):
        n = int(rng.integers(2, L + 2))
        users_valid[uid] = rng.integers(1, ITEM_NUM + 1, size=n).tolist()
        hist[uid] = rng.integers(1, ITEM_NUM + 1,
                                 size=int(rng.integers(1, L))).astype(np.int64)
    return users_valid, hist


def _eval_batches(users_valid, hist):
    seqs, lens = pad_user_sequences(users_valid, L + 1)
    h = np.zeros((N_USERS, L + 2), np.int64)
    for row, uid in enumerate(sorted(hist)):
        h[row, :len(hist[uid])] = hist[uid]
    return EvalBatches(seqs, lens, L, 4, h, num_shards=1)


def _build(cfg, encoder=None, content=None):
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)
    ids = jnp.ones((2, L + 1), jnp.int32)
    lm = jnp.ones((2, L), jnp.float32)
    c = None if content is None else content[ids.reshape(-1)]
    params = model.init(jax.random.PRNGKey(3), ids, c, lm)
    return model, params


def test_sharded_eval_matches_single_device_id_tower():
    rng = np.random.default_rng(0)
    users_valid, hist = _users(rng)
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, drop_rate=0.0, compute_dtype="float32")
    model, params = _build(cfg)

    mesh = make_mesh()   # all 8 virtual devices
    assert mesh.devices.size == 8
    params_r = replicate(mesh, params)

    t1 = compute_item_embeddings(model, params, ITEM_NUM, None, D, batch_size=16)
    t8 = compute_item_embeddings(model, params_r, ITEM_NUM, None, D,
                                 batch_size=2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1),
                               rtol=1e-6, atol=1e-6)

    r1 = evaluate(model, params, t1, _eval_batches(users_valid, hist))
    r8 = evaluate(model, params_r, t8, _eval_batches(users_valid, hist),
                  mesh=mesh)
    np.testing.assert_allclose(r8, r1, rtol=1e-6, atol=1e-7)


def test_sharded_eval_matches_single_device_text_tower():
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.text_tower import TextTower

    rng = np.random.default_rng(1)
    users_valid, hist = _users(rng)
    T = 6
    tokens = rng.integers(1, 50, size=(ITEM_NUM + 1, T)).astype(np.int32)
    attmask = np.ones_like(tokens)
    content = jnp.asarray(np.concatenate([tokens, attmask], axis=1))

    bcfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=16, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    cfg = Config(item_tower="modal", modality="text", loss="inbatch_ce",
                 max_seq_len=L, embedding_dim=D, drop_rate=0.0,
                 word_embedding_dim=16, compute_dtype="float32")
    encoder = TextTower(net=BertModel(bcfg), embedding_dim=D,
                        word_embedding_dim=16, pooling="cls",
                        attr_lengths=(T,))
    model, params = _build(cfg, encoder, content)

    mesh = make_mesh()
    params_r = replicate(mesh, params)
    t1 = compute_item_embeddings(model, params, ITEM_NUM, content, D,
                                 batch_size=16)
    t8 = compute_item_embeddings(model, params_r, ITEM_NUM, content, D,
                                 batch_size=2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1),
                               rtol=1e-6, atol=1e-6)

    r1 = evaluate(model, params, t1, _eval_batches(users_valid, hist))
    r8 = evaluate(model, params_r, t8, _eval_batches(users_valid, hist),
                  mesh=mesh)
    np.testing.assert_allclose(r8, r1, rtol=1e-6, atol=1e-7)
