"""Cold/new-item eval (reference special.py semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idvs.morec_tpu.models.model import RecModel
from idvs.morec_tpu.train.special_eval import (eval_cold, eval_new,
                                               make_new_item_eval_step,
                                               read_behaviors_special)


def test_read_behaviors_special(tmp_path):
    cold = tmp_path / "cold.tsv"
    cold.write_text("u0\ti1 i2 i3\nu1\ti2 i3 i1\n")
    new = tmp_path / "new.tsv"
    new.write_text("u0\ti1 i2 i9\nu1\ti3 i1 i9\nu2\ti2 i1 i8\n")
    name2id = {f"i{k}": k for k in range(1, 4)}
    before_name2id = {f"i{k}": k for k in range(1, 10)}
    before_dic = {k: f"content{k}" for k in range(1, 10)}
    sc, hc, sn, hn, new_content = read_behaviors_special(
        str(cold), str(new), name2id, before_dic, before_name2id, True)
    assert sc[0] == [1, 2, 3]
    np.testing.assert_array_equal(hc[0], [1, 2])
    # i9 reused across users -> same new id 1; i8 -> new id 2
    assert sn[0] == [1, 2, 1] and sn[1] == [3, 1, 1] and sn[2] == [2, 1, 2]
    assert new_content == {1: "content9", 2: "content8"}


def _model_and_table(item_num=20, D=8, L=4):
    model = RecModel(user_tower="sasrec", item_tower="id", item_num=item_num,
                     embedding_dim=D, num_attention_heads=2,
                     transformer_block=1, max_seq_len=L, drop_rate=0.0)
    ids = jnp.ones((2, L + 1), jnp.int32)
    lm = jnp.ones((2, L), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, None, lm)
    table = model.apply(params, jnp.arange(item_num + 1), None, True,
                        method=RecModel.item_embs)
    return model, params, table


def test_eval_cold_runs():
    model, params, table = _model_and_table()
    seqs = {0: [1, 2, 3], 1: [4, 5, 2]}
    hist = {0: np.array([1, 2]), 1: np.array([4, 5])}
    hit, ndcg = eval_cold(model, params, table, seqs, hist,
                          max_seq_len=4, batch_size=2)
    assert 0.0 <= hit <= 1.0 and ndcg <= hit + 1e-9


def test_eval_new_target_always_ranked():
    """If the new item's embedding strongly matches the user state, rank 1."""
    model, params, table = _model_and_table()
    seqs_for_new = {0: [1, 2, 1], 1: [3, 4, 1]}  # target = new item id 1
    hist = {0: np.array([1, 2]), 1: np.array([3, 4])}
    # new-item embedding = huge along the user vec direction -> rank 1
    L = 4
    inputs = {0: [1, 2], 1: [3, 4]}
    from idvs.morec_tpu.data.loader import pad_user_sequences
    seqs, lens = pad_user_sequences(inputs, L)
    lm = (np.arange(L)[None, :] >= (L - lens)[:, None]).astype(np.float32)
    states = model.apply(params, table[jnp.asarray(seqs.astype(np.int32))],
                         jnp.asarray(lm), True, method=RecModel.user_states)
    uvec = np.asarray(states[:, -1])
    new_embs = np.zeros((2, 8), np.float32)
    new_embs[1] = 1e3 * uvec[0] / np.linalg.norm(uvec[0])
    hit, ndcg = eval_new(model, params, table, jnp.asarray(new_embs),
                         seqs_for_new, hist, max_seq_len=4, batch_size=2)
    # user 0's target (new id 1) has an enormous score -> hit; user 1 shares
    # the same new item id, so its score vs user1's state is arbitrary
    assert hit >= 0.5
