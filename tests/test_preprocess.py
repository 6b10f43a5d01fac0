"""Preprocessing invariants vs reference semantics
(inbatch_sasrec_e2e_text/data_utils/preprocess.py:5-81)."""

import numpy as np
import pytest

from idvs.morec_tpu.data.preprocess import (
    read_behaviors, read_items_text, read_behaviors_pairs)
from idvs.morec_tpu.data.loader import (
    pad_user_sequences, log_mask_from_lens, sample_negatives, EvalBatches,
    TrainBatcher, BCETrainBatcher)


@pytest.fixture
def tiny_dataset(tmp_path):
    # 6 items, 4 users; user u3 too short; item i6 only used by u3 (dropped)
    news = tmp_path / "news.tsv"
    news.write_text("".join(f"i{k}\ttitle {k}\tabstract {k}\n" for k in range(1, 7)))
    behaviors = tmp_path / "behaviors.tsv"
    behaviors.write_text(
        "u1\ti1 i2 i3 i4 i5\n"
        "u2\ti2 i3 i4 i1 i5 i2\n"
        "u3\ti6 i1\n"              # len 2 < min_seq_len 3 -> dropped
        "u4\ti5 i4 i3 i2 i1 i3 i4\n")
    return str(news), str(behaviors)


def test_read_behaviors_invariants(tiny_dataset):
    news_path, behaviors_path = tiny_dataset
    dic, name2id, id2name = read_items_text(news_path)
    bd = read_behaviors(behaviors_path, dic, name2id, id2name,
                        max_seq_len=4, min_seq_len=3)
    # i6 only appears in the dropped u3 -> removed; 5 items survive
    assert bd.item_num == 5
    # dense re-id in original order: i1..i5 -> 1..5
    assert bd.item_name_to_id == {f"i{k}": k for k in range(1, 6)}
    # truncation to last max_seq_len+3 = 7: u4 keeps all 7
    # leave-one-out: train = seq[:-2]
    assert bd.users_train[0] == [1, 2, 3]           # u1
    assert bd.users_valid[0] == [1, 2, 3, 4]        # seq[-(L+2):-1] with L=4
    assert bd.users_test[0] == [1, 2, 3, 4, 5]      # seq[-(L+1):] keeps L+1 items
    # histories
    np.testing.assert_array_equal(bd.users_history_for_valid[0], [1, 2, 3])
    np.testing.assert_array_equal(bd.users_history_for_test[0], [1, 2, 3, 4])
    # pop prob: sentinel + normalized train counts
    assert bd.pop_prob_list[0] == 1.0
    assert np.isclose(bd.pop_prob_list[1:].sum(), 1.0)
    # train counts: u1 train [1,2,3], u2 train [2,3,4,1], u4 train [5,4,3,2,1]
    counts = np.array([3, 3, 3, 2, 1], dtype=float)
    np.testing.assert_allclose(bd.pop_prob_list[1:], counts / counts.sum())


def test_pad_and_mask():
    seqs, lens = pad_user_sequences({0: [3, 4], 1: [1, 2, 3, 4, 5]}, pad_to=5)
    np.testing.assert_array_equal(seqs[0], [0, 0, 0, 3, 4])
    np.testing.assert_array_equal(seqs[1], [1, 2, 3, 4, 5])
    lm = log_mask_from_lens(lens, max_seq_len=4)
    # len 2 -> head = 5-2 = 3 zeros, then 1 one
    np.testing.assert_array_equal(lm[0], [0, 0, 0, 1])
    np.testing.assert_array_equal(lm[1], [1, 1, 1, 1])


def test_sample_negatives_never_in_seq():
    rng = np.random.default_rng(0)
    seqs = np.array([[0, 0, 1, 2, 3], [4, 5, 6, 7, 8]])
    negs = sample_negatives(rng, seqs, None, item_num=10, neg_per_pos=2)
    assert negs.shape == (2, 4, 2)
    assert ((negs >= 1) & (negs <= 10)).all()
    for b in range(2):
        assert not np.isin(negs[b].ravel(), seqs[b]).any()


def test_train_batcher_static_shapes_and_determinism():
    seqs, lens = pad_user_sequences({i: [1 + i % 3, 2, 3] for i in range(10)}, 5)
    tb = TrainBatcher(seqs, lens, max_seq_len=4, batch_size=4, seed=7)
    b1 = list(tb.epoch(1))
    assert len(b1) == 3  # ceil(10/4) with wrap
    for ids, lm in b1:
        assert ids.shape == (4, 5) and lm.shape == (4, 4)
    b1again = list(tb.epoch(1))
    for (a, _), (b, _) in zip(b1, b1again):
        np.testing.assert_array_equal(a, b)
    b2 = list(tb.epoch(2))
    assert any(not np.array_equal(a[0], b[0]) for a, b in zip(b1, b2))


def test_train_batcher_wraps_batch_larger_than_dataset():
    # global batch (e.g. 8 chips x per-chip batch) larger than 2x the
    # dataset: the wrap pad must tile the permutation, not truncate
    # (regression: perm[:total-n] silently under-filled the batch)
    seqs, lens = pad_user_sequences({i: [1 + i, 2, 3] for i in range(5)}, 5)
    tb = TrainBatcher(seqs, lens, max_seq_len=4, batch_size=16, seed=7)
    (ids, lm), = list(tb.epoch(1))
    assert ids.shape == (16, 5) and lm.shape == (16, 4)
    # every user appears ceil-evenly: 16 slots over 5 users
    _, counts = np.unique(ids[:, 0], return_counts=True)
    assert counts.max() - counts.min() <= 1


def test_eval_batches_order_exact_padding():
    # 5 users, batch 2, 2 shards -> pad to 8 by repeating the last user
    seqs, lens = pad_user_sequences({i: [i + 1, i + 2, i + 3] for i in range(5)}, 5)
    hist = np.zeros((5, 3), dtype=np.int64)
    ev = EvalBatches(seqs, lens, max_seq_len=4, batch_size=2,
                     history=hist, num_shards=2)
    batches = list(ev)
    assert len(batches) == 4
    valid = np.concatenate([b[4] for b in batches])
    assert valid.sum() == 5 and valid[:5].all()
    # inputs drop the target and stay width L
    ids, lm, target, _, _ = batches[0]
    assert ids.shape == (2, 4)
    np.testing.assert_array_equal(ids[0], [0, 0, 1, 2])
    assert target[0] == 3
    np.testing.assert_array_equal(lm[0], [0, 0, 1, 1])


def test_bce_batcher_negatives_layout():
    seqs, lens = pad_user_sequences({i: [1, 2, 3] for i in range(4)}, 5)
    tb = BCETrainBatcher(seqs, lens, max_seq_len=4, batch_size=2,
                         item_num=50, seed=3)
    pos, neg, lm = next(iter(tb.epoch(0)))
    assert pos.shape == neg.shape == (2, 5)
    # last neg slot is always 0 (reference dataset.py:40)
    assert (neg[:, -1] == 0).all()
    # negatives only where log_mask is on
    assert (neg[:, :-1][lm == 0] == 0).all()
    assert (neg[:, :-1][lm != 0] >= 1).all()


def test_dssm_pairs(tiny_dataset):
    news_path, behaviors_path = tiny_dataset
    dic, name2id, id2name = read_items_text(news_path)
    pd = read_behaviors_pairs(behaviors_path, dic, name2id,
                              min_seq_len=3, max_seq_len=4)
    assert pd.user_num == 3
    # train pairs = sum of train lens: u1:3 + u2:4 + u4:5 = 12
    assert pd.train_pairs.shape == (12, 2)
    assert pd.valid_pairs.shape == (3, 2)
    # users ided from 1 in file order
    assert pd.train_pairs[0, 0] == 1
