"""(a) Bit-exact checkpoint resume: 2 epochs straight == 1 epoch + save +
restore + 1 epoch (deterministic batcher + step-keyed dropout rng).
(b) Device eval pipeline vs a naive per-user numpy ranking loop (the
reference's metrics.py:90-102 semantics)."""

import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.parallel.mesh import make_mesh
from idvs.morec_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from idvs.morec_tpu.train.runner import Trainer

from tests.test_train_integration import synth_dataset, quiet_log


def _trainer(tmp_path, **kw):
    root = synth_dataset(tmp_path)
    cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                 behaviors="behaviors.tsv", max_seq_len=8, min_seq_len=3,
                 batch_size=8, embedding_dim=16, transformer_block=1,
                 epoch=1, lr=1e-3, eval_batch_size=32, drop_rate=0.1, **kw)
    os.chdir(tmp_path)
    mesh = make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, log_file=quiet_log(), log_screen=quiet_log(), mesh=mesh)
    tr.load_data()
    tr.build_model()
    return tr


def _run_epoch(tr, epoch):
    losses = []
    for raw in tr.batcher.epoch(epoch):
        tr.state, loss = tr.train_step(tr.state, tr.make_batch(raw))
        losses.append(float(loss))
    return losses


def test_bitexact_resume(tmp_path):
    tr1 = _trainer(tmp_path)
    _run_epoch(tr1, 1)
    straight = _run_epoch(tr1, 2)

    tr2 = _trainer(tmp_path)
    _run_epoch(tr2, 1)
    path = save_checkpoint(str(tmp_path / "ck"), 1, tr2.state)
    tr3 = _trainer(tmp_path)
    tr3.state, _ = load_checkpoint(path, tr3.state)
    resumed = _run_epoch(tr3, 2)
    np.testing.assert_array_equal(np.asarray(straight), np.asarray(resumed))


def test_eval_matches_naive_ranking(tmp_path):
    tr = _trainer(tmp_path)
    _run_epoch(tr, 1)
    hit, ndcg = tr.run_eval("valid")

    # naive per-user numpy eval (reference metrics.py semantics)
    from idvs.morec_tpu.train.evaluate import compute_item_embeddings
    table = np.asarray(compute_item_embeddings(
        tr.model, tr.state.params, tr.item_num, tr.item_content, 16, 64))
    bd = tr.bd
    L = tr.cfg.max_seq_len
    hits, ndcgs = [], []
    for uid in sorted(bd.users_valid.keys()):
        seq = bd.users_valid[uid]
        tokens, target = seq[:-1], seq[-1]
        pad = [0] * (L - len(tokens)) + tokens
        lmask = np.asarray([0.0] * (L - len(tokens)) + [1.0] * len(tokens),
                           np.float32)
        states = tr.model.apply(tr.state.params,
                                jnp.asarray(table[pad])[None],
                                jnp.asarray(lmask)[None], True,
                                method="user_states")
        uvec = np.asarray(states[0, -1])
        scores = table @ uvec
        scores[bd.users_history_for_valid[uid]] = -np.inf
        scores = scores[1:]
        order = np.argsort(-scores)
        rank = int(np.where(order == target - 1)[0][0]) + 1
        hits.append(1.0 if rank <= 10 else 0.0)
        ndcgs.append(1.0 / np.log2(rank + 1) if rank <= 10 else 0.0)
    np.testing.assert_allclose(hit, np.mean(hits), atol=1e-6)
    np.testing.assert_allclose(ndcg, np.mean(ndcgs), atol=1e-5)


def test_load_latest_checkpoint(tmp_path):
    tr = _trainer(tmp_path)
    _run_epoch(tr, 1)
    save_checkpoint(tr.model_dir, 1, tr.state)
    save_checkpoint(tr.model_dir, 3, tr.state)
    tr2 = _trainer(tmp_path)
    tr2.cfg.load_ckpt_name = "latest"
    tr2.cfg.mode = "test"
    hit, ndcg = tr2.test()  # resolves epoch-3.ckpt via latest_checkpoint
    assert 0.0 <= hit <= 1.0
