"""Two-stage pipeline through the runner: frozen encoder -> catalog cache ->
trainable FC/MLP + SASRec (reference bce_text/main-2stage(SASRec))."""

import logging
import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.parallel.mesh import make_mesh
from idvs.morec_tpu.train.runner import Trainer

from tests.test_text_morec_e2e import bert_dir, synth, quiet  # fixtures


def test_two_stage_text_runner(tmp_path, bert_dir):
    root = synth(tmp_path)
    cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                 behaviors="behaviors.tsv", item_tower="modal",
                 modality="text", stage="two_stage", loss="bce",
                 bert_model_load="bert-tiny-test",
                 pretrained_models_dir=os.path.dirname(bert_dir),
                 freeze_paras_before=10000, dnn_layers=2,
                 num_words_title=8, news_attributes=("title",),
                 max_seq_len=6, min_seq_len=3, batch_size=4,
                 embedding_dim=16, transformer_block=1,
                 num_attention_heads=2, epoch=1, lr=1e-3, eval_batch_size=16)
    os.chdir(tmp_path)
    mesh = make_mesh(jax.devices("cpu")[:2])
    tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh)
    tr.load_data()
    # cache built from the frozen encoder: (item_num+1, word_dim=24)
    assert tr.item_content is not None
    assert tr.item_content.shape == (tr.item_num + 1, 24)
    assert cfg.word_embedding_dim == 24
    np.testing.assert_array_equal(np.asarray(tr.item_content[0]), 0.0)
    assert tr.encoder_bundle is None  # encoder discarded after caching

    tr.build_model()
    it = iter(tr.batcher.epoch(1))
    for _ in range(3):
        tr.state, loss = tr.train_step(tr.state, tr.make_batch(next(it)))
        assert np.isfinite(float(loss))
    hit, _ = tr.run_eval("valid")
    assert 0.0 <= hit <= 1.0


def test_gradient_accumulation(tmp_path, bert_dir):
    """accumulation_step=2: params move every 2nd micro-step only."""
    root = synth(tmp_path)
    cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                 behaviors="behaviors.tsv", item_tower="id",
                 max_seq_len=6, min_seq_len=3, batch_size=4,
                 embedding_dim=16, transformer_block=1, epoch=1,
                 lr=1e-2, accumulation_step=2)
    os.chdir(tmp_path)
    mesh = make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh)
    tr.load_data()
    tr.build_model()
    it = iter(tr.batcher.epoch(1))

    def emb():
        return np.asarray(tr.state.params["params"]["id_embedding"]["embedding"]).copy()

    p0 = emb()
    tr.state, _ = tr.train_step(tr.state, tr.make_batch(next(it)))
    p1 = emb()
    np.testing.assert_array_equal(p0, p1)  # first micro-step: accumulate only
    tr.state, _ = tr.train_step(tr.state, tr.make_batch(next(it)))
    p2 = emb()
    assert not np.allclose(p1, p2)         # second micro-step: apply


def test_fusion_end2end_through_trainer(tmp_path, bert_dir):
    """ID (+) encoder fusion trained end-to-end (bce_text/id_plus_mo-end2end)."""
    root = synth(tmp_path)
    for tower in ("modal_id_add", "modal_id_cat"):
        cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                     behaviors="behaviors.tsv", item_tower=tower,
                     modality="text", stage="end2end", loss="bce",
                     bert_model_load="bert-tiny-test",
                     pretrained_models_dir=os.path.dirname(bert_dir),
                     num_words_title=8, news_attributes=("title",),
                     max_seq_len=6, min_seq_len=3, batch_size=4,
                     embedding_dim=16, word_embedding_dim=24,
                     transformer_block=1, num_attention_heads=2, epoch=1,
                     lr=1e-3, fine_tune_lr=1e-4, eval_batch_size=16)
        os.chdir(tmp_path)
        from idvs.morec_tpu.models.encoders_zoo import load_encoder
        mesh = make_mesh(jax.devices("cpu")[:1])
        tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                     encoder_bundle=load_encoder(cfg))
        tr.load_data()
        tr.build_model()
        # both towers exist in the tree
        assert "id_embedding" in tr.state.params["params"]
        assert "encoder" in tr.state.params["params"]
        it = iter(tr.batcher.epoch(1))
        for _ in range(2):
            tr.state, loss = tr.train_step(tr.state, tr.make_batch(next(it)))
            assert np.isfinite(float(loss))
        hit, _ = tr.run_eval("valid")
        assert 0.0 <= hit <= 1.0


def test_dedup_items_equivalence(tmp_path, bert_dir):
    """--dedup_items: encoding unique items once must give the SAME loss as
    full per-occurrence encoding when the encoder is deterministic."""
    root = synth(tmp_path)
    losses = {}
    for dedup in (False, True):
        cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                     behaviors="behaviors.tsv", item_tower="modal",
                     modality="text", stage="end2end",
                     bert_model_load="bert-tiny-test",
                     pretrained_models_dir=os.path.dirname(bert_dir),
                     num_words_title=8, news_attributes=("title",),
                     max_seq_len=6, min_seq_len=3, batch_size=4,
                     embedding_dim=16, word_embedding_dim=24,
                     transformer_block=1, num_attention_heads=2, epoch=1,
                     lr=1e-3, drop_rate=0.0, dedup_items=dedup,
                     compute_dtype="float32", eval_batch_size=16)
        os.chdir(tmp_path)
        from idvs.morec_tpu.models.encoders_zoo import load_encoder
        mesh = make_mesh(jax.devices("cpu")[:1])
        tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                     encoder_bundle=load_encoder(cfg))
        tr.load_data()
        tr.build_model()
        raw = next(iter(tr.batcher.epoch(1)))
        batch = tr.make_batch(raw)
        if dedup:
            assert "uniq_ids" in batch
        tr.state, loss = tr.train_step(tr.state, batch)
        losses[dedup] = float(loss)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_dedup_items_multishard(tmp_path, bert_dir):
    """Per-shard dedup packing on a 2-device mesh matches full encoding."""
    root = synth(tmp_path)
    losses = {}
    for dedup in (False, True):
        cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                     behaviors="behaviors.tsv", item_tower="modal",
                     modality="text", stage="end2end",
                     bert_model_load="bert-tiny-test",
                     pretrained_models_dir=os.path.dirname(bert_dir),
                     num_words_title=8, news_attributes=("title",),
                     max_seq_len=6, min_seq_len=3, batch_size=4,
                     embedding_dim=16, word_embedding_dim=24,
                     transformer_block=1, num_attention_heads=2, epoch=1,
                     lr=1e-3, drop_rate=0.0, dedup_items=dedup,
                     compute_dtype="float32", eval_batch_size=16)
        os.chdir(tmp_path)
        from idvs.morec_tpu.models.encoders_zoo import load_encoder
        mesh = make_mesh(jax.devices("cpu")[:2])
        tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                     encoder_bundle=load_encoder(cfg))
        tr.load_data()
        tr.build_model()
        batch = tr.make_batch(next(iter(tr.batcher.epoch(1))))
        if dedup:
            assert "uniq_ids" in batch
            assert batch["uniq_ids"].shape[0] % 2 == 0  # 2 shards stacked
        tr.state, loss = tr.train_step(tr.state, batch)
        losses[dedup] = float(loss)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_encoder_chunk_equivalence(tmp_path, bert_dir):
    """--encoder_chunk microbatching must give the same loss as one-shot
    encoding when the encoder is deterministic."""
    root = synth(tmp_path)
    losses = {}
    for chunk in (0, 7):  # B*S = 4*7 = 28 slots -> 4 chunks of 7
        cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                     behaviors="behaviors.tsv", item_tower="modal",
                     modality="text", stage="end2end",
                     bert_model_load="bert-tiny-test",
                     pretrained_models_dir=os.path.dirname(bert_dir),
                     num_words_title=8, news_attributes=("title",),
                     max_seq_len=6, min_seq_len=3, batch_size=4,
                     embedding_dim=16, word_embedding_dim=24,
                     transformer_block=1, num_attention_heads=2, epoch=1,
                     lr=1e-3, drop_rate=0.0, encoder_chunk=chunk,
                     compute_dtype="float32", eval_batch_size=16)
        os.chdir(tmp_path)
        from idvs.morec_tpu.models.encoders_zoo import load_encoder
        mesh = make_mesh(jax.devices("cpu")[:1])
        tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                     encoder_bundle=load_encoder(cfg))
        tr.load_data()
        tr.build_model()
        tr.state, loss = tr.train_step(
            tr.state, tr.make_batch(next(iter(tr.batcher.epoch(1)))))
        losses[chunk] = float(loss)
    np.testing.assert_allclose(losses[7], losses[0], rtol=1e-5)
