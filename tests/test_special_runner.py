"""Cold/new-item eval wired through the Trainer test path (text end2end)."""

import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.parallel.mesh import make_mesh
from idvs.morec_tpu.train.runner import Trainer

from tests.test_text_morec_e2e import bert_dir, synth, quiet  # fixtures


def test_special_eval_through_trainer(tmp_path, bert_dir):
    root = synth(tmp_path, n_users=40, n_items=25)
    base = tmp_path / "TINY"
    # cold: existing items; new: target i30 absent from behaviors (only in news)
    (base / "news.tsv").write_text(
        "".join(f"i{k}\ttitle item {k}\tabs {k}\n" for k in range(1, 31)))
    (base / "cold.tsv").write_text("u0\ti1 i2 i3 i4\nu1\ti5 i6 i7 i2\n")
    (base / "new.tsv").write_text("u0\ti1 i2 i3 i30\nu1\ti5 i6 i7 i29\n")
    cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                 behaviors="behaviors.tsv", cold_behaviors="cold.tsv",
                 new_behaviors="new.tsv", item_tower="modal", modality="text",
                 stage="end2end", bert_model_load="bert-tiny-test",
                 pretrained_models_dir=os.path.dirname(bert_dir),
                 num_words_title=8, news_attributes=("title",),
                 max_seq_len=6, min_seq_len=3, batch_size=4,
                 embedding_dim=16, word_embedding_dim=24,
                 transformer_block=1, num_attention_heads=2, epoch=1,
                 eval_batch_size=8, mode="test")
    os.chdir(tmp_path)
    from idvs.morec_tpu.models.encoders_zoo import load_encoder
    mesh = make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                 encoder_bundle=load_encoder(cfg))
    tr.load_data()
    tr.build_model()
    (cold, new) = tr.run_special_eval()
    assert 0.0 <= cold[0] <= 1.0 and 0.0 <= cold[1] <= cold[0] + 1e-9
    assert new is not None
    assert 0.0 <= new[0] <= 1.0
