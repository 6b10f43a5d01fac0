"""End-to-end text MoRec: a tiny HF BERT checkpoint on disk (random weights)
-> tokenizer -> converter -> graft -> frozen/fine-tune param groups ->
training steps + full-catalog eval. Mirrors the reference flagship path
(inbatch_sasrec_e2e_text/train_bert_base.py -> run.py)."""

import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.parallel.mesh import make_mesh
from idvs.morec_tpu.train.runner import Trainer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title", "abs",
         "item"] + [str(i) for i in range(50)]


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizer
    d = tmp_path_factory.mktemp("pretrained") / "bert-tiny-test"
    d.mkdir()
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    cfg = BertConfig(vocab_size=len(VOCAB), hidden_size=24,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=48, max_position_embeddings=64,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.save_pretrained(str(d), safe_serialization=False)
    cfg.save_pretrained(str(d))
    return str(d)


def synth(tmp_path, n_users=60, n_items=30):
    rng = np.random.default_rng(0)
    base = tmp_path / "TINY"
    base.mkdir(exist_ok=True)
    (base / "news.tsv").write_text("".join(
        f"i{k}\ttitle item {k}\tabs {k}\n" for k in range(1, n_items + 1)))
    lines = []
    for u in range(n_users):
        L = int(rng.integers(5, 9))
        items = rng.choice(np.arange(1, n_items + 1), size=L, replace=False)
        lines.append(f"u{u}\t" + " ".join(f"i{k}" for k in items))
    (base / "behaviors.tsv").write_text("\n".join(lines) + "\n")
    return str(tmp_path) + "/"


def quiet():
    lg = logging.getLogger("q"); lg.setLevel(logging.CRITICAL); return lg


def _leaf(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def test_text_morec_end2end(tmp_path, bert_dir):
    root = synth(tmp_path)
    cfg = Config(root_data_dir=root, dataset="TINY", news="news.tsv",
                 behaviors="behaviors.tsv", item_tower="modal",
                 modality="text", stage="end2end",
                 bert_model_load="bert-tiny-test",
                 pretrained_models_dir=os.path.dirname(bert_dir),
                 freeze_paras_before=21,   # embeddings (5) + layer 0 (16)
                 num_words_title=8, news_attributes=("title",),
                 max_seq_len=6, min_seq_len=3, batch_size=4,
                 embedding_dim=16, word_embedding_dim=24,
                 transformer_block=1, num_attention_heads=2,
                 epoch=1, lr=1e-3, fine_tune_lr=1e-4, eval_batch_size=16)
    os.chdir(tmp_path)
    from idvs.morec_tpu.models.encoders_zoo import load_encoder
    bundle = load_encoder(cfg)
    module, enc_params, frozen, word_dim = bundle
    assert word_dim == 24
    assert enc_params is not None, "converted weights should load"
    assert len(frozen) == 21

    mesh = make_mesh(jax.devices("cpu")[:2])
    tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                 encoder_bundle=bundle)
    tr.load_data()
    assert tr.item_content is not None and tr.item_content.shape[1] == 16  # 2*8
    tr.build_model()

    # freeze audit (reference data_utils/utils.py:92-96): trainable excludes
    # exactly the frozen encoder leaves
    n_frozen_expect = sum(
        int(np.asarray(_leaf(tr.state.params, ("params",) + p)).size)
        for p in frozen)
    assert tr.n_trainable == tr.n_total - n_frozen_expect
    assert 0 < tr.n_trainable < tr.n_total

    # grafted weights present: word embedding matches the torch checkpoint
    sd = torch.load(os.path.join(bert_dir, "pytorch_model.bin"),
                    map_location="cpu", weights_only=True)
    want = sd["embeddings.word_embeddings.weight"].numpy()
    got = np.asarray(_leaf(tr.state.params,
                           ("params", "encoder", "net",
                            "word_embeddings", "embedding")))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    frozen_path = ("params", "encoder", "net", "layer_0",
                   "intermediate", "kernel")
    tuned_path = ("params", "encoder", "net", "layer_1",
                  "intermediate", "kernel")
    before_frozen = np.asarray(_leaf(tr.state.params, frozen_path)).copy()
    before_tuned = np.asarray(_leaf(tr.state.params, tuned_path)).copy()
    before_fc = np.asarray(_leaf(tr.state.params,
                                 ("params", "encoder", "fc", "kernel"))).copy()

    losses = []
    for raw in tr.batcher.epoch(1):
        tr.state, loss = tr.train_step(tr.state, tr.make_batch(raw))
        losses.append(float(loss))
    assert np.isfinite(losses).all()

    after_frozen = np.asarray(_leaf(tr.state.params, frozen_path))
    after_tuned = np.asarray(_leaf(tr.state.params, tuned_path))
    after_fc = np.asarray(_leaf(tr.state.params,
                                ("params", "encoder", "fc", "kernel")))
    np.testing.assert_array_equal(after_frozen, before_frozen)  # frozen
    assert not np.allclose(after_tuned, before_tuned)           # fine-tuned
    assert not np.allclose(after_fc, before_fc)                 # recsys group

    hit, ndcg = tr.run_eval("valid")
    assert 0.0 <= hit <= 1.0 and 0.0 <= ndcg <= 1.0


def test_run_entrypoint_text_modal(tmp_path, bert_dir):
    """Full run() CLI path: tokenizer -> encoder zoo -> trainer -> ckpt."""
    import glob
    from idvs.morec_tpu.run import main
    root = synth(tmp_path, n_users=30, n_items=20)
    os.chdir(tmp_path)
    result = main([
        "--root_data_dir", root, "--dataset", "TINY",
        "--news", "news.tsv", "--behaviors", "behaviors.tsv",
        "--item_tower", "modal", "--modality", "text",
        "--bert_model_load", "bert-tiny-test",
        "--pretrained_models_dir", os.path.dirname(bert_dir),
        "--num_words_title", "8", "--news_attributes", "title",
        "--max_seq_len", "6", "--min_seq_len", "3", "--batch_size", "4",
        "--embedding_dim", "16", "--word_embedding_dim", "24",
        "--transformer_block", "1", "--num_attention_heads", "2",
        "--epoch", "1", "--lr", "1e-3", "--fine_tune_lr", "1e-4",
        "--eval_batch_size", "16", "--mode", "train"])
    best, best_epoch = result
    assert 0.0 <= best <= 1.0 and best_epoch == 1
    cpts = glob.glob("checkpoint_modal_bert-tiny-test_freeze_0/cpt_*/epoch-1.ckpt")
    assert cpts, os.listdir(".")


def test_text_morec_learns_from_titles(tmp_path, bert_dir):
    """When titles carry the group signal (shared group token), text MoRec
    must beat chance at ranking within-group targets."""
    rng = np.random.default_rng(3)
    base = tmp_path / "TINY"
    base.mkdir(exist_ok=True)
    n_items, n_groups, n_users = 24, 4, 80
    # unique in-vocab title per item, PLUS the group token: the encoder must
    # map group-mates close from co-occurrence while items stay distinct
    (base / "news.tsv").write_text("".join(
        f"i{k}\t{(k - 1) % n_groups} item {k}\tabs\n"
        for k in range(1, n_items + 1)))
    groups = [[k for k in range(1, n_items + 1) if (k - 1) % n_groups == g]
              for g in range(n_groups)]
    lines = []
    for u in range(n_users):
        g = groups[u % n_groups]
        items = rng.choice(g, size=5, replace=False)
        lines.append(f"u{u}\t" + " ".join(f"i{k}" for k in items))
    (base / "behaviors.tsv").write_text("\n".join(lines) + "\n")

    cfg = Config(root_data_dir=str(tmp_path) + "/", dataset="TINY",
                 news="news.tsv", behaviors="behaviors.tsv",
                 item_tower="modal", modality="text", stage="end2end",
                 bert_model_load="bert-tiny-test",
                 pretrained_models_dir=os.path.dirname(bert_dir),
                 num_words_title=6, news_attributes=("title",),
                 max_seq_len=4, min_seq_len=3, batch_size=8,
                 embedding_dim=16, word_embedding_dim=24,
                 transformer_block=1, num_attention_heads=2,
                 epoch=6, lr=5e-3, fine_tune_lr=1e-3, drop_rate=0.0,
                 eval_batch_size=32)
    os.chdir(tmp_path)
    from idvs.morec_tpu.models.encoders_zoo import load_encoder
    from idvs.morec_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                 encoder_bundle=load_encoder(cfg))
    tr.load_data()
    tr.build_model()
    best, _ = tr.train()
    # item embeddings must be distinct (guard against the all-ties degeneracy
    # where identical embeddings give everyone rank 1)
    from idvs.morec_tpu.train.evaluate import compute_item_embeddings
    table = np.asarray(compute_item_embeddings(
        tr.model, tr.state.params, tr.item_num, tr.item_content, 16, 32))
    assert np.unique(np.round(table[1:], 4), axis=0).shape[0] > n_groups
    # chance HR@10 ~ 10/23 = 0.435; the learned signal must clear it
    # (tiny random-init BERT, 6 epochs, 80 users -> modest but real lift;
    # the margin tolerates benign numeric drift, e.g. fused-QKV accumulation
    # grouping — semantic parity is covered by the exact-output encoder tests
    # and tests/test_reference_torch_parity.py)
    assert best > 0.46, best
