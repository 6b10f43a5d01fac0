"""OPT and RoBERTa end-to-end through the encoder zoo (tokenizer + dispatch
+ conversion + mean/CLS pooling), with tiny BPE checkpoints on disk."""

import json
import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from idvs.morec_tpu.config import Config


def _write_bpe_tokenizer(d):
    """Minimal byte-level BPE artifacts every GPT2/RoBERTa tokenizer accepts."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode
    toks = ["<|endoftext|>", "<s>", "</s>", "<pad>", "<unk>", "<mask>"]
    toks += list(bytes_to_unicode().values())
    vocab = {t: i for i, t in enumerate(toks)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return len(vocab)


@pytest.fixture(scope="module")
def opt_dir(tmp_path_factory):
    from transformers import OPTConfig, OPTModel
    d = tmp_path_factory.mktemp("pm") / "opt-tiny-test"
    d.mkdir()
    vocab_size = _write_bpe_tokenizer(d)
    cfg = OPTConfig(vocab_size=max(vocab_size, 300), hidden_size=24,
                    num_hidden_layers=1, num_attention_heads=2, ffn_dim=48,
                    max_position_embeddings=64, dropout=0.0,
                    attention_dropout=0.0, word_embed_proj_dim=24,
                    do_layer_norm_before=True)
    torch.manual_seed(0)
    OPTModel(cfg).save_pretrained(str(d), safe_serialization=False)
    return str(d)


@pytest.fixture(scope="module")
def roberta_dir(tmp_path_factory):
    from transformers import RobertaConfig, RobertaModel
    d = tmp_path_factory.mktemp("pm2") / "roberta-tiny-test"
    d.mkdir()
    vocab_size = _write_bpe_tokenizer(d)
    cfg = RobertaConfig(vocab_size=max(vocab_size, 300), hidden_size=24,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=48, max_position_embeddings=66,
                        type_vocab_size=1, pad_token_id=1,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    RobertaModel(cfg).save_pretrained(str(d), safe_serialization=False)
    return str(d)


def _cfg(model_dir, name):
    return Config(item_tower="modal", modality="text", stage="end2end",
                  bert_model_load=name,
                  pretrained_models_dir=os.path.dirname(model_dir),
                  num_words_title=8, news_attributes=("title",),
                  embedding_dim=16, max_seq_len=6, freeze_paras_before=4)


def test_opt_zoo_bundle(opt_dir):
    from idvs.morec_tpu.models.encoders_zoo import load_encoder, load_tokenizer
    cfg = _cfg(opt_dir, "opt-tiny-test")
    tok = load_tokenizer(cfg)
    enc = tok("hello world", max_length=8, padding="max_length",
              truncation=True)
    assert len(enc["input_ids"]) == 8
    module, params, frozen, word_dim = load_encoder(cfg)
    assert word_dim == 24
    assert module.pooling == "mean"  # reference uses Text_Encoder_mean for OPT
    assert params is not None and "params" in params
    assert len(frozen) == 4
    # forward through the tower with converted weights
    import jax.numpy as jnp
    content = np.concatenate([np.full((3, 8), 5), np.ones((3, 8))],
                             axis=1).astype(np.int32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(content), True)
    merged = dict(variables["params"]["net"])
    merged.update(params["params"])
    variables["params"]["net"] = merged
    out = module.apply(variables, jnp.asarray(content), True)
    assert out.shape == (3, 16) and np.isfinite(np.asarray(out)).all()


def test_roberta_zoo_bundle(roberta_dir):
    from idvs.morec_tpu.models.encoders_zoo import load_encoder, load_tokenizer
    cfg = _cfg(roberta_dir, "roberta-tiny-test")
    tok = load_tokenizer(cfg)
    assert tok("x", max_length=8, padding="max_length")["input_ids"][0] is not None
    module, params, frozen, word_dim = load_encoder(cfg)
    assert word_dim == 24
    assert module.pooling == "cls"
    assert module.net.cfg.is_roberta and module.net.cfg.position_offset == 2
    assert params is not None