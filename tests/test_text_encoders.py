"""Weight-conversion fidelity: our Flax BERT/RoBERTa/OPT vs torch
transformers with IDENTICAL (random) weights must produce the same hidden
states — this is the guarantee that real pretrained checkpoints load
correctly (reference loads HF weights, run.py:29-72)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _rand_inputs(rng, B=3, T=12, vocab=500, pad=0):
    ids = rng.integers(5, vocab, size=(B, T)).astype(np.int64)
    attmask = np.ones((B, T), dtype=np.int64)
    attmask[0, -4:] = 0
    ids[0, -4:] = pad
    return ids, attmask


def test_bert_matches_hf():
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import (
        bert_torch_param_order, convert_bert_state_dict)

    hf_cfg = HFBertConfig(vocab_size=500, hidden_size=32, num_hidden_layers=3,
                          num_attention_heads=4, intermediate_size=64,
                          max_position_embeddings=64, type_vocab_size=2,
                          hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = HFBertModel(hf_cfg).eval()

    # torch param order assumption must hold exactly
    names = [n for n, _ in hf.named_parameters()]
    want = [n for n, _ in bert_torch_param_order(3)]
    assert names == want

    rng = np.random.default_rng(0)
    ids, attmask = _rand_inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(attmask))[0].numpy()

    cfg = BertConfig.from_hf(hf_cfg)
    model = BertModel(cfg)
    params = convert_bert_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, 3)
    got = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(attmask), True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_roberta_matches_hf():
    from transformers import RobertaConfig as HFC, RobertaModel as HFM
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict

    hf_cfg = HFC(vocab_size=500, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=66, type_vocab_size=1,
                 pad_token_id=1, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    hf = HFM(hf_cfg).eval()
    rng = np.random.default_rng(1)
    ids, attmask = _rand_inputs(rng, pad=1)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(attmask))[0].numpy()
    cfg = BertConfig.from_hf(hf_cfg)
    assert cfg.is_roberta and cfg.position_offset == 2
    model = BertModel(cfg)
    params = convert_bert_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, 2)
    got = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(attmask), True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_opt_matches_hf():
    from transformers import OPTConfig as HFC, OPTModel as HFM
    from idvs.morec_tpu.models.opt import (OPTConfig, OPTModel,
                                           convert_opt_state_dict,
                                           opt_torch_param_order)

    hf_cfg = HFC(vocab_size=500, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=4, ffn_dim=64,
                 max_position_embeddings=64, dropout=0.0,
                 attention_dropout=0.0, pad_token_id=1,
                 do_layer_norm_before=True, word_embed_proj_dim=32)
    torch.manual_seed(2)
    hf = HFM(hf_cfg).eval()
    names = [n for n, _ in hf.named_parameters()]
    want = [n for n, _ in opt_torch_param_order(2)]
    assert names == want

    rng = np.random.default_rng(2)
    ids, attmask = _rand_inputs(rng, pad=1)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(attmask))[0].numpy()
    cfg = OPTConfig.from_hf(hf_cfg)
    model = OPTModel(cfg)
    params = convert_opt_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, 2)
    got = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(attmask), True)
    # pad positions get a different (masked-out-anyway) position id than HF;
    # the reference pools OPT by masked MEAN (Text_Encoder_mean), so only
    # valid positions matter
    m = attmask[:, :, None].astype(bool)
    np.testing.assert_allclose(np.asarray(got) * m, ref * m, atol=2e-4)


def test_text_tower_cls_pooling_and_projection():
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.text_tower import TextTower

    cfg = BertConfig(vocab_size=100, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    tower = TextTower(net=BertModel(cfg), embedding_dim=8,
                      word_embedding_dim=16, pooling="cls", attr_lengths=(6,))
    content = np.concatenate([
        np.random.default_rng(0).integers(1, 100, (4, 6)),
        np.ones((4, 6), np.int64)], axis=1)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(content), True)
    out = tower.apply(params, jnp.asarray(content), True)
    assert out.shape == (4, 8)
    # 'net' submodule must exist for the freeze/two-group machinery
    assert "net" in params["params"]
    assert "fc" in params["params"]


def test_freeze_paths_match_reference_pooler_table():
    """bert-base order: 5 + 12*16 = 197 params then pooler -> indices
    (197,198), matching the reference's hard-coded table (run.py:67-69)."""
    from idvs.morec_tpu.models.convert_text import (bert_torch_param_order,
                                                    bert_frozen_paths)
    order = bert_torch_param_order(12)
    assert order[197][0] == "pooler.dense.weight"
    assert order[198][0] == "pooler.dense.bias"
    # freeze_paras_before=165 -> embeddings + exactly the first 10 layers
    frozen = bert_frozen_paths(12, 165)
    assert ("layer_9", "output_ln", "bias") in frozen
    assert not any(p[0] == "layer_10" for p in frozen)
    assert ("word_embeddings", "embedding") in frozen


def test_text_tower_multi_attribute_average():
    """title+abstract: one shared encoder, attribute vectors averaged
    (reference Bert_Encoder.forward, encoders.py:107-117)."""
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.text_tower import TextTower

    cfg = BertConfig(vocab_size=100, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    net = BertModel(cfg)
    tower2 = TextTower(net=net, embedding_dim=8, word_embedding_dim=16,
                       pooling="cls", attr_lengths=(6, 4))
    rng = np.random.default_rng(0)
    title = np.concatenate([rng.integers(1, 100, (3, 6)),
                            np.ones((3, 6), np.int64)], axis=1)
    abstract = np.concatenate([rng.integers(1, 100, (3, 4)),
                               np.ones((3, 4), np.int64)], axis=1)
    content = np.concatenate([title, abstract], axis=1)
    params = tower2.init(jax.random.PRNGKey(0), jnp.asarray(content), True)
    out = tower2.apply(params, jnp.asarray(content), True)
    assert out.shape == (3, 8)
    # average equals the mean of running each attribute alone
    t1 = TextTower(net=net, embedding_dim=8, word_embedding_dim=16,
                   pooling="cls", attr_lengths=(6,))
    a_t = t1.apply(params, jnp.asarray(title), True)
    t2 = TextTower(net=net, embedding_dim=8, word_embedding_dim=16,
                   pooling="cls", attr_lengths=(4,))
    a_a = t2.apply(params, jnp.asarray(abstract), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray((a_t + a_a) / 2),
                               rtol=1e-5)


def test_distilbert_matches_hf():
    """DistilBERT (imported by every reference text variant, run.py:9):
    exact-output parity + named_parameters order assertion."""
    from transformers import (DistilBertConfig as HFC,
                              DistilBertModel as HFM)
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import (
        convert_distilbert_state_dict, distilbert_torch_param_order,
        distilbert_frozen_paths)

    hf_cfg = HFC(vocab_size=500, dim=32, n_layers=3, n_heads=4,
                 hidden_dim=64, max_position_embeddings=64,
                 dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = HFM(hf_cfg).eval()

    names = [n for n, _ in hf.named_parameters()]
    want = [n for n, _ in distilbert_torch_param_order(3)]
    assert names == want

    rng = np.random.default_rng(1)
    ids, attmask = _rand_inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(attmask))[0].numpy()

    cfg = BertConfig.from_hf(hf_cfg)
    assert cfg.type_vocab_size == 0
    model = BertModel(cfg)
    params = convert_distilbert_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, 3)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(attmask), True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)

    # freeze mapping: first 4 indices are the embedding tables/LN
    frozen = distilbert_frozen_paths(3, 4)
    assert ("word_embeddings", "embedding") in frozen
    assert ("embeddings_ln", "bias") in frozen
    assert len(frozen) == 4


def test_build_text_tower_dispatches_distilbert(tmp_path):
    """build_text_tower loads a distilbert checkpoint dir end-to-end."""
    from transformers import (DistilBertConfig as HFC,
                              DistilBertModel as HFM)
    from idvs.morec_tpu.config import Config
    from idvs.morec_tpu.models.text_tower import build_text_tower

    hf_cfg = HFC(vocab_size=120, dim=16, n_layers=2, n_heads=2,
                 hidden_dim=32, max_position_embeddings=64,
                 dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(1)
    d = tmp_path / "distilbert_tiny"
    HFM(hf_cfg).eval().save_pretrained(str(d), safe_serialization=False)

    cfg = Config(item_tower="modal", loss="inbatch_ce",
                 bert_model_load="distilbert_tiny",
                 pretrained_models_dir=str(tmp_path),
                 freeze_paras_before=4, embedding_dim=8,
                 num_words_title=6, news_attributes=["title"])
    tower, params, frozen, word_dim = build_text_tower(cfg)
    assert word_dim == 16
    assert ("encoder", "net", "word_embeddings", "embedding") in frozen
    assert len(frozen) == 4
    # packed [ids||attmask] rows through the tower
    ids = np.concatenate([np.full((3, 6), 5, np.int32),
                          np.ones((3, 6), np.int32)], axis=1)
    variables = tower.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out = tower.apply(variables, jnp.asarray(ids))
    assert out.shape == (3, 8) and np.isfinite(np.asarray(out)).all()


def test_deberta_matches_hf():
    """DeBERTa v1 (imported by every reference text variant, run.py:8):
    exact-output parity of the disentangled attention + order assertion."""
    from transformers import DebertaConfig as HFC, DebertaModel as HFM
    from idvs.morec_tpu.models.deberta import (
        DebertaConfig, DebertaModel, convert_deberta_state_dict,
        deberta_torch_param_order, deberta_frozen_paths)

    hf_cfg = HFC(vocab_size=500, hidden_size=32, num_hidden_layers=3,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=64, relative_attention=True,
                 pos_att_type=["c2p", "p2c"], position_biased_input=False,
                 type_vocab_size=0, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = HFM(hf_cfg).eval()

    names = [n for n, _ in hf.named_parameters()]
    want = [n for n, _ in deberta_torch_param_order(3)]
    assert names == want

    rng = np.random.default_rng(2)
    ids, attmask = _rand_inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(attmask))[0].numpy()

    cfg = DebertaConfig.from_hf(hf_cfg)
    model = DebertaModel(cfg)
    params = convert_deberta_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, 3, 4)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(attmask), True)
    # padded rows: HF leaves garbage there (softmax over a fully-masked
    # row); the reference pools CLS so only valid rows matter
    valid = attmask.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], ref[valid],
                               atol=2e-4)

    frozen = deberta_frozen_paths(3, 5)
    assert ("word_embeddings", "embedding") in frozen
    assert ("layer_0", "attention_self", "q_bias") in frozen
    assert len(frozen) == 5


def test_build_text_tower_dispatches_deberta(tmp_path):
    from transformers import DebertaConfig as HFC, DebertaModel as HFM
    from idvs.morec_tpu.config import Config
    from idvs.morec_tpu.models.text_tower import build_text_tower

    hf_cfg = HFC(vocab_size=120, hidden_size=16, num_hidden_layers=2,
                 num_attention_heads=2, intermediate_size=32,
                 max_position_embeddings=64, relative_attention=True,
                 pos_att_type=["c2p", "p2c"], position_biased_input=False,
                 type_vocab_size=0, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)
    torch.manual_seed(2)
    d = tmp_path / "deberta_tiny"
    HFM(hf_cfg).eval().save_pretrained(str(d), safe_serialization=False)

    cfg = Config(item_tower="modal", loss="inbatch_ce",
                 bert_model_load="deberta_tiny",
                 pretrained_models_dir=str(tmp_path),
                 freeze_paras_before=3, embedding_dim=8,
                 num_words_title=6, news_attributes=["title"])
    tower, params, frozen, word_dim = build_text_tower(cfg)
    assert word_dim == 16
    assert params is not None
    assert ("encoder", "net", "word_embeddings", "embedding") in frozen
    assert len(frozen) == 3
    ids = np.concatenate([np.full((3, 6), 5, np.int32),
                          np.ones((3, 6), np.int32)], axis=1)
    variables = tower.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out = tower.apply(variables, jnp.asarray(ids))
    assert out.shape == (3, 8) and np.isfinite(np.asarray(out)).all()


def test_multi_attribute_executed_vs_reference_bert_encoder():
    """title+abstract through the reference's OWN Bert_Encoder (attribute
    slicing + shared Text_Encoder + mean, inbatch_sasrec_e2e_text/model/
    encoders.py:73-117) vs our TextTower with converted weights."""
    import os
    import types

    import pytest
    torch = pytest.importorskip("torch")
    from _ref_harness import REF_ROOT, load_ref_package, ref_args, t2n
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference not mounted")
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel

    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict
    from idvs.morec_tpu.models.text_tower import TextTower

    hf_cfg = HFBertConfig(vocab_size=80, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=32,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(7)
    hf = HFBertModel(hf_cfg)
    import sys
    load_ref_package("inbatch_sasrec_e2e_text", "model", "multiattr")
    enc_mod = sys.modules["_refpkg_model_multiattr.encoders"]
    args = ref_args(L=6, D=12, num_words_title=6, num_words_abstract=4,
                    news_attributes=["title", "abstract"],
                    word_embedding_dim=32)
    torch.manual_seed(8)
    ref_enc = enc_mod.Bert_Encoder(args=args, bert_model=hf)
    ref_enc.eval()

    rng = np.random.default_rng(9)
    title = np.concatenate([rng.integers(2, 80, (5, 6)),
                            np.ones((5, 6), np.int64)], axis=1)
    abstract = np.concatenate([rng.integers(2, 80, (5, 4)),
                               np.ones((5, 4), np.int64)], axis=1)
    content = np.concatenate([title, abstract], axis=1)
    with torch.no_grad():
        want = t2n(ref_enc(torch.LongTensor(content)))

    tower = TextTower(net=BertModel(BertConfig.from_hf(hf_cfg)),
                      embedding_dim=12, word_embedding_dim=32,
                      pooling="cls", attr_lengths=(6, 4))
    net_params = convert_bert_state_dict(
        {k: t2n(v) for k, v in hf.state_dict().items()}, 2)
    fc = ref_enc.text_encoders["title"].fc
    params = {"params": {"net": net_params,
                         "fc": {"kernel": t2n(fc.weight).T,
                                "bias": t2n(fc.bias)}}}
    got = tower.apply(params, jnp.asarray(content), True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
