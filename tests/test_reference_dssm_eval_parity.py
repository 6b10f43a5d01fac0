"""Executable DSSM EVAL-chain parity vs the reference's own torch code.

The DSSM variant's eval chain is structurally different from the SASRec
one: the USER side is a precomputed full-table pass (get_user_embeddings —
user_embedding + MLP_Encoder over ids 0..user_num), eval pairs are
(user, target) rows instead of sequences, and the ID item tower runs its
own id_encoder MLP (bce_text/main-end2end(DSSM)/data_utils/metrics.py:
60-120, model/model.py:16-29). This executes that whole chain —
get_user_embeddings -> get_item_embeddings -> eval_model -> metrics_topK ->
distributed_concat — single-rank on CPU, against our
compute_item_embeddings + evaluate(user_tower='dssm') over
_dssm_eval_batches on identical transferred weights, asserting the item
table, per-user hit/ndcg vectors, and the means.

(Completes the eval-side executed-parity surface: the SASRec eval chains
are covered by test_reference_eval_parity / test_reference_vision_eval_
parity; DSSM previously had only a TRAIN-step executed leg.)
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (DDPShim, REF_ROOT, ensure_single_rank_group,
                          load_ref_metrics, load_ref_model_class,
                          mlp_params_from_torch, null_logger, ref_args, t2n)
from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.train.evaluate import compute_item_embeddings, evaluate
from idvs.morec_tpu.train.runner import _dssm_eval_batches

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
VARIANT = "bce_text/main-end2end(DSSM)"
ITEM_NUM, USER_NUM, D, DNN = 40, 13, 16, 1
EVAL_BS = 4   # 13 pairs -> sampler pads to 16 rows; 3 pad rows must not count


def make_pairs_and_history(rng):
    """One (user, target) valid pair per user + that user's train history
    (the reference passes users_train as user_history, run.py:237,267-270)."""
    pairs, hist = [], {}
    for uid in range(1, USER_NUM + 1):
        n = int(rng.integers(4, 9))
        seq = rng.choice(np.arange(1, ITEM_NUM + 1), size=n, replace=False)
        pairs.append((uid, int(seq[-1])))
        hist[uid] = seq[:-1].astype(np.int64)
    return np.asarray(pairs, dtype=np.int64), hist


def hist_matrix(hist):
    width = max(len(h) for h in hist.values())
    out = np.zeros((USER_NUM, width), np.int32)   # row uid-1; 0-fill hits the
    for uid, h in hist.items():                   # pad col, dropped by [1:]
        out[uid - 1, :len(h)] = h
    return out


def run_reference_dssm_eval(metrics_mod, torch_model, pairs, hist,
                            item_content, use_modal, args):
    """Execute the DSSM metrics.py:60-120 chain single-rank; returns
    (item table np, hr, ndcg, per-user hit, per-user ndcg)."""
    ensure_single_rank_group()
    shim = DDPShim(torch_model)
    log = null_logger()

    user_embs = metrics_mod.get_user_embeddings(shim, USER_NUM, 5, args, CPU)
    item_embs = metrics_mod.get_item_embeddings(
        shim, item_content, 5, args, use_modal, CPU)

    captured = {}
    real_concat = metrics_mod.eval_concat

    def spy_concat(eval_list, sampler):
        n = len(sampler.dataset)
        captured["hit"] = t2n(eval_list[0])[:n]
        captured["ndcg"] = t2n(eval_list[1])[:n]
        return real_concat(eval_list, sampler)

    metrics_mod.eval_concat = spy_concat
    user_history = {u: torch.LongTensor(h) for u, h in hist.items()}
    hr = metrics_mod.eval_model(shim, user_history, pairs, user_embs,
                                item_embs, EVAL_BS, args, ITEM_NUM, log,
                                "valid", CPU)
    metrics_mod.eval_concat = real_concat
    return (t2n(item_embs), float(hr), float(captured["ndcg"].mean()),
            captured["hit"], captured["ndcg"])


def assert_eval_parity(ref, our_table, res):
    ref_table, ref_hr, ref_ndcg, ref_hit_u, ref_ndcg_u = ref
    our_hr, our_ndcg, our_hit_u, our_ndcg_u = res
    np.testing.assert_allclose(our_table, ref_table, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(our_hit_u, ref_hit_u)
    np.testing.assert_allclose(our_ndcg_u, ref_ndcg_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(our_hr, ref_hr, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(our_ndcg, ref_ndcg, rtol=1e-6, atol=1e-6)


def test_dssm_eval_chain_idrec_parity():
    """DSSM IDRec: id_embedding -> id_encoder MLP item table + user-table
    scoring, reference chain vs ours on identical weights."""
    RefModel = load_ref_model_class(VARIANT, "dssm_evalpar_id")
    metrics_mod = load_ref_metrics(VARIANT, "dssm_evalpar_id")
    rng = np.random.default_rng(21)
    pairs, hist = make_pairs_and_history(rng)
    args = ref_args(D=D, dnn_layers=DNN)

    torch.manual_seed(31)
    tm = RefModel(args, USER_NUM, ITEM_NUM, False, None).to(CPU)
    tm.eval()
    ref = run_reference_dssm_eval(metrics_mod, tm, pairs, hist,
                                  np.arange(ITEM_NUM + 1), False, args)

    cfg = Config(item_tower="id", loss="bce", user_tower="dssm",
                 embedding_dim=D, batch_size=4, neg_num=2, dnn_layers=DNN,
                 drop_rate=0.0, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, user_num=USER_NUM)
    items0 = jnp.ones((2, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), items0, None, None)
    p = params["params"]
    p["user_embedding"]["embedding"] = jnp.asarray(t2n(tm.user_embedding.weight))
    p["id_embedding"]["embedding"] = jnp.asarray(t2n(tm.id_embedding.weight))
    p["user_mlp"] = jax.tree.map(jnp.asarray,
                                 mlp_params_from_torch(tm.user_encoder))
    p["id_encoder"] = jax.tree.map(jnp.asarray,
                                   mlp_params_from_torch(tm.id_encoder))

    table = compute_item_embeddings(model, params, ITEM_NUM, None, D,
                                    batch_size=5)
    res = evaluate(model, params, table,
                   _dssm_eval_batches(pairs, hist_matrix(hist), EVAL_BS),
                   user_tower="dssm", per_user=True)
    assert_eval_parity(ref, np.asarray(table), res)


def test_dssm_eval_chain_text_morec_parity():
    """DSSM text MoRec: the modal item table (HF torch BERT inside the
    reference's Bert_Encoder vs our converted Flax TextTower) + user-table
    scoring."""
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict
    from idvs.morec_tpu.models.text_tower import TextTower

    RefModel = load_ref_model_class(VARIANT, "dssm_evalpar_txt")
    metrics_mod = load_ref_metrics(VARIANT, "dssm_evalpar_txt")
    rng = np.random.default_rng(22)
    pairs, hist = make_pairs_and_history(rng)
    T = 8
    tokens = rng.integers(1, 60, size=(ITEM_NUM + 1, T)).astype(np.int64)
    attmask = (rng.uniform(size=tokens.shape) < 0.8).astype(np.int64)
    attmask[:, 0] = 1
    item_content = np.concatenate([tokens, attmask], axis=1)

    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=24, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=48,
                          max_position_embeddings=32,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(32)
    hf_bert = HFBertModel(hf_cfg)
    sd = {k: v.clone() for k, v in hf_bert.state_dict().items()}
    args = ref_args(D=D, dnn_layers=DNN, num_words_title=T,
                    word_embedding_dim=24)
    torch.manual_seed(33)
    tm = RefModel(args, USER_NUM, ITEM_NUM, True, hf_bert).to(CPU)
    tm.eval()
    ref = run_reference_dssm_eval(metrics_mod, tm, pairs, hist,
                                  item_content, True, args)

    bcfg = BertConfig.from_hf(hf_cfg)
    encoder = TextTower(net=BertModel(bcfg), embedding_dim=D,
                        word_embedding_dim=24, pooling="cls",
                        attr_lengths=(T,))
    cfg = Config(item_tower="modal", modality="text", loss="bce",
                 user_tower="dssm", embedding_dim=D, batch_size=4, neg_num=2,
                 dnn_layers=DNN, num_words_title=T, drop_rate=0.0,
                 word_embedding_dim=24, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, user_num=USER_NUM,
                       encoder=encoder)
    content_j = jnp.asarray(item_content.astype(np.int32))
    items0 = jnp.ones((2, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), items0,
                        content_j[items0.reshape(-1)], None)
    p = params["params"]
    p["user_embedding"]["embedding"] = jnp.asarray(t2n(tm.user_embedding.weight))
    p["user_mlp"] = jax.tree.map(jnp.asarray,
                                 mlp_params_from_torch(tm.user_encoder))
    p["encoder"]["net"] = jax.tree.map(
        jnp.asarray, convert_bert_state_dict(sd, hf_cfg.num_hidden_layers))
    fc = tm.bert_encoder.text_encoders["title"].fc
    p["encoder"]["fc"] = {"kernel": jnp.asarray(t2n(fc.weight).T),
                          "bias": jnp.asarray(t2n(fc.bias))}

    table = compute_item_embeddings(model, params, ITEM_NUM, content_j, D,
                                    batch_size=5)
    res = evaluate(model, params, table,
                   _dssm_eval_batches(pairs, hist_matrix(hist), EVAL_BS),
                   user_tower="dssm", per_user=True)
    assert_eval_parity(ref, np.asarray(table), res)
