"""Executable EVAL-chain parity vs the reference's own torch code.

Runs the reference's actual eval pipeline (inbatch_sasrec_e2e_text/
data_utils/metrics.py:33-107: get_item_embeddings -> eval_model ->
metrics_topK -> distributed_concat) on CPU with a single-rank dist shim,
against train/evaluate.py on identical transferred weights and identical
users — asserting the item-embedding table, the PER-USER hit/ndcg vectors,
and the final HR@10/nDCG@10 means all agree. This executes the one surface
the train-step parity test (test_reference_torch_parity.py) does not:
the eval datasets, the sampler's pad/truncate, history masking, ranking,
and metric aggregation.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (DDPShim, REF_ROOT, ensure_single_rank_group,
                          load_ref_metrics, load_ref_model_class,
                          make_user_sequences, null_logger, ref_args,
                          sasrec_params_from_torch, t2n)
from idvs.morec_tpu.config import Config
from idvs.morec_tpu.data.loader import EvalBatches, pad_user_sequences
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.train.evaluate import compute_item_embeddings, evaluate
from idvs.morec_tpu.train.runner import _pad_histories

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
ITEM_NUM, N_USERS, L, D, HEADS, BLOCKS = 40, 13, 8, 16, 2, 2
EVAL_BS = 4   # forces sampler padding: ceil(13/4)*4 = 16 rows, 3 pad users


def run_reference_eval(metrics_mod, torch_model, users_valid, hist_valid,
                       item_content, use_modal, args):
    """Execute metrics.py:60-107 single-rank; returns
    (item_embs (I+1, D) np, hr, ndcg, per-user hit (N,), per-user ndcg (N,))."""
    ensure_single_rank_group()
    shim = DDPShim(torch_model)
    log = null_logger()

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
    user_history = {u: torch.LongTensor(h) for u, h in hist_valid.items()}
    hr = metrics_mod.eval_model(shim, user_history, users_valid, item_embs,
                                EVAL_BS, args, ITEM_NUM, log, "valid", CPU)
    metrics_mod.eval_concat = real_concat
    ndcg = float(captured["ndcg"].mean())
    return (t2n(item_embs), float(hr), ndcg,
            captured["hit"], captured["ndcg"])


def our_eval_batches(users_valid, hist_valid):
    seqs, lens = pad_user_sequences(users_valid, L + 1)
    hist = _pad_histories(hist_valid, L + 2)
    return EvalBatches(seqs, lens, L, EVAL_BS, hist, num_shards=1)


def assert_eval_parity(ref, ours):
    ref_table, ref_hr, ref_ndcg, ref_hit_u, ref_ndcg_u = ref
    our_table, (our_hr, our_ndcg, our_hit_u, our_ndcg_u) = ours
    np.testing.assert_allclose(our_table, ref_table, rtol=1e-5, atol=1e-5)
    # hit is 0/1 per user — must agree exactly user by user
    np.testing.assert_array_equal(our_hit_u, ref_hit_u)
    np.testing.assert_allclose(our_ndcg_u, ref_ndcg_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(our_hr, ref_hr, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(our_ndcg, ref_ndcg, rtol=1e-6, atol=1e-6)


def test_eval_chain_idrec_parity():
    """IDRec: reference get_item_embeddings/eval_model vs our
    compute_item_embeddings/evaluate on identical weights + users."""
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "evalpar_id")
    metrics_mod = load_ref_metrics("inbatch_sasrec_e2e_text", "evalpar_id")
    rng = np.random.default_rng(7)
    _, users_valid, _, hist_valid, _ = make_user_sequences(
        rng, N_USERS, ITEM_NUM, L)
    pop = np.ones(ITEM_NUM + 1)
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS)

    torch.manual_seed(10)
    tm = RefModel(args, ITEM_NUM, False, None, pop).to(CPU)
    tm.eval()
    ref = run_reference_eval(metrics_mod, tm, users_valid, hist_valid,
                             np.arange(ITEM_NUM + 1), False, args)

    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=4, num_attention_heads=HEADS,
                 transformer_block=BLOCKS, drop_rate=0.0,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM)
    seqs0 = jnp.ones((2, L + 1), jnp.int32)
    lm0 = jnp.ones((2, L), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), seqs0, None, lm0)
    params["params"]["id_embedding"]["embedding"] = jnp.asarray(
        t2n(tm.id_embedding.weight))
    params["params"]["user_encoder"] = jax.tree.map(
        jnp.asarray, sasrec_params_from_torch(tm.user_encoder))

    table = compute_item_embeddings(model, params, ITEM_NUM, None, D,
                                    batch_size=5)
    res = evaluate(model, params, table, our_eval_batches(users_valid,
                                                          hist_valid),
                   per_user=True)
    assert_eval_parity(ref, (np.asarray(table), res))


def test_eval_chain_text_morec_parity():
    """Text MoRec (bert-tiny-geometry HF torch BERT vs our converted Flax
    BERT): the modal eval chain incl. bert_encoder catalog inference."""
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict
    from idvs.morec_tpu.models.text_tower import TextTower

    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "evalpar_txt")
    metrics_mod = load_ref_metrics("inbatch_sasrec_e2e_text", "evalpar_txt")
    rng = np.random.default_rng(8)
    _, users_valid, _, hist_valid, _ = make_user_sequences(
        rng, N_USERS, ITEM_NUM, L)
    pop = np.ones(ITEM_NUM + 1)
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
    torch.manual_seed(11)
    hf_bert = HFBertModel(hf_cfg)
    sd = {k: v.clone() for k, v in hf_bert.state_dict().items()}
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS,
                    num_words_title=T, word_embedding_dim=24)
    torch.manual_seed(12)
    tm = RefModel(args, ITEM_NUM, True, hf_bert, pop).to(CPU)
    tm.eval()
    ref = run_reference_eval(metrics_mod, tm, users_valid, hist_valid,
                             item_content, True, args)

    bcfg = BertConfig.from_hf(hf_cfg)
    encoder = TextTower(net=BertModel(bcfg), embedding_dim=D,
                        word_embedding_dim=24, pooling="cls",
                        attr_lengths=(T,))
    cfg = Config(item_tower="modal", modality="text", loss="inbatch_ce",
                 max_seq_len=L, embedding_dim=D, batch_size=4,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 num_words_title=T, drop_rate=0.0, word_embedding_dim=24,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)
    content_j = jnp.asarray(item_content.astype(np.int32))
    seqs0 = jnp.ones((2, L + 1), jnp.int32)
    lm0 = jnp.ones((2, L), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), seqs0,
                        content_j[seqs0.reshape(-1)], lm0)
    params["params"]["user_encoder"] = jax.tree.map(
        jnp.asarray, sasrec_params_from_torch(tm.user_encoder))
    params["params"]["encoder"]["net"] = jax.tree.map(
        jnp.asarray, convert_bert_state_dict(sd, hf_cfg.num_hidden_layers))
    fc = tm.bert_encoder.text_encoders["title"].fc
    params["params"]["encoder"]["fc"] = {
        "kernel": jnp.asarray(t2n(fc.weight).T),
        "bias": jnp.asarray(t2n(fc.bias))}

    table = compute_item_embeddings(model, params, ITEM_NUM, content_j, D,
                                    batch_size=5)
    res = evaluate(model, params, table, our_eval_batches(users_valid,
                                                          hist_valid),
                   per_user=True)
    assert_eval_parity(ref, (np.asarray(table), res))
