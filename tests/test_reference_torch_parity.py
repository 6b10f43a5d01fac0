"""Executable end-to-end parity vs the reference's own torch code.

Loads the ACTUAL reference Model classes from /root/reference (CPU, shimmed
local_rank), transfers the torch-initialized weights into the JAX model, runs
5 optimizer steps on identical batches on both sides at float32, and asserts
loss-trajectory and parameter-delta agreement. This converts "semantics
documented with citations" into "semantics proven by execution".

Covered compositions:
- IDRec + SASRec + in-batch debiased CE   (inbatch_sasrec_e2e_text/model/model.py:31-69)
- bert-tiny MoRec + SASRec + in-batch CE  (two-group AdamW, run.py:150-191)
- IDRec + SASRec + BCE                    (bce_text/main-end2end/model/model.py:30-51)
- IDRec + DSSM + BCE                      (bce_text/main-end2end(DSSM)/model/model.py:32-43)
"""

import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (REF_ROOT, load_ref_model_class,
                          mlp_params_from_torch, sasrec_params_from_torch,
                          t2n)
from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from idvs.morec_tpu.train.state import (TrainState, default_encoder_predicate,
                                        make_optimizer, param_labels)
from idvs.morec_tpu.train.step import make_train_step

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
N_STEPS = 5
# geometry shared by all cases
ITEM_NUM, B, L, D, HEADS, BLOCKS = 40, 6, 8, 16, 2, 2
S = L + 1


def ref_args(**over):
    base = dict(max_seq_len=L, embedding_dim=D, num_attention_heads=HEADS,
                drop_rate=0.0, transformer_block=BLOCKS,
                num_words_title=8, num_words_abstract=8, num_words_body=8,
                news_attributes=["title"], bert_model_load="bert-tiny",
                word_embedding_dim=24, dnn_layers=0, neg_num=2)
    base.update(over)
    return types.SimpleNamespace(**base)


# ----------------------------------------------------------------- fixtures
def make_batch_arrays(rng, with_neg=False):
    """Mirror the reference BuildTrainDataset padding (dataset.py:24-36)."""
    ids = np.zeros((B, S), np.int32)
    lm = np.zeros((B, L), np.float32)
    for u in range(B):
        seq_len = int(rng.integers(3, S + 1))
        seq = rng.integers(1, ITEM_NUM + 1, size=seq_len)
        ids[u, S - seq_len:] = seq
        lm[u, L - (seq_len - 1):] = 1.0
    out = [ids, lm]
    if with_neg:
        neg = rng.integers(1, ITEM_NUM + 1, size=(B, S)).astype(np.int32)
        out.insert(1, neg)
    return out


def pop_prob(rng):
    p = rng.uniform(0.2, 1.0, size=ITEM_NUM + 1)
    p[1:] /= p[1:].sum()
    p[0] = 1.0
    return p


def jax_mesh():
    return make_mesh(jax.devices("cpu")[:1])


def run_jax_steps(cfg, model, params, tx, batch, n_steps,
                  item_content=None, log_pop=None):
    mesh = jax_mesh()
    params = replicate(mesh, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params["params"]),
                       dropout_rng=jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx, mesh, item_content=item_content,
                           log_pop=log_pop)
    batch = shard_batch(mesh, batch)
    losses = []
    for _ in range(n_steps):
        state, loss = step(state, batch)
        losses.append(float(loss))
    return losses, jax.device_get(state.params["params"])


def run_torch_steps(model, opt, forward, n_steps):
    losses = []
    for _ in range(n_steps):
        opt.zero_grad()
        loss = forward()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def assert_traj(torch_losses, jax_losses, tol=5e-4):
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=tol, atol=tol)


# ------------------------------------------------------------------- cases
def test_idrec_inbatch_ce_parity():
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "inbatch_text")
    rng = np.random.default_rng(0)
    ids, lm = make_batch_arrays(rng)
    pop = pop_prob(rng)
    args = ref_args()

    torch.manual_seed(0)
    tm = RefModel(args, ITEM_NUM, False, None, pop).to(CPU)
    tm.train()
    t_ids = torch.LongTensor(ids.reshape(-1))
    t_lm = torch.FloatTensor(lm)
    snap_id = t2n(tm.id_embedding.weight)
    snap_ue = sasrec_params_from_torch(tm.user_encoder)
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=0.01)
    t_losses = run_torch_steps(tm, opt,
                               lambda: tm(t_ids, t_ids, t_lm, CPU), N_STEPS)

    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B, num_attention_heads=HEADS,
                 transformer_block=BLOCKS, drop_rate=0.0, lr=1e-3,
                 l2_weight=0.01, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), None,
                        jnp.asarray(lm))
    params["params"]["id_embedding"]["embedding"] = jnp.asarray(snap_id)
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    tx = make_optimizer(cfg)
    log_pop = jnp.asarray(np.log(pop), jnp.float32)
    j_losses, j_params = run_jax_steps(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "log_mask": jnp.asarray(lm)},
        N_STEPS, log_pop=log_pop)

    assert_traj(t_losses, j_losses)
    # parameter-delta agreement after 5 AdamW steps
    np.testing.assert_allclose(
        np.asarray(j_params["id_embedding"]["embedding"]),
        t2n(tm.id_embedding.weight), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["user_encoder"]["block_0"]["mha"]["w_Q"]["kernel"]),
        t2n(tm.user_encoder.transformer_encoder.transformer_blocks[0]
            .multi_head_attention.w_Q.weight).T, rtol=2e-3, atol=2e-4)


def test_text_morec_inbatch_ce_parity(tmp_path):
    """bert-tiny MoRec: HF torch BERT inside the reference Model vs our Flax
    BERT with converted weights; two-group AdamW (run.py:150-191)."""
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.text_tower import TextTower
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict

    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "inbatch_text2")
    rng = np.random.default_rng(1)
    ids, lm = make_batch_arrays(rng)
    pop = pop_prob(rng)
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
    torch.manual_seed(1)
    hf_bert = HFBertModel(hf_cfg)
    sd = {k: v.clone() for k, v in hf_bert.state_dict().items()}

    args = ref_args(num_words_title=T, word_embedding_dim=24)
    torch.manual_seed(2)
    tm = RefModel(args, ITEM_NUM, True, hf_bert, pop).to(CPU)
    tm.train()
    t_content = torch.LongTensor(item_content[ids.reshape(-1)])
    t_ids = torch.LongTensor(ids.reshape(-1))
    t_lm = torch.FloatTensor(lm)
    snap_ue = sasrec_params_from_torch(tm.user_encoder)
    fc = tm.bert_encoder.text_encoders["title"].fc
    snap_fc = {"kernel": t2n(fc.weight).T, "bias": t2n(fc.bias)}
    # two-group AdamW exactly as run.py:150-162
    bert_params = [p for n, p in tm.named_parameters() if "bert_model" in n]
    recsys_params = [p for n, p in tm.named_parameters() if "bert_model" not in n]
    opt = torch.optim.AdamW([
        {"params": bert_params, "lr": 5e-4, "weight_decay": 0.02},
        {"params": recsys_params, "lr": 1e-3, "weight_decay": 0.01}])
    t_losses = run_torch_steps(tm, opt,
                               lambda: tm(t_ids, t_content, t_lm, CPU), N_STEPS)

    bcfg = BertConfig.from_hf(hf_cfg)
    encoder = TextTower(net=BertModel(bcfg), embedding_dim=D,
                        word_embedding_dim=24, pooling="cls",
                        attr_lengths=(T,))
    cfg = Config(item_tower="modal", modality="text", loss="inbatch_ce",
                 max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 num_words_title=T, drop_rate=0.0, lr=1e-3, l2_weight=0.01,
                 fine_tune_lr=5e-4, fine_tune_l2_weight=0.02,
                 word_embedding_dim=24, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)
    content_j = jnp.asarray(item_content.astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        content_j[jnp.asarray(ids).reshape(-1)],
                        jnp.asarray(lm))
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    params["params"]["encoder"]["net"] = jax.tree.map(
        jnp.asarray, convert_bert_state_dict(sd, hf_cfg.num_hidden_layers))
    params["params"]["encoder"]["fc"] = jax.tree.map(jnp.asarray, snap_fc)
    labels = param_labels(params["params"], default_encoder_predicate, set())
    tx = make_optimizer(cfg, labels)
    log_pop = jnp.asarray(np.log(pop), jnp.float32)
    j_losses, j_params = run_jax_steps(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "log_mask": jnp.asarray(lm)},
        N_STEPS, item_content=content_j, log_pop=log_pop)

    assert_traj(t_losses, j_losses)
    np.testing.assert_allclose(
        np.asarray(j_params["encoder"]["net"]["word_embeddings"]["embedding"]),
        t2n(hf_bert.embeddings.word_embeddings.weight), rtol=2e-3, atol=2e-4)


def test_idrec_bce_parity():
    RefModel = load_ref_model_class("bce_text/main-end2end", "bce_text")
    rng = np.random.default_rng(2)
    ids, neg, lm = make_batch_arrays(rng, with_neg=True)
    args = ref_args()

    torch.manual_seed(3)
    tm = RefModel(args, ITEM_NUM, False, None).to(CPU)
    tm.train()
    interleaved = np.stack([ids, neg], axis=2).reshape(-1)  # (B*S*2,)
    t_items = torch.LongTensor(interleaved)
    t_lm = torch.FloatTensor(lm)
    snap_id = t2n(tm.id_embedding.weight)
    snap_ue = sasrec_params_from_torch(tm.user_encoder)
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=0.01)
    t_losses = run_torch_steps(tm, opt, lambda: tm(t_items, t_lm, CPU), N_STEPS)

    cfg = Config(item_tower="id", loss="bce", max_seq_len=L,
                 embedding_dim=D, batch_size=B, num_attention_heads=HEADS,
                 transformer_block=BLOCKS, drop_rate=0.0, lr=1e-3,
                 l2_weight=0.01, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), None,
                        jnp.asarray(lm))
    params["params"]["id_embedding"]["embedding"] = jnp.asarray(snap_id)
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    tx = make_optimizer(cfg)
    j_losses, _ = run_jax_steps(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "neg_ids": jnp.asarray(neg),
         "log_mask": jnp.asarray(lm)}, N_STEPS)
    assert_traj(t_losses, j_losses)


def test_idrec_dssm_bce_parity():
    RefModel = load_ref_model_class("bce_text/main-end2end(DSSM)", "dssm_text")
    rng = np.random.default_rng(3)
    USER_NUM, NEG = 12, 2
    users = rng.integers(1, USER_NUM + 1, size=B).astype(np.int32)
    items = rng.integers(1, ITEM_NUM + 1, size=(B, 1 + NEG)).astype(np.int32)
    labels = np.zeros((B, 1 + NEG), np.float32)
    labels[:, 0] = 1.0
    args = ref_args(dnn_layers=1, neg_num=NEG)

    torch.manual_seed(4)
    tm = RefModel(args, USER_NUM, ITEM_NUM, False, None).to(CPU)
    tm.train()
    t_users = torch.LongTensor(users)
    t_items = torch.LongTensor(items.reshape(-1))
    t_labels = torch.FloatTensor(labels)
    snaps = {"user_embedding": t2n(tm.user_embedding.weight),
             "id_embedding": t2n(tm.id_embedding.weight),
             "user_mlp": mlp_params_from_torch(tm.user_encoder),
             "id_encoder": mlp_params_from_torch(tm.id_encoder)}
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=0.01)
    t_losses = run_torch_steps(tm, opt,
                               lambda: tm(t_users, t_items, t_labels), N_STEPS)

    cfg = Config(item_tower="id", loss="bce", user_tower="dssm",
                 embedding_dim=D, batch_size=B, neg_num=NEG, dnn_layers=1,
                 drop_rate=0.0, lr=1e-3, l2_weight=0.01,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, user_num=USER_NUM)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(items), None, None)
    p = params["params"]
    p["user_embedding"]["embedding"] = jnp.asarray(snaps["user_embedding"])
    p["id_embedding"]["embedding"] = jnp.asarray(snaps["id_embedding"])
    p["user_mlp"] = jax.tree.map(jnp.asarray, snaps["user_mlp"])
    p["id_encoder"] = jax.tree.map(jnp.asarray, snaps["id_encoder"])
    tx = make_optimizer(cfg)
    j_losses, _ = run_jax_steps(
        cfg, model, params, tx,
        {"users": jnp.asarray(users), "items": jnp.asarray(items),
         "labels": jnp.asarray(labels)}, N_STEPS)
    assert_traj(t_losses, j_losses)
