"""Executed train-step parity for the remaining tower families: TWO-STAGE
cached-embedding towers and ID(+)MO fusion towers.

Completes the executed-parity matrix over the reference's item-tower axis:
- two-stage: bce_text/main-2stage(SASRec)/model/model.py:29-47 — cached
  encoder embeddings -> MLP_Layers (fc+GELU -> [dropout,Linear,GELU]^d) ->
  SASRec BCE, single-group AdamW (run.py:124)
- ID+MO ADD and CAT: bce_text/id_plus_mo-end2end/model/model.py:42-67 —
  id_embedding (+) Bert_Encoder output via ADD / CAT(concat->GELU MLP),
  interleaved pos/neg slots, two-group AdamW with the variant's own
  quirk that the fine-tune group pays args.l2_weight, NOT
  fine_tune_l2_weight (run.py:160-162; documented deviation — our config
  keeps both knobs, the test sets them equal)

Each leg executes the reference Model on CPU and asserts loss trajectories
+ param deltas against our train step on transferred weights.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (REF_ROOT, load_ref_model_class, ref_args,
                          sasrec_params_from_torch, t2n)
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
ITEM_NUM, B, L, D, HEADS, BLOCKS = 40, 6, 8, 16, 2, 2
S = L + 1
T = 8


def _bce_batch(rng):
    ids = np.zeros((B, S), np.int32)
    lm = np.zeros((B, L), np.float32)
    for u in range(B):
        seq_len = int(rng.integers(3, S + 1))
        ids[u, S - seq_len:] = rng.integers(1, ITEM_NUM + 1, size=seq_len)
        lm[u, L - (seq_len - 1):] = 1.0
    neg = rng.integers(1, ITEM_NUM + 1, size=(B, S)).astype(np.int32)
    return ids, neg, lm


def _interleave(ids, neg):
    """pos/neg slot interleave the reference datasets emit: the flat index
    recovered by view(-1, S, 2, D) (model.py:50)."""
    return np.stack([ids, neg], axis=2).reshape(-1)


def _run_ours(cfg, model, params, tx, batch, item_content):
    mesh = make_mesh(jax.devices("cpu")[:1])
    params = replicate(mesh, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params["params"]),
                       dropout_rng=jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx, mesh, item_content=item_content)
    batch = shard_batch(mesh, batch)
    losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch)
        losses.append(float(loss))
    return losses, jax.device_get(state.params["params"])


def _run_torch(tm, opt, forward):
    losses = []
    for _ in range(N_STEPS):
        opt.zero_grad()
        loss = forward()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def test_two_stage_bce_parity():
    RefModel = load_ref_model_class("bce_text/main-2stage(SASRec)", "twostage")
    rng = np.random.default_rng(51)
    ids, neg, lm = _bce_batch(rng)
    WD = 24
    cache = rng.normal(size=(ITEM_NUM + 1, WD)).astype(np.float32)
    cache[0] = 0.0  # padding row of the cached catalog (runner._encode_catalog)

    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS,
                    word_embedding_dim=WD, dnn_layer=1)
    torch.manual_seed(52)
    tm = RefModel(args, ITEM_NUM).to(CPU)
    tm.train()
    snap_ue = sasrec_params_from_torch(tm.user_encoder)
    lin = [m for m in tm.fc.mlp_layers if isinstance(m, torch.nn.Linear)]
    snap_proj = {"kernel": t2n(tm.fc.fc.weight).T, "bias": t2n(tm.fc.fc.bias)}
    snap_mlp = {"Dense_0": {"kernel": t2n(lin[0].weight).T,
                            "bias": t2n(lin[0].bias)}}

    flat = _interleave(ids, neg)
    t_items = torch.FloatTensor(cache[flat])
    t_lm = torch.FloatTensor(lm)
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=0.01)
    t_losses = _run_torch(tm, opt, lambda: tm(t_items, t_lm, CPU))

    cfg = Config(item_tower="modal", stage="two_stage", modality="text",
                 loss="bce", max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 dnn_layers=1, word_embedding_dim=WD, drop_rate=0.0,
                 lr=1e-3, l2_weight=0.01, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM)
    content_j = jnp.asarray(cache)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        content_j[jnp.asarray(ids).reshape(-1)],
                        jnp.asarray(lm))
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    params["params"]["modal_proj"] = jax.tree.map(jnp.asarray, snap_proj)
    params["params"]["modal_mlp"] = jax.tree.map(jnp.asarray, snap_mlp)
    tx = make_optimizer(cfg)   # single group, run.py:124
    j_losses, j_params = _run_ours(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "neg_ids": jnp.asarray(neg),
         "log_mask": jnp.asarray(lm)}, content_j)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["modal_proj"]["kernel"]),
        t2n(tm.fc.fc.weight).T, rtol=2e-3, atol=2e-4)


def _id_plus_mo_case(item_tower_ref: str, item_tower_ours: str, seed: int,
                     cat_layers: int = 1):
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel

    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict
    from idvs.morec_tpu.models.text_tower import TextTower

    RefModel = load_ref_model_class("bce_text/id_plus_mo-end2end",
                                    f"idmo_{item_tower_ours}")
    rng = np.random.default_rng(seed)
    ids, neg, lm = _bce_batch(rng)
    tokens = rng.integers(1, 60, size=(ITEM_NUM + 1, T)).astype(np.int64)
    attmask = (rng.uniform(size=tokens.shape) < 0.8).astype(np.int64)
    attmask[:, 0] = 1
    item_content = np.concatenate([tokens, attmask], axis=1)

    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=24, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=48,
                          max_position_embeddings=32,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed + 1)
    hf_bert = HFBertModel(hf_cfg)
    sd = {k: v.clone() for k, v in hf_bert.state_dict().items()}
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS, num_words_title=T,
                    word_embedding_dim=24, item_tower=item_tower_ref)
    torch.manual_seed(seed + 2)
    tm = RefModel(args, ITEM_NUM, True, hf_bert).to(CPU)
    tm.train()
    snap_ue = sasrec_params_from_torch(tm.user_encoder)
    fc = tm.bert_encoder.text_encoders["title"].fc
    snap_fc = {"kernel": t2n(fc.weight).T, "bias": t2n(fc.bias)}
    snap_id = t2n(tm.id_embedding.weight)
    snap_fusion = None
    if "cat" in item_tower_ref:
        lin = [m for m in tm.fc.mlp_layers if isinstance(m, torch.nn.Linear)]
        assert len(lin) == cat_layers
        snap_fusion = {"mlp": {f"Dense_{i}": {"kernel": t2n(m.weight).T,
                                              "bias": t2n(m.bias)}
                               for i, m in enumerate(lin)}}

    flat = _interleave(ids, neg)
    t_ids = torch.LongTensor(flat)
    t_content = torch.LongTensor(item_content[flat])
    t_lm = torch.FloatTensor(lm)
    # the variant's own grouping quirk: BOTH groups pay args.l2_weight
    # (run.py:160-162) — fine_tune_l2_weight is never read there
    bert_params = [p for n, p in tm.named_parameters() if "bert_model" in n]
    recsys_params = [p for n, p in tm.named_parameters()
                     if "bert_model" not in n]
    opt = torch.optim.AdamW([
        {"params": bert_params, "lr": 5e-4, "weight_decay": 0.01},
        {"params": recsys_params, "lr": 1e-3, "weight_decay": 0.01}])
    t_losses = _run_torch(tm, opt, lambda: tm(t_ids, t_content, t_lm, CPU))

    bcfg = BertConfig.from_hf(hf_cfg)
    encoder = TextTower(net=BertModel(bcfg), embedding_dim=D,
                        word_embedding_dim=24, pooling="cls",
                        attr_lengths=(T,))
    cfg = Config(item_tower=item_tower_ours, modality="text", loss="bce",
                 max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 num_words_title=T, drop_rate=0.0, lr=1e-3, l2_weight=0.01,
                 fine_tune_lr=5e-4, fine_tune_l2_weight=0.01,
                 word_embedding_dim=24, cat_layers=cat_layers,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)
    content_j = jnp.asarray(item_content.astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        content_j[jnp.asarray(ids).reshape(-1)],
                        jnp.asarray(lm))
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    params["params"]["id_embedding"]["embedding"] = jnp.asarray(snap_id)
    params["params"]["encoder"]["net"] = jax.tree.map(
        jnp.asarray, convert_bert_state_dict(sd, hf_cfg.num_hidden_layers))
    params["params"]["encoder"]["fc"] = jax.tree.map(jnp.asarray, snap_fc)
    if snap_fusion is not None:
        params["params"]["fusion"] = jax.tree.map(jnp.asarray, snap_fusion)
    labels = param_labels(params["params"], default_encoder_predicate, set())
    tx = make_optimizer(cfg, labels)
    j_losses, j_params = _run_ours(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "neg_ids": jnp.asarray(neg),
         "log_mask": jnp.asarray(lm)}, content_j)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["id_embedding"]["embedding"]),
        t2n(tm.id_embedding.weight), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(
            j_params["encoder"]["net"]["word_embeddings"]["embedding"]),
        t2n(hf_bert.embeddings.word_embeddings.weight), rtol=2e-3, atol=2e-4)


def test_id_plus_mo_add_parity():
    _id_plus_mo_case("modal_add", "modal_id_add", 61)


def test_id_plus_mo_cat_parity():
    _id_plus_mo_case("modal_cat", "modal_id_cat", 71)


def test_id_plus_mo_cat3_parity():
    # the 'modal_cat_3' item_tower value: 3-layer CAT MLP
    # (bce_text/id_plus_mo-end2end/model/model.py:28-34)
    _id_plus_mo_case("modal_cat_3", "modal_id_cat", 77, cat_layers=3)


def test_two_stage_vision_bce_parity():
    """bce_vision/main-2stage(SASRec)'s OWN Model executed: MLP_Layers =
    GELU(fc(cache)) -> [dropout,Linear,GELU]^dnn_layer over the cached image
    features (model/model.py:13-31, encoders.py:7-32), single-group AdamW
    (run.py:115)."""
    RefModel = load_ref_model_class("bce_vision/main-2stage(SASRec)",
                                    "twostage_vis")
    rng = np.random.default_rng(57)
    ids, neg, lm = _bce_batch(rng)
    WD = 24
    cache = rng.normal(size=(ITEM_NUM + 1, WD)).astype(np.float32)
    cache[0] = 0.0

    # this variant spells the flag dnn_layer (singular, parameters.py)
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS, dnn_layer=1)
    torch.manual_seed(58)
    tm = RefModel(args, ITEM_NUM, WD).to(CPU)
    tm.train()
    snap_ue = sasrec_params_from_torch(tm.user_encoder)
    lin = [m for m in tm.fc.mlp_layers if isinstance(m, torch.nn.Linear)]
    snap_proj = {"kernel": t2n(tm.fc.fc.weight).T, "bias": t2n(tm.fc.fc.bias)}
    snap_mlp = {"Dense_0": {"kernel": t2n(lin[0].weight).T,
                            "bias": t2n(lin[0].bias)}}

    flat = _interleave(ids, neg)
    t_items = torch.FloatTensor(cache[flat])
    t_lm = torch.FloatTensor(lm)
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=0.01)
    t_losses = _run_torch(tm, opt, lambda: tm(t_items, t_lm, CPU))

    cfg = Config(item_tower="modal", stage="two_stage", modality="vision",
                 loss="bce", max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 dnn_layers=1, word_embedding_dim=WD, drop_rate=0.0,
                 lr=1e-3, l2_weight=0.01, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM)
    content_j = jnp.asarray(cache)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        content_j[jnp.asarray(ids).reshape(-1)],
                        jnp.asarray(lm))
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    params["params"]["modal_proj"] = jax.tree.map(jnp.asarray, snap_proj)
    params["params"]["modal_mlp"] = jax.tree.map(jnp.asarray, snap_mlp)
    tx = make_optimizer(cfg)
    j_losses, j_params = _run_ours(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "neg_ids": jnp.asarray(neg),
         "log_mask": jnp.asarray(lm)}, content_j)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["modal_proj"]["kernel"]),
        t2n(tm.fc.fc.weight).T, rtol=2e-3, atol=2e-4)


# --------------------------------------------------------- id_plus_mo-2stage
def _mlp_dense_snap(mlp_layers_module):
    """reference MLP_Layers.mlp_layers Sequential -> our MLPLayers subtree."""
    lin = [m for m in mlp_layers_module if isinstance(m, torch.nn.Linear)]
    return {f"Dense_{i}": {"kernel": t2n(m.weight).T, "bias": t2n(m.bias)}
            for i, m in enumerate(lin)}


def _id_plus_mo_two_stage_case(variant_rel: str, item_tower_ref: str,
                               item_tower_ours: str, seed: int,
                               mo_dnn: int, dnn: int):
    """Executed parity for the reference's TRUE id_plus_mo-2stage composition:
    mlp_layers(fusion(id_emb, FC_Layers(content; depth=mo_dnn_layers));
    depth=dnn_layers) — the mo_dnn_layers FC stack runs on the CACHED content
    BEFORE fusion and the dnn_layers MLP on the FUSED vector
    (bce_text/id_plus_mo-2stage/model/model.py:25-27,38-40,49-51; vision twin
    bce_vision/id_plus_mo-2stage/model/model.py:25-41,50-52). Single-group
    AdamW (bce_text/id_plus_mo-2stage/run.py:151, vision run.py:132).
    """
    tag = f"idmo2s_{item_tower_ours}_{variant_rel.split('/')[0]}_{mo_dnn}_{dnn}"
    RefModel = load_ref_model_class(variant_rel, tag)
    rng = np.random.default_rng(seed)
    ids, neg, lm = _bce_batch(rng)
    WD = 24
    cache = rng.normal(size=(ITEM_NUM + 1, WD)).astype(np.float32)
    cache[0] = 0.0

    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS,
                    word_embedding_dim=WD, item_tower=item_tower_ref,
                    dnn_layers=dnn, mo_dnn_layers=mo_dnn)
    torch.manual_seed(seed + 1)
    if variant_rel.startswith("bce_vision"):
        # vision signature: Model(args, item_num, num_fc_ftr, use_modal)
        tm = RefModel(args, ITEM_NUM, WD, True).to(CPU)
    else:
        # text signature: Model(args, item_num, use_modal, bert_model) —
        # bert_model is unused (content arrives cached)
        tm = RefModel(args, ITEM_NUM, True, None).to(CPU)
    tm.train()
    snap_ue = sasrec_params_from_torch(tm.user_encoder)
    snap_id = t2n(tm.id_embedding.weight)
    snap_turn = {"fc": {"kernel": t2n(tm.turn_dim.fc.weight).T,
                        "bias": t2n(tm.turn_dim.fc.bias)}}
    if mo_dnn > 0:
        snap_turn["mlp"] = _mlp_dense_snap(tm.turn_dim.mlp_layers.mlp_layers)
    snap_fusion = None
    if item_tower_ref == "modal_cat":
        snap_fusion = {"mlp": _mlp_dense_snap(tm.fc.mlp_layers)}
    snap_post = None
    if dnn > 0:
        snap_post = _mlp_dense_snap(tm.mlp_layers.mlp_layers)

    flat = _interleave(ids, neg)
    t_ids = torch.LongTensor(flat)
    t_content = torch.FloatTensor(cache[flat])
    t_lm = torch.FloatTensor(lm)
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=0.01)
    t_losses = _run_torch(tm, opt, lambda: tm(t_ids, t_content, t_lm, CPU))

    cfg = Config(item_tower=item_tower_ours, stage="two_stage",
                 modality=("vision" if variant_rel.startswith("bce_vision")
                           else "text"),
                 loss="bce", max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 dnn_layers=dnn, mo_dnn_layers=mo_dnn, word_embedding_dim=WD,
                 drop_rate=0.0, lr=1e-3, l2_weight=0.01,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM)
    content_j = jnp.asarray(cache)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        content_j[jnp.asarray(ids).reshape(-1)],
                        jnp.asarray(lm))
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    params["params"]["id_embedding"]["embedding"] = jnp.asarray(snap_id)
    params["params"]["turn_dim"] = jax.tree.map(jnp.asarray, snap_turn)
    if snap_fusion is not None:
        params["params"]["fusion"] = jax.tree.map(jnp.asarray, snap_fusion)
    if snap_post is not None:
        params["params"]["post_mlp"] = jax.tree.map(jnp.asarray, snap_post)
    tx = make_optimizer(cfg)   # single group (run.py:151)
    j_losses, j_params = _run_ours(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "neg_ids": jnp.asarray(neg),
         "log_mask": jnp.asarray(lm)}, content_j)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-4)
    # both trainable stacks moved in lockstep with torch
    np.testing.assert_allclose(
        np.asarray(j_params["turn_dim"]["fc"]["kernel"]),
        t2n(tm.turn_dim.fc.weight).T, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["id_embedding"]["embedding"]),
        t2n(tm.id_embedding.weight), rtol=2e-3, atol=2e-4)
    if dnn > 0:
        lin0 = [m for m in tm.mlp_layers.mlp_layers
                if isinstance(m, torch.nn.Linear)][0]
        np.testing.assert_allclose(
            np.asarray(j_params["post_mlp"]["Dense_0"]["kernel"]),
            t2n(lin0.weight).T, rtol=2e-3, atol=2e-4)


def test_id_plus_mo_two_stage_add_parity():
    _id_plus_mo_two_stage_case("bce_text/id_plus_mo-2stage",
                               "modal_add", "modal_id_add", 81,
                               mo_dnn=2, dnn=2)


def test_id_plus_mo_two_stage_cat_parity():
    _id_plus_mo_two_stage_case("bce_text/id_plus_mo-2stage",
                               "modal_cat", "modal_id_cat", 91,
                               mo_dnn=2, dnn=2)


def test_id_plus_mo_two_stage_vision_parity():
    # the vision twin at the reference test grid's degenerate dnn=0 point
    # (test_swin_tiny_add.py:30-31: mo 8 / dnn 0) — post-fusion MLP_Layers
    # is identity there, the FC stack is not
    _id_plus_mo_two_stage_case("bce_vision/id_plus_mo-2stage",
                               "modal_add", "modal_id_add", 101,
                               mo_dnn=2, dnn=0)
