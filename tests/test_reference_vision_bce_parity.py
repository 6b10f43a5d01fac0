"""Executed TRAIN parity for the last two unexecuted reference compositions:
vision BCE end2end and vision DSSM.

- bce_vision/main-end2end/model/model.py:34-50 — cv_encoder over interleaved
  pos/neg image slots, per-position dot scores, 2×BCEWithLogits on non-pad
  positions; two-group AdamW with BOTH groups paying args.l2_weight
  (run.py:131-134 — fine_tune_l2_weight parsed, never read).
- bce_vision/main-end2end(DSSM)/model/model.py:35-46 — user-ID embedding +
  MLP_Encoder vs cv_encoder item features, bmm scores vs [1, 0...] labels;
  same two-group rule (run.py:141-144).

Each leg executes the reference's own torch Model on CPU with a tiny HF
SwinForImageClassification (classifier replaced per run.py:34-41 /
Vit_Encoder wrapping) and asserts loss trajectories + param deltas against
our train step with the converted Flax Swin tower — pad slots normalized
zeros on the torch side (dataset.py padding_emb), uint8 zeros +
VisionTower.pad_mask on ours.

With these two legs every one of the reference's 12 variant dirs has at
least one executed train- or eval-parity leg (PARITY round-4 table).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (REF_ROOT, load_ref_model_class, mlp_params_from_torch,
                          ref_args, sasrec_params_from_torch, t2n)
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
ITEM_NUM, B, L, D, HEADS, BLOCKS = 30, 4, 6, 16, 2, 2
S = L + 1
R = 16


def _tiny_swin(seed: int):
    from torch import nn
    from torch.nn.init import constant_, xavier_normal_
    from transformers import SwinConfig as HFC, SwinForImageClassification

    hf_cfg = HFC(image_size=R, patch_size=2, num_channels=3, embed_dim=8,
                 depths=[2, 2], num_heads=[2, 4], window_size=2,
                 mlp_ratio=2.0, drop_path_rate=0.0, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    cv_model = SwinForImageClassification(hf_cfg)
    cv_model.classifier = nn.Linear(cv_model.classifier.in_features, D)
    xavier_normal_(cv_model.classifier.weight.data)
    constant_(cv_model.classifier.bias.data, 0)
    return hf_cfg, cv_model


def _norm_images(imgs_u8, flat_ids):
    """The reference transform's output: normalized f32 CHW, pad slots
    EXACTLY zero (bce_vision dataset padding_emb)."""
    norm = (imgs_u8[flat_ids].astype(np.float32) / 255.0 - 0.5) / 0.5
    norm[flat_ids == 0] = 0.0
    return torch.FloatTensor(norm.transpose(0, 3, 1, 2))


def _vision_two_group_opt(tm, lr, fine_tune_lr, l2):
    """run.py:120-134: 'image_net' minus fc/classifier at fine_tune_lr;
    BOTH groups pay args.l2_weight."""
    image_net_params, recsys_params = [], []
    for name, param in tm.named_parameters():
        if ("image_net" in name and "fc" not in name
                and "classifier" not in name):
            image_net_params.append(param)
        else:
            recsys_params.append(param)
    return torch.optim.AdamW([
        {"params": image_net_params, "lr": fine_tune_lr, "weight_decay": l2},
        {"params": recsys_params, "lr": lr, "weight_decay": l2}])


def _our_swin_encoder(hf_cfg):
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel
    from idvs.morec_tpu.models.vision_tower import VisionTower
    scfg = SwinConfig.from_hf(hf_cfg)
    return scfg, VisionTower(net=SwinModel(scfg), kind="swin",
                             embedding_dim=D, feature_dim=scfg.num_features,
                             compute_dtype=None)


def _graft_swin(params, sd, scfg, snap_cls):
    from idvs.morec_tpu.models.swin import convert_swin_state_dict
    params["params"]["encoder"]["net"] = jax.tree.map(
        jnp.asarray, convert_swin_state_dict(
            {k: v.numpy() for k, v in sd.items()}, scfg))
    params["params"]["encoder"]["classifier"] = jax.tree.map(jnp.asarray,
                                                             snap_cls)


def _run_ours(cfg, model, params, tx, batch):
    mesh = make_mesh(jax.devices("cpu")[:1])
    params = replicate(mesh, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params["params"]),
                       dropout_rng=jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx, mesh)
    batch = shard_batch(mesh, batch)
    losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch)
        losses.append(float(loss))
    return losses, jax.device_get(state.params["params"])


def test_vision_bce_end2end_train_parity():
    RefModel = load_ref_model_class("bce_vision/main-end2end", "visbce")
    rng = np.random.default_rng(111)

    ids = np.zeros((B, S), np.int32)
    lm = np.zeros((B, L), np.float32)
    for u in range(B):
        seq_len = int(rng.integers(3, S + 1))
        ids[u, S - seq_len:] = rng.integers(1, ITEM_NUM + 1, size=seq_len)
        lm[u, L - (seq_len - 1):] = 1.0
    neg = rng.integers(1, ITEM_NUM + 1, size=(B, S)).astype(np.int32)
    imgs_u8 = rng.integers(0, 256, size=(ITEM_NUM + 1, R, R, 3),
                           dtype=np.uint8)

    hf_cfg, cv_model = _tiny_swin(112)
    sd = {k: v.clone() for k, v in cv_model.swin.state_dict().items()}
    snap_cls = {"kernel": t2n(cv_model.classifier.weight).T,
                "bias": t2n(cv_model.classifier.bias)}
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS,
                    CV_model_load="swin_tiny", CV_resize=R)
    torch.manual_seed(113)
    tm = RefModel(args, ITEM_NUM, True, cv_model).to(CPU)
    tm.train()
    snap_ue = sasrec_params_from_torch(tm.user_encoder)

    # the reference dataset interleaves pos/neg per slot: view(-1, S, 2, D)
    flat = np.stack([ids, neg], axis=2).reshape(-1)
    t_imgs = _norm_images(imgs_u8, flat)
    t_lm = torch.FloatTensor(lm)
    opt = _vision_two_group_opt(tm, lr=1e-3, fine_tune_lr=5e-4, l2=0.01)
    t_losses = []
    for _ in range(N_STEPS):
        opt.zero_grad()
        loss = tm(t_imgs, t_lm, CPU)
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    # ours: uint8 content (pads = u8 zeros + pad_mask), separate pos/neg
    scfg, encoder = _our_swin_encoder(hf_cfg)
    cfg = Config(item_tower="modal", modality="vision", loss="bce",
                 max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 drop_rate=0.0, lr=1e-3, l2_weight=0.01, fine_tune_lr=5e-4,
                 fine_tune_l2_weight=0.01, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)
    pos_flat = ids.reshape(-1)
    neg_flat = neg.reshape(-1)
    u8 = lambda f: jnp.asarray(np.where((f == 0)[:, None, None, None], 0,
                                        imgs_u8[f]).astype(np.uint8))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), u8(pos_flat),
                        jnp.asarray(lm))
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    _graft_swin(params, sd, scfg, snap_cls)
    labels = param_labels(params["params"], default_encoder_predicate, set())
    tx = make_optimizer(cfg, labels)
    j_losses, j_params = _run_ours(
        cfg, model, params, tx,
        {"ids": jnp.asarray(ids), "neg_ids": jnp.asarray(neg),
         "log_mask": jnp.asarray(lm),
         "content": u8(pos_flat), "neg_content": u8(neg_flat)})

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["encoder"]["classifier"]["kernel"]),
        t2n(cv_model.classifier.weight).T, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["encoder"]["net"]["patch_projection"]["kernel"]),
        t2n(cv_model.swin.embeddings.patch_embeddings.projection.weight
            ).transpose(2, 3, 1, 0), rtol=2e-3, atol=2e-4)


def test_vision_dssm_train_parity():
    RefModel = load_ref_model_class("bce_vision/main-end2end(DSSM)", "visdssm")
    rng = np.random.default_rng(121)
    USER_NUM, NEG = 20, 2

    users = rng.integers(1, USER_NUM + 1, size=(B,)).astype(np.int32)
    items = rng.integers(1, ITEM_NUM + 1, size=(B, 1 + NEG)).astype(np.int32)
    labels = np.zeros((B, 1 + NEG), np.float32)
    labels[:, 0] = 1.0
    imgs_u8 = rng.integers(0, 256, size=(ITEM_NUM + 1, R, R, 3),
                           dtype=np.uint8)

    hf_cfg, cv_model = _tiny_swin(122)
    sd = {k: v.clone() for k, v in cv_model.swin.state_dict().items()}
    snap_cls = {"kernel": t2n(cv_model.classifier.weight).T,
                "bias": t2n(cv_model.classifier.bias)}
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS, neg_num=NEG,
                    dnn_layers=1, CV_model_load="swin_tiny", CV_resize=R)
    torch.manual_seed(123)
    tm = RefModel(args, USER_NUM, ITEM_NUM, True, cv_model).to(CPU)
    tm.train()
    snap_uemb = t2n(tm.user_embedding.weight)
    snap_umlp = mlp_params_from_torch(tm.user_encoder)

    flat = items.reshape(-1)
    t_users = torch.LongTensor(users)
    t_imgs = _norm_images(imgs_u8, flat)
    t_labels = torch.FloatTensor(labels)
    opt = _vision_two_group_opt(tm, lr=1e-3, fine_tune_lr=5e-4, l2=0.01)
    t_losses = []
    for _ in range(N_STEPS):
        opt.zero_grad()
        loss = tm(t_users, t_imgs, t_labels)
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    scfg, encoder = _our_swin_encoder(hf_cfg)
    cfg = Config(item_tower="modal", modality="vision", loss="bce",
                 user_tower="dssm", neg_num=NEG, dnn_layers=1,
                 max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 drop_rate=0.0, lr=1e-3, l2_weight=0.01, fine_tune_lr=5e-4,
                 fine_tune_l2_weight=0.01, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, user_num=USER_NUM,
                       encoder=encoder)
    content = jnp.asarray(imgs_u8[flat])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(items), content,
                        None, user_ids=jnp.asarray(users))
    params["params"]["user_embedding"]["embedding"] = jnp.asarray(snap_uemb)
    if snap_umlp:
        params["params"]["user_mlp"] = jax.tree.map(jnp.asarray, snap_umlp)
    _graft_swin(params, sd, scfg, snap_cls)
    labels_tree = param_labels(params["params"], default_encoder_predicate,
                               set())
    tx = make_optimizer(cfg, labels_tree)
    j_losses, j_params = _run_ours(
        cfg, model, params, tx,
        {"users": jnp.asarray(users), "items": jnp.asarray(items),
         "labels": jnp.asarray(labels), "content": content})

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["user_embedding"]["embedding"]),
        t2n(tm.user_embedding.weight), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["encoder"]["classifier"]["kernel"]),
        t2n(cv_model.classifier.weight).T, rtol=2e-3, atol=2e-4)
