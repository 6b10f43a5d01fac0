"""Executable TRAIN-step parity vs the reference's own VISION torch code.

The fifth composition of test_reference_torch_parity.py: the reference
vision Model.forward (inbatch_sasrec_e2e_vision/model/model.py:35-73 — its
own in-batch CE with the O(B·L) per-row rejection loop over image-encoder
embeddings) executes on CPU with a tiny HF SwinForImageClassification
(classifier replaced per run.py:47-54, Vit_Encoder wrapping), driven by the
vision two-group AdamW rule (run.py:121-134: 'image_net' in name minus
'fc'/'classifier'), against our train step with the converted Flax Swin
tower on identical batches — including PAD slots, whose images are
normalized zeros on the reference side (dataset.py:86) and uint8 zeros +
VisionTower.pad_mask on ours.
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
ITEM_NUM, B, L, D, HEADS, BLOCKS = 40, 4, 6, 16, 2, 2
S = L + 1
R = 16


def test_vision_morec_inbatch_ce_train_parity():
    from transformers import SwinConfig as HFC, SwinForImageClassification
    from torch import nn
    from torch.nn.init import constant_, xavier_normal_

    from idvs.morec_tpu.models.swin import (SwinConfig, SwinModel,
                                            convert_swin_state_dict)
    from idvs.morec_tpu.models.vision_tower import VisionTower

    RefModel = load_ref_model_class("inbatch_sasrec_e2e_vision", "trainpar_vis")
    rng = np.random.default_rng(41)

    # batch with real pads (reference BuildTrainDataset padding)
    ids = np.zeros((B, S), np.int32)
    lm = np.zeros((B, L), np.float32)
    for u in range(B):
        seq_len = int(rng.integers(3, S + 1))
        ids[u, S - seq_len:] = rng.integers(1, ITEM_NUM + 1, size=seq_len)
        lm[u, L - (seq_len - 1):] = 1.0
    imgs_u8 = rng.integers(0, 256, size=(ITEM_NUM + 1, R, R, 3),
                           dtype=np.uint8)
    pop = rng.uniform(0.2, 1.0, size=ITEM_NUM + 1)
    pop[1:] /= pop[1:].sum()
    pop[0] = 1.0

    hf_cfg = HFC(image_size=R, patch_size=2, num_channels=3, embed_dim=8,
                 depths=[2, 2], num_heads=[2, 4], window_size=2,
                 mlp_ratio=2.0, drop_path_rate=0.0, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)
    torch.manual_seed(42)
    cv_model = SwinForImageClassification(hf_cfg)
    cv_model.classifier = nn.Linear(cv_model.classifier.in_features, D)
    xavier_normal_(cv_model.classifier.weight.data)
    constant_(cv_model.classifier.bias.data, 0)
    sd = {k: v.clone() for k, v in cv_model.swin.state_dict().items()}
    snap_cls = {"kernel": t2n(cv_model.classifier.weight).T,
                "bias": t2n(cv_model.classifier.bias)}

    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS,
                    CV_model_load="swin_tiny", CV_resize=R)
    torch.manual_seed(43)
    tm = RefModel(args, ITEM_NUM, True, cv_model, pop).to(CPU)
    tm.train()
    snap_ue = sasrec_params_from_torch(tm.user_encoder)

    # torch images: the train dataset's transform output — normalized f32
    # CHW, with pad slots EXACTLY zero (dataset.py:86 padding_emb)
    flat = ids.reshape(-1)
    norm = (imgs_u8[flat].astype(np.float32) / 255.0 - 0.5) / 0.5
    norm[flat == 0] = 0.0
    t_imgs = torch.FloatTensor(norm.transpose(0, 3, 1, 2))
    t_ids = torch.LongTensor(flat)
    t_lm = torch.FloatTensor(lm)

    # two-group AdamW exactly as vision run.py:121-134
    image_net_params, recsys_params = [], []
    for name, param in tm.named_parameters():
        if "image_net" in name and "fc" not in name and "classifier" not in name:
            image_net_params.append(param)
        else:
            recsys_params.append(param)
    opt = torch.optim.AdamW([
        {"params": image_net_params, "lr": 5e-4, "weight_decay": 0.02},
        {"params": recsys_params, "lr": 1e-3, "weight_decay": 0.01}])
    t_losses = []
    for _ in range(N_STEPS):
        opt.zero_grad()
        loss = tm(t_ids, t_imgs, t_lm, CPU)
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    # --- ours: converted Flax Swin, uint8 content incl. u8-zero pads ---
    scfg = SwinConfig.from_hf(hf_cfg)
    encoder = VisionTower(net=SwinModel(scfg), kind="swin", embedding_dim=D,
                          feature_dim=scfg.num_features, compute_dtype=None)
    cfg = Config(item_tower="modal", modality="vision", loss="inbatch_ce",
                 max_seq_len=L, embedding_dim=D, batch_size=B,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 drop_rate=0.0, lr=1e-3, l2_weight=0.01, fine_tune_lr=5e-4,
                 fine_tune_l2_weight=0.02, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)
    content = jnp.asarray(np.where((flat == 0)[:, None, None, None], 0,
                                   imgs_u8[flat]).astype(np.uint8))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), content,
                        jnp.asarray(lm))
    params["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
    params["params"]["encoder"]["net"] = jax.tree.map(
        jnp.asarray, convert_swin_state_dict(
            {k: v.numpy() for k, v in sd.items()}, scfg))
    params["params"]["encoder"]["classifier"] = jax.tree.map(jnp.asarray,
                                                             snap_cls)
    labels = param_labels(params["params"], default_encoder_predicate, set())
    tx = make_optimizer(cfg, labels)

    mesh = make_mesh(jax.devices("cpu")[:1])
    params = replicate(mesh, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params["params"]),
                       dropout_rng=jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx, mesh,
                           log_pop=jnp.asarray(np.log(pop), jnp.float32))
    batch = shard_batch(mesh, {"ids": jnp.asarray(ids),
                               "log_mask": jnp.asarray(lm),
                               "content": content})
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch)
        j_losses.append(float(loss))
    j_params = jax.device_get(state.params["params"])

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-4)
    # param deltas agree: fine-tune group (patch embed, inside image_net)
    # and recsys group (classifier) both moved as torch moved them
    np.testing.assert_allclose(
        np.asarray(j_params["encoder"]["classifier"]["kernel"]),
        t2n(cv_model.classifier.weight).T, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_params["encoder"]["net"]["patch_projection"]["kernel"]),
        t2n(cv_model.swin.embeddings.patch_embeddings.projection.weight
            ).transpose(2, 3, 1, 0), rtol=2e-3, atol=2e-4)
