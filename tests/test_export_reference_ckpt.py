"""Reverse converter (.ckpt -> reference .pt): executed round trips.

1. torch -> ours -> torch round-trip identity: a reference-trained .pt
   converted in (tools/convert_reference_ckpt) then exported back
   (tools/export_reference_ckpt) reproduces every mapped tensor and AdamW
   moment bit-for-bit, with pooler/buffers carried by the template.
2. A natively-trained checkpoint of OURS exports to a .pt the reference's
   own Model loads with strict=True and its own AdamW loads — the
   artifact is drop-in for the reference's run_test.py/resume workflow.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (REF_ROOT, load_ref_model_class, null_logger,
                          ref_args, t2n)
from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.train.checkpoint import save_checkpoint
from idvs.morec_tpu.train.state import TrainState, make_optimizer

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
L, D, N_ITEMS, T = 8, 16, 40, 8

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))


def tiny_hf_bert(seed=70):
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    cfg = HFBertConfig(vocab_size=64, hidden_size=128, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=256,
                       max_position_embeddings=32, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    return cfg, HFBertModel(cfg)


def test_torch_roundtrip_identity(tmp_path):
    """reference .pt -> our .ckpt -> exported .pt: every model tensor and
    every optimizer moment identical; pooler and position_ids buffers
    survive via the template."""
    import convert_reference_ckpt as fwd_tool
    import export_reference_ckpt as rev_tool

    hf_cfg, bert = tiny_hf_bert()
    for idx, (_n, p) in enumerate(bert.named_parameters()):
        if idx < 3 or idx in (37, 38):
            p.requires_grad = False
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "exp_rt")
    args = ref_args(L=L, D=D, num_words_title=T, word_embedding_dim=128)
    torch.manual_seed(71)
    m = RefModel(args, N_ITEMS, True, bert, np.ones(N_ITEMS + 1))
    bert_params = [p for n, p in m.named_parameters()
                   if p.requires_grad and "bert_model" in n]
    rec_params = [p for n, p in m.named_parameters()
                  if p.requires_grad and "bert_model" not in n]
    opt = torch.optim.AdamW([
        {"params": bert_params, "lr": 5e-4, "weight_decay": 0.02},
        {"params": rec_params, "lr": 1e-3, "weight_decay": 0.01}])
    r = np.random.default_rng(72)
    for i in range(3):
        ids = torch.LongTensor(r.integers(1, N_ITEMS + 1, size=(4 * (L + 1),)))
        content = torch.LongTensor(
            np.concatenate([r.integers(2, 64, size=(4 * (L + 1), T)),
                            np.ones((4 * (L + 1), T))], axis=1))
        lm = torch.ones(4, L)
        opt.zero_grad()
        m(ids, content, lm, CPU).backward()
        opt.step()
    orig_sd = {k: t2n(v) for k, v in m.state_dict().items()}
    orig_opt = opt.state_dict()
    pt0 = tmp_path / "epoch-3.pt"
    torch.save({"model_state_dict": m.state_dict(),
                "optimizer": orig_opt,
                "rng_state": torch.get_rng_state(),
                "cuda_rng_state": torch.get_rng_state(),
                "scaler_state": {}}, pt0)

    flags = ["--item_tower", "modal", "--modality", "text",
             "--bert_model_load", "bert-tiny", "--freeze_paras_before", "3",
             "--embedding_dim", str(D), "--max_seq_len", str(L),
             "--num_words_title", str(T), "--word_embedding_dim", "128",
             "--fine_tune_lr", "5e-4", "--fine_tune_l2_weight", "0.02",
             "--lr", "1e-3", "--l2_weight", "0.01"]
    ckpt = fwd_tool.main(["--pt", str(pt0), "--out", str(tmp_path / "mid") + os.sep]
                         + flags)
    pt1 = rev_tool.main(["--ckpt", ckpt, "--out", str(tmp_path / "back") + os.sep]
                        + flags, net_template_sd=bert.state_dict())

    back = torch.load(pt1, map_location="cpu", weights_only=False)
    back_sd = {k: t2n(v) for k, v in back["model_state_dict"].items()}
    assert set(back_sd) == set(orig_sd)
    for k in orig_sd:
        np.testing.assert_array_equal(back_sd[k], orig_sd[k], err_msg=k)
    # optimizer: same group sizes, same moments per index
    bo = back["optimizer"]
    assert [len(g["params"]) for g in bo["param_groups"]] == \
        [len(g["params"]) for g in orig_opt["param_groups"]]
    for i, st in orig_opt["state"].items():
        np.testing.assert_array_equal(t2n(bo["state"][i]["exp_avg"]),
                                      t2n(st["exp_avg"]), err_msg=str(i))
        np.testing.assert_array_equal(t2n(bo["state"][i]["exp_avg_sq"]),
                                      t2n(st["exp_avg_sq"]))
        assert int(bo["state"][i]["step"]) == int(np.asarray(st["step"]))


def test_native_checkpoint_strict_loads_into_reference(tmp_path):
    """A checkpoint that never saw torch (our init + optax) exports to a
    .pt the reference Model strict-loads and the reference AdamW
    load_state_dict accepts, and the loaded towers reproduce our item
    embeddings."""
    import export_reference_ckpt as rev_tool
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.text_tower import TextTower

    hf_cfg, bert = tiny_hf_bert(seed=80)
    bcfg = BertConfig.from_hf(hf_cfg)
    cfg = Config(item_tower="modal", modality="text", embedding_dim=D,
                 max_seq_len=L, num_words_title=T, word_embedding_dim=128,
                 bert_model_load="bert-tiny", freeze_paras_before=0,
                 compute_dtype="float32", lr=1e-3, l2_weight=0.01,
                 fine_tune_lr=5e-4, fine_tune_l2_weight=0.02)
    tower = TextTower(net=BertModel(bcfg), embedding_dim=D,
                      word_embedding_dim=128, pooling="cls",
                      attr_lengths=(T,))
    model = make_model(cfg, item_num=N_ITEMS, encoder=tower)
    content0 = jnp.ones((2 * (L + 1), 2 * T), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(3),
                            "masking": jax.random.PRNGKey(4)},
                           jnp.ones((2, L + 1), jnp.int32), content0,
                           jnp.ones((2, L), jnp.float32))
    from idvs.morec_tpu.models.convert_text import bert_frozen_paths
    from idvs.morec_tpu.train.state import (default_encoder_predicate,
                                            param_labels)
    labels = param_labels(variables["params"], default_encoder_predicate,
                          bert_frozen_paths(2, 0, ("encoder", "net")))
    tx = make_optimizer(cfg, labels)
    state = TrainState(step=jnp.asarray(7, jnp.int32), params=variables,
                       opt_state=tx.init(variables["params"]),
                       dropout_rng=jax.random.PRNGKey(5))
    ckpt_path = save_checkpoint(str(tmp_path), 2, state)

    flags = ["--item_tower", "modal", "--modality", "text",
             "--bert_model_load", "bert-tiny", "--freeze_paras_before", "0",
             "--embedding_dim", str(D), "--max_seq_len", str(L),
             "--num_words_title", str(T), "--word_embedding_dim", "128",
             "--fine_tune_lr", "5e-4", "--fine_tune_l2_weight", "0.02",
             "--lr", "1e-3", "--l2_weight", "0.01"]
    pt = rev_tool.main(["--ckpt", ckpt_path, "--out", str(tmp_path)]
                       + flags, net_template_sd=bert.state_dict())

    # the reference's load path, strict
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "exp_nat")
    args = ref_args(L=L, D=D, num_words_title=T, word_embedding_dim=128)
    torch.manual_seed(81)
    bert2 = tiny_hf_bert(seed=82)[1]
    # the reference ALWAYS freezes the pooler (run.py:55-75 size table)
    for idx, (_n, p) in enumerate(bert2.named_parameters()):
        if idx in (37, 38):
            p.requires_grad = False
    m = RefModel(args, N_ITEMS, True, bert2, np.ones(N_ITEMS + 1))
    payload = torch.load(pt, map_location="cpu", weights_only=False)
    m.load_state_dict(payload["model_state_dict"])          # strict=True
    bert_params = [p for n, p in m.named_parameters() if "bert_model" in n
                   and p.requires_grad]
    rec_params = [p for n, p in m.named_parameters()
                  if "bert_model" not in n and p.requires_grad]
    opt = torch.optim.AdamW([
        {"params": bert_params, "lr": 5e-4, "weight_decay": 0.02},
        {"params": rec_params, "lr": 1e-3, "weight_decay": 0.01}])
    opt.load_state_dict(payload["optimizer"])

    # loaded towers reproduce our item embeddings
    r = np.random.default_rng(83)
    probe_ids = np.concatenate(
        [r.integers(2, 64, size=(5, T)), np.ones((5, T))],
        axis=1).astype(np.int64)
    m.eval()
    with torch.no_grad():
        want = t2n(m.bert_encoder(torch.LongTensor(probe_ids)))
    got = model.apply({"params": variables["params"]},
                      jnp.arange(1, 6, dtype=jnp.int32),
                      jnp.asarray(probe_ids, jnp.int32), method="item_embs")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_converted_reference_ckpt_serves(tmp_path):
    """The full migration-to-production story: a reference-trained .pt
    converts and goes straight into the serving engine — catalog encoded
    through the converted towers, top-K recommendations exclude history
    and rank by the converted weights' scores."""
    import convert_reference_ckpt as fwd_tool
    import flax.serialization as fs

    from idvs.morec_tpu.serve import Retriever

    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "exp_srv")
    rng = np.random.default_rng(90)
    pop = np.ones(N_ITEMS + 1)
    torch.manual_seed(91)
    m = RefModel(ref_args(L=L, D=D), N_ITEMS, False, None, pop)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-3)
    for i in range(3):
        ids = torch.LongTensor(rng.integers(1, N_ITEMS + 1,
                                            size=(4 * (L + 1),)))
        lm = torch.ones(4, L)
        opt.zero_grad()
        m(ids, ids, lm, CPU).backward()
        opt.step()
    pt = tmp_path / "epoch-1.pt"
    torch.save({"model_state_dict": m.state_dict(),
                "optimizer": opt.state_dict(),
                "rng_state": torch.get_rng_state(),
                "cuda_rng_state": torch.get_rng_state(),
                "scaler_state": {}}, pt)
    ckpt = fwd_tool.main(["--pt", str(pt), "--out", str(tmp_path),
                          "--item_tower", "id", "--embedding_dim", str(D),
                          "--max_seq_len", str(L),
                          "--num_attention_heads", "2",
                          "--transformer_block", "2"])
    with open(ckpt, "rb") as f:
        payload = fs.msgpack_restore(f.read())

    cfg = Config(item_tower="id", embedding_dim=D, max_seq_len=L,
                 num_attention_heads=2, transformer_block=2,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=N_ITEMS)
    params = jax.tree.map(jnp.asarray, payload["params"])
    table = Retriever.encode_catalog(model, params, N_ITEMS, None, D)
    # the served catalog IS the converted id_embedding table
    np.testing.assert_allclose(np.asarray(table),
                               t2n(m.id_embedding.weight), rtol=1e-6,
                               atol=1e-6)
    r = Retriever(model, params, table, max_seq_len=L,
                  batch_sizes=(4,))
    hists = [[1, 2, 3], [7, 9], [5], [11, 12]]
    ids_out, scores = r.recommend(hists, top_k=5)
    assert ids_out.shape == (4, 5)
    for u, h in enumerate(hists):
        assert not (set(ids_out[u].tolist()) & set(h)), "history leaked"
        assert 0 not in ids_out[u]
    assert np.all(np.diff(scores, axis=1) <= 1e-6)   # best-first


def test_vision_roundtrip_identity_swin_and_resnet(tmp_path):
    """Vision export paths: the 4D conv inverse (Swin patch projection /
    ResNet convs) and the BatchNorm running-stats re-emission under the
    torch buffer names (incl. the Sequential 'downsample.1' naming)."""
    import convert_reference_ckpt as fwd_tool
    import export_reference_ckpt as rev_tool

    # ---- Swin
    from test_convert_reference_ckpt import tiny_hf_swin
    hf_cfg, net = tiny_hf_swin(seed=92)
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_vision", "exp_vsw")
    args = ref_args(L=L, D=D, CV_model_load="swin_tiny")
    torch.manual_seed(93)
    m = RefModel(args, N_ITEMS, True, net, np.ones(N_ITEMS + 1))
    image_net_params = [p for n, p in m.named_parameters()
                        if "image_net" in n and "classifier" not in n]
    rec_params = [p for n, p in m.named_parameters()
                  if "image_net" not in n or "classifier" in n]
    opt = torch.optim.AdamW([
        {"params": image_net_params, "lr": 1e-4, "weight_decay": 0.02},
        {"params": rec_params, "lr": 1e-3, "weight_decay": 0.01}])
    r = np.random.default_rng(94)
    for _ in range(2):
        ids = torch.LongTensor(r.integers(1, N_ITEMS + 1,
                                          size=(2 * (L + 1),)))
        imgs = torch.FloatTensor(r.normal(size=(2 * (L + 1), 3, 32, 32)))
        opt.zero_grad()
        m(ids, imgs, torch.ones(2, L), CPU).backward()
        opt.step()
    orig_sd = {k: t2n(v) for k, v in m.state_dict().items()}
    pt0 = tmp_path / "sw" / "epoch-2.pt"
    os.makedirs(pt0.parent)
    torch.save({"model_state_dict": m.state_dict(),
                "optimizer": opt.state_dict(),
                "rng_state": torch.get_rng_state(),
                "cuda_rng_state": torch.get_rng_state(),
                "scaler_state": {}}, pt0)
    flags = ["--item_tower", "modal", "--modality", "vision",
             "--cv_model_load", "swin_tiny", "--freeze_paras_before", "0",
             "--embedding_dim", str(D), "--max_seq_len", str(L),
             "--fine_tune_lr", "1e-4", "--fine_tune_l2_weight", "0.02",
             "--lr", "1e-3", "--l2_weight", "0.01"]
    ckpt = fwd_tool.main(["--pt", str(pt0)] + flags)
    pt1 = rev_tool.main(["--ckpt", ckpt, "--out",
                         str(tmp_path / "sw_back") + os.sep] + flags,
                        net_template_sd=net.state_dict())
    back_sd = {k: t2n(v) for k, v in torch.load(
        pt1, map_location="cpu",
        weights_only=False)["model_state_dict"].items()}
    assert set(back_sd) == set(orig_sd)
    for k in orig_sd:
        np.testing.assert_array_equal(back_sd[k], orig_sd[k], err_msg=k)

    # ---- ResNet (BN running stats; torchvision-layout replica)
    from test_resnet import TorchResNet18
    torch.manual_seed(95)
    rnet = TorchResNet18(out_dim=D)
    torch.manual_seed(96)
    args_rn = ref_args(L=L, D=D, CV_model_load="resnet18")
    m2 = load_ref_model_class("inbatch_sasrec_e2e_vision", "exp_vrn")(
        args_rn, N_ITEMS, True, rnet, np.ones(N_ITEMS + 1))
    m2.train()
    img_params = [p for n, p in m2.named_parameters()
                  if "image_net" in n and "fc" not in n
                  and "classifier" not in n]
    rec2 = [p for n, p in m2.named_parameters()
            if "image_net" not in n or "fc" in n or "classifier" in n]
    opt2 = torch.optim.AdamW([
        {"params": img_params, "lr": 1e-4, "weight_decay": 0.02},
        {"params": rec2, "lr": 1e-3, "weight_decay": 0.01}])
    for _ in range(2):
        ids = torch.LongTensor(r.integers(1, N_ITEMS + 1,
                                          size=(2 * (L + 1),)))
        imgs = torch.FloatTensor(r.normal(size=(2 * (L + 1), 3, 32, 32)))
        opt2.zero_grad()
        m2(ids, imgs, torch.ones(2, L), CPU).backward()
        opt2.step()
    orig_sd2 = {k: t2n(v) for k, v in m2.state_dict().items()}
    pt2 = tmp_path / "rn" / "epoch-2.pt"
    os.makedirs(pt2.parent)
    torch.save({"model_state_dict": m2.state_dict(),
                "optimizer": opt2.state_dict(),
                "rng_state": torch.get_rng_state(),
                "cuda_rng_state": torch.get_rng_state(),
                "scaler_state": {}}, pt2)
    flags2 = ["--item_tower", "modal", "--modality", "vision",
              "--cv_model_load", "resnet18", "--freeze_paras_before", "0",
              "--embedding_dim", str(D), "--max_seq_len", str(L),
              "--fine_tune_lr", "1e-4", "--fine_tune_l2_weight", "0.02",
              "--lr", "1e-3", "--l2_weight", "0.01"]
    ckpt2 = fwd_tool.main(["--pt", str(pt2)] + flags2)
    pt3 = rev_tool.main(["--ckpt", ckpt2, "--out",
                         str(tmp_path / "rn_back") + os.sep] + flags2,
                        net_template_sd=rnet.state_dict())
    back2 = {k: t2n(v) for k, v in torch.load(
        pt3, map_location="cpu",
        weights_only=False)["model_state_dict"].items()}
    assert set(back2) == set(orig_sd2)
    for k in orig_sd2:
        np.testing.assert_array_equal(back2[k], orig_sd2[k], err_msg=k)
    # the trained (updated) running stats really came through
    assert not np.allclose(back2["cv_encoder.image_net.bn1.running_mean"],
                           0.0)
