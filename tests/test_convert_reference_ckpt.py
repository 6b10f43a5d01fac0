"""Reference .pt -> .ckpt converter: executed parity with the reference.

Three layers of evidence:
1. The composed name maps match the reference Models' actual
   named_parameters() (order, shapes, requires_grad) — executed per variant.
2. The converted params tree is structurally identical to our model's own
   init tree (from_state_dict-loadable), and the optimizer param ORDER
   matches the reference's literal group construction
   (inbatch_sasrec_e2e_text/run.py:150-162, vision run.py:120-135).
3. Functional round-trip: torch-train -> reference save_model -> tool CLI
   convert -> our state restores with exact params/moments, and continued
   training TRACKS the torch continuation step for step.

The executed run_test.py orchestrator parity lives in
test_reference_run_test_parity.py (it needs the slow composed-loop setup).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import flax.serialization

from _ref_harness import (REF_ROOT, load_ref_model_class, null_logger,
                          ref_args, t2n)
from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.convert_ref import (
    composed_map, convert_model_state, convert_reference_checkpoint,
    optimizer_ordered_entries)
from idvs.morec_tpu.models.model import make_model

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
L, D, N_ITEMS, N_USERS, T = 8, 16, 40, 24, 8
WORD_DIM = 24


# ------------------------------------------------------------------ helpers
def tiny_hf_bert(seed=1, hidden=128):
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    cfg = HFBertConfig(vocab_size=64, hidden_size=hidden, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=2 * hidden,
                       max_position_embeddings=32, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    return cfg, HFBertModel(cfg)


def tiny_hf_swin(seed=2, embedding_dim=D):
    """HF SwinForImageClassification with the classifier replaced, exactly
    as the reference loads it (inbatch_sasrec_e2e_vision/run.py:47-54)."""
    from torch import nn
    from torch.nn.init import constant_, xavier_normal_
    from transformers import SwinConfig as HFSwinConfig
    from transformers import SwinForImageClassification
    cfg = HFSwinConfig(image_size=32, patch_size=4, num_channels=3,
                       embed_dim=16, depths=[2, 2], num_heads=[2, 4],
                       window_size=4, mlp_ratio=2.0, drop_path_rate=0.0,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    net = SwinForImageClassification(cfg)
    num_fc_ftr = net.classifier.in_features
    net.classifier = nn.Linear(num_fc_ftr, embedding_dim)
    xavier_normal_(net.classifier.weight.data)
    constant_(net.classifier.bias.data, 0)
    return cfg, net


def apply_text_freeze(bert, freeze_before, pooler_para=(37, 38)):
    """run.py:73-75: index < freeze_paras_before or pooler -> frozen."""
    for idx, (_n, p) in enumerate(bert.named_parameters()):
        if idx < freeze_before or idx in pooler_para:
            p.requires_grad = False


def assert_map_matches(ref_model, cfg):
    """Names, order, requires_grad, and shapes of the composed map equal the
    reference model's named_parameters()."""
    sd = {k: t2n(v) for k, v in ref_model.state_dict().items()}
    cmap = composed_map(cfg, sd)
    ref_named = [(n, tuple(p.shape), p.requires_grad)
                 for n, p in ref_model.named_parameters()]
    got = [(e.torch_name, tuple(sd[e.torch_name].shape), e.requires_grad)
           for e in cmap.entries]
    assert got == ref_named
    return sd, cmap


def ref_group_order(ref_model, modality):
    """The reference's literal optimizer construction
    (text run.py:150-162 / vision run.py:120-135)."""
    ft, rs = [], []
    for name, p in ref_model.named_parameters():
        if not p.requires_grad:
            continue
        if modality == "text":
            is_ft = "bert_model" in name
        else:
            is_ft = ("image_net" in name
                     and "fc" not in name and "classifier" not in name)
        (ft if is_ft else rs).append(name)
    return ft + rs


def tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.asarray(v).shape)
    return out


def assert_loads_into(model, cfg, params, stats, content):
    """Converted tree must match our model's own init tree leaf-for-leaf
    (that is what from_state_dict requires on checkpoint load)."""
    ids = jnp.ones((2, cfg.seq_len_total), jnp.int32)
    lm = jnp.ones((2, cfg.max_seq_len), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0),
                       "masking": jax.random.PRNGKey(1)}, ids, content, lm)
    want = tree_shapes(flax.serialization.to_state_dict(init["params"]))
    got = tree_shapes(params)
    assert got == want, (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    if "batch_stats" in init:
        assert stats is not None
        assert tree_shapes(flax.serialization.to_state_dict(
            init["batch_stats"])) == tree_shapes(stats)


# --------------------------------------------------- per-variant map parity
def test_map_inbatch_text_id():
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "cvtmap_id")
    torch.manual_seed(0)
    m = RefModel(ref_args(L=L, D=D), N_ITEMS, False, None,
                 np.ones(N_ITEMS + 1))
    cfg = Config(item_tower="id", embedding_dim=D, max_seq_len=L,
                 num_attention_heads=2, transformer_block=2)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == [n for n, _ in m.named_parameters()]
    params, stats = convert_model_state(sd, cmap)
    model = make_model(cfg, item_num=N_ITEMS)
    assert_loads_into(model, cfg, params, stats, None)


def test_map_inbatch_text_modal_frozen():
    hf_cfg, bert = tiny_hf_bert()
    FREEZE = 5
    apply_text_freeze(bert, FREEZE)
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "cvtmap_mo")
    args = ref_args(L=L, D=D, num_words_title=T, word_embedding_dim=128)
    torch.manual_seed(3)
    m = RefModel(args, N_ITEMS, True, bert, np.ones(N_ITEMS + 1))
    cfg = Config(item_tower="modal", modality="text", embedding_dim=D,
                 max_seq_len=L, num_attention_heads=2, transformer_block=2,
                 num_words_title=T, word_embedding_dim=128,
                 bert_model_load="bert-tiny", freeze_paras_before=FREEZE)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == ref_group_order(m, "text")
    params, stats = convert_model_state(sd, cmap)
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.text_tower import TextTower
    tower = TextTower(net=BertModel(BertConfig.from_hf(hf_cfg)),
                      embedding_dim=D, word_embedding_dim=128,
                      pooling="cls", attr_lengths=(T,))
    model = make_model(cfg, item_num=N_ITEMS, encoder=tower)
    content = jnp.concatenate(
        [jnp.ones((2 * cfg.seq_len_total, T), jnp.int32),
         jnp.ones((2 * cfg.seq_len_total, T), jnp.int32)], axis=1)
    assert_loads_into(model, cfg, params, stats, content)
    # converted bert weights equal the HF originals through the existing
    # (exact-output-tested) converter path
    np.testing.assert_allclose(
        params["encoder"]["net"]["word_embeddings"]["embedding"],
        t2n(bert.embeddings.word_embeddings.weight))


def test_map_dssm_both_towers():
    RefModel = load_ref_model_class("bce_text/main-end2end(DSSM)", "cvtmap_ds")
    args = ref_args(L=L, D=D, dnn_layers=2, neg_num=2,
                    num_words_title=T, word_embedding_dim=128)
    # IDRec DSSM
    torch.manual_seed(4)
    m = RefModel(args, N_USERS, N_ITEMS, False, None)
    cfg = Config(user_tower="dssm", loss="bce", item_tower="id",
                 embedding_dim=D, max_seq_len=L, dnn_layers=2, neg_num=2)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == [n for n, _ in m.named_parameters()]
    params, stats = convert_model_state(sd, cmap)
    model = make_model(cfg, item_num=N_ITEMS, user_num=N_USERS)
    assert_loads_into(model, cfg, params, stats, None)

    # modal DSSM (text)
    hf_cfg, bert = tiny_hf_bert(seed=5)
    apply_text_freeze(bert, 3)
    torch.manual_seed(6)
    m2 = RefModel(args, N_USERS, N_ITEMS, True, bert)
    cfg2 = Config(user_tower="dssm", loss="bce", item_tower="modal",
                  modality="text", embedding_dim=D, max_seq_len=L,
                  dnn_layers=2, neg_num=2, num_words_title=T,
                  word_embedding_dim=128, bert_model_load="bert-tiny",
                  freeze_paras_before=3)
    sd2, cmap2 = assert_map_matches(m2, cfg2)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg2, cmap2)] \
        == ref_group_order(m2, "text")


def test_map_two_stage():
    RefModel = load_ref_model_class("bce_text/main-2stage(SASRec)",
                                    "cvtmap_2s")
    args = ref_args(L=L, D=D, dnn_layer=2, word_embedding_dim=WORD_DIM)
    torch.manual_seed(7)
    m = RefModel(args, N_ITEMS)
    cfg = Config(item_tower="modal", stage="two_stage", loss="bce",
                 embedding_dim=D, max_seq_len=L, dnn_layers=2,
                 word_embedding_dim=WORD_DIM)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == [n for n, _ in m.named_parameters()]
    params, stats = convert_model_state(sd, cmap)
    model = make_model(cfg, item_num=N_ITEMS)
    content = jnp.ones((2 * cfg.seq_len_total, WORD_DIM), jnp.float32)
    assert_loads_into(model, cfg, params, stats, content)


@pytest.mark.parametrize("tower", ["modal_add", "modal_cat", "modal_cat_3"])
def test_map_id_plus_mo_end2end(tower):
    hf_cfg, bert = tiny_hf_bert(seed=8)
    # the reference size table always freezes the pooler (run.py:55-75; an
    # unmatched model name would NameError in its own freeze loop)
    apply_text_freeze(bert, 0)
    RefModel = load_ref_model_class("bce_text/id_plus_mo-end2end",
                                    f"cvtmap_imo_{tower}")
    args = ref_args(L=L, D=D, item_tower=tower, num_words_title=T,
                    word_embedding_dim=128)
    torch.manual_seed(9)
    m = RefModel(args, N_ITEMS, True, bert)
    cat_layers = {"modal_add": 1, "modal_cat": 1, "modal_cat_3": 3}[tower]
    our_tower = ("modal_id_add" if tower == "modal_add" else "modal_id_cat")
    cfg = Config(item_tower=our_tower, cat_layers=cat_layers, loss="bce",
                 modality="text", embedding_dim=D, max_seq_len=L,
                 num_words_title=T, word_embedding_dim=128,
                 bert_model_load="bert-tiny", freeze_paras_before=0)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == ref_group_order(m, "text")


@pytest.mark.parametrize("tower,mo,dnn", [("modal_add", 2, 2),
                                          ("modal_cat", 2, 0)])
def test_map_id_plus_mo_two_stage(tower, mo, dnn):
    RefModel = load_ref_model_class("bce_text/id_plus_mo-2stage",
                                    f"cvtmap_imo2s_{tower}")
    args = ref_args(L=L, D=D, item_tower=tower, mo_dnn_layers=mo,
                    dnn_layers=dnn, word_embedding_dim=WORD_DIM)
    torch.manual_seed(10)
    m = RefModel(args, N_ITEMS, True, None)
    our_tower = ("modal_id_add" if "add" in tower else "modal_id_cat")
    cfg = Config(item_tower=our_tower, stage="two_stage", loss="bce",
                 embedding_dim=D, max_seq_len=L, mo_dnn_layers=mo,
                 dnn_layers=dnn, word_embedding_dim=WORD_DIM)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == [n for n, _ in m.named_parameters()]
    params, stats = convert_model_state(sd, cmap)
    model = make_model(cfg, item_num=N_ITEMS)
    content = jnp.ones((2 * cfg.seq_len_total, WORD_DIM), jnp.float32)
    assert_loads_into(model, cfg, params, stats, content)


def test_map_vision_swin():
    hf_cfg, net = tiny_hf_swin()
    FREEZE = 4
    for idx, (_n, p) in enumerate(net.named_parameters()):
        if idx < FREEZE:
            p.requires_grad = False
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_vision", "cvtmap_sw")
    args = ref_args(L=L, D=D, CV_model_load="swin_tiny")
    torch.manual_seed(11)
    m = RefModel(args, N_ITEMS, True, net, np.ones(N_ITEMS + 1))
    cfg = Config(item_tower="modal", modality="vision", embedding_dim=D,
                 max_seq_len=L, cv_model_load="swin_tiny",
                 freeze_paras_before=FREEZE)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == ref_group_order(m, "vision")
    params, stats = convert_model_state(sd, cmap)
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel
    from idvs.morec_tpu.models.vision_tower import VisionTower
    scfg = SwinConfig.from_hf(hf_cfg)
    tower = VisionTower(net=SwinModel(scfg), kind="swin", embedding_dim=D,
                        feature_dim=scfg.num_features)
    model = make_model(cfg, item_num=N_ITEMS, encoder=tower)
    content = jnp.zeros((2 * cfg.seq_len_total, 32, 32, 3), jnp.float32)
    assert_loads_into(model, cfg, params, stats, content)
    np.testing.assert_allclose(
        params["encoder"]["classifier"]["kernel"],
        t2n(net.classifier.weight).T)


def test_map_vision_mae():
    from transformers import ViTMAEConfig as HFMAEConfig, ViTMAEModel
    hf_cfg = HFMAEConfig(image_size=32, patch_size=8, num_channels=3,
                         hidden_size=WORD_DIM, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=48,
                         hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0)
    torch.manual_seed(12)
    net = ViTMAEModel(hf_cfg)
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_vision", "cvtmap_mae")
    args = ref_args(L=L, D=D, CV_model_load="vit_mae_base")
    torch.manual_seed(13)
    m = RefModel(args, N_ITEMS, True, net, np.ones(N_ITEMS + 1))
    cfg = Config(item_tower="modal", modality="vision", embedding_dim=D,
                 max_seq_len=L, cv_model_load="vit_mae",
                 freeze_paras_before=0)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == ref_group_order(m, "vision")
    # HF fixes position_embeddings (requires_grad=False) — never in the
    # optimizer even unfrozen
    assert not [e for e in optimizer_ordered_entries(cfg, cmap)
                if "position_embeddings" in e.torch_name]


# ---------------------------------------------- functional round-trip (CLI)
def _write_ref_pt(tmp_path, model, opt, tag):
    """Save through the reference's own save_model (data_utils/utils.py:
    107-114) so the .pt layout is the genuine artifact."""
    from _ref_harness import load_ref_package

    class _Mod:   # save_model reads model.module (DDP), utils.py:109
        def __init__(self, m):
            self.module = m

    load_ref_package("inbatch_sasrec_e2e_text", "data_utils", tag)
    utils_mod = sys.modules[f"_refpkg_data_utils_{tag}.utils"]

    class _Scaler:
        def state_dict(self):
            return {}

    utils_mod.save_model(3, _Mod(model), str(tmp_path), opt,
                         torch.get_rng_state(), torch.get_rng_state(),
                         _Scaler(), null_logger())
    path = os.path.join(str(tmp_path), "epoch-3.pt")
    assert os.path.exists(path)
    return path


def test_idrec_cli_roundtrip_resume_tracks_torch(tmp_path):
    """torch-train IDRec -> reference save_model .pt -> tool CLI -> our
    TrainState: params + AdamW moments restore exactly, and 3 further steps
    track the torch continuation losses."""
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "cvtrt_id")
    rng = np.random.default_rng(20)
    pop = rng.uniform(0.5, 1.5, N_ITEMS + 1)
    pop[0] = 1.0
    args = ref_args(L=L, D=D, drop_rate=0.0)
    torch.manual_seed(21)
    m = RefModel(args, N_ITEMS, False, None, pop)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-3, weight_decay=0.01)

    def batch(i):
        r = np.random.default_rng(100 + i)
        ids = r.integers(1, N_ITEMS + 1, size=(4, L + 1))
        lm = np.ones((4, L), np.float32)
        return ids, lm

    for i in range(5):
        ids, lm = batch(i)
        opt.zero_grad()
        loss = m(torch.LongTensor(ids).reshape(-1),
                 torch.LongTensor(ids).reshape(-1), torch.FloatTensor(lm),
                 CPU)
        loss.backward()
        opt.step()
    pt_path = _write_ref_pt(tmp_path, m, opt, "cvtrt_id")

    # --- CLI conversion
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_reference_ckpt as tool
    out = tool.main(["--pt", pt_path, "--out", str(tmp_path),
                     "--item_tower", "id", "--embedding_dim", str(D),
                     "--max_seq_len", str(L), "--num_attention_heads", "2",
                     "--transformer_block", "2", "--drop_rate", "0.0"])
    assert out.endswith("epoch-3.ckpt")

    # --- restore into our TrainState via the standard loader
    from idvs.morec_tpu.train.checkpoint import load_checkpoint
    from idvs.morec_tpu.train.state import TrainState, make_optimizer

    cfg = Config(item_tower="id", embedding_dim=D, max_seq_len=L,
                 num_attention_heads=2, transformer_block=2, drop_rate=0.0,
                 compute_dtype="float32", lr=1e-3, l2_weight=0.01)
    model = make_model(cfg, item_num=N_ITEMS)
    ids0 = jnp.ones((2, L + 1), jnp.int32)
    lm0 = jnp.ones((2, L), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "masking": jax.random.PRNGKey(1)},
                           ids0, None, lm0)
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables,
                       opt_state=tx.init(variables["params"]),
                       dropout_rng=jax.random.PRNGKey(0))
    state, payload = load_checkpoint(out, state)
    assert payload["epoch"] == 3 and int(state.step) == 5

    # params exact
    np.testing.assert_array_equal(
        np.asarray(state.params["params"]["id_embedding"]["embedding"]),
        t2n(m.id_embedding.weight))
    # moments exact (spot: block_1 w_2 kernel)
    st = opt.state_dict()["state"]
    names = [n for n, _ in m.named_parameters()]
    pos = names.index(
        "user_encoder.transformer_encoder.transformer_blocks.1."
        "feed_forward.w_2.weight")
    mu = state.opt_state[0].mu
    np.testing.assert_array_equal(
        np.asarray(mu["user_encoder"]["block_1"]["w_2"]["kernel"]),
        st[pos]["exp_avg"].numpy().T)
    assert int(state.opt_state[0].count) == 5

    # --- continued training tracks torch step for step
    from idvs.morec_tpu.ops.losses import inbatch_debiased_ce

    log_pop = jnp.asarray(np.log(pop), jnp.float32)

    @jax.jit
    def train_step(state, ids, lm):
        def loss_fn(p):
            flat = ids.reshape(-1)
            embs = model.apply(p, flat, method="item_embs")
            B = ids.shape[0]
            seq = embs.reshape(B, L + 1, D)
            prec = model.apply(p, seq[:, :-1, :], lm,
                               method="user_states")
            return inbatch_debiased_ce(prec, seq, ids, lm, log_pop[ids])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(
            {"params": grads["params"]}["params"],
            state.opt_state, state.params["params"])
        import optax
        new_params = dict(state.params)
        new_params["params"] = optax.apply_updates(state.params["params"],
                                                   updates)
        return state.replace(params=new_params, opt_state=opt_state,
                             step=state.step + 1), loss

    for i in range(5, 8):
        ids, lm = batch(i)
        tids = torch.LongTensor(ids)
        opt.zero_grad()
        tloss = m(tids.reshape(-1), tids.reshape(-1), torch.FloatTensor(lm),
                  CPU)
        tloss.backward()
        opt.step()
        state, jloss = train_step(state, jnp.asarray(ids),
                                  jnp.asarray(lm))
        np.testing.assert_allclose(float(jloss), float(tloss),
                                   rtol=2e-4, atol=2e-4)
    # trajectories stayed together through 3 post-restore steps
    np.testing.assert_allclose(
        np.asarray(state.params["params"]["id_embedding"]["embedding"]),
        t2n(m.id_embedding.weight), rtol=5e-4, atol=5e-5)


def test_map_vision_resnet():
    """ResNet map executed against a torch module with torchvision's exact
    structure/state-dict keys (torchvision itself is absent in this image —
    same replica the resnet parity tests use), fc already replaced per
    run.py:42-46. Covers batch_stats conversion + the vision fc grouping
    exception."""
    from test_resnet import TorchResNet18

    torch.manual_seed(14)
    net = TorchResNet18(out_dim=D)
    FREEZE = 6
    for idx, (_n, p) in enumerate(net.named_parameters()):
        if idx < FREEZE:
            p.requires_grad = False
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_vision", "cvtmap_rn")
    args = ref_args(L=L, D=D, CV_model_load="resnet18")
    torch.manual_seed(15)
    m = RefModel(args, N_ITEMS, True, net, np.ones(N_ITEMS + 1))
    cfg = Config(item_tower="modal", modality="vision", embedding_dim=D,
                 max_seq_len=L, cv_model_load="resnet18",
                 freeze_paras_before=FREEZE)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == ref_group_order(m, "vision")
    params, stats = convert_model_state(sd, cmap)
    assert stats is not None   # BN running stats -> batch_stats
    from idvs.morec_tpu.models.resnet import ResNet
    from idvs.morec_tpu.models.vision_tower import VisionTower
    tower = VisionTower(net=ResNet(arch="resnet18", out_dim=D),
                        kind="resnet", embedding_dim=D, feature_dim=D)
    model = make_model(cfg, item_num=N_ITEMS, encoder=tower)
    content = jnp.zeros((2 * cfg.seq_len_total, 32, 32, 3), jnp.float32)
    assert_loads_into(model, cfg, params, stats, content)
    np.testing.assert_allclose(
        stats["encoder"]["net"]["bn1"]["mean"],
        t2n(net.bn1.running_mean))


def test_map_text_roberta_and_opt():
    """RoBERTa shares BERT's module structure (run.py:29-41); OPT has its
    own order map and no pooler. Both executed vs the real HF modules."""
    from transformers import (OPTConfig as HFOPTConfig, OPTModel,
                              RobertaConfig as HFRobertaConfig, RobertaModel)

    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "cvtmap_rbo")

    rcfg = HFRobertaConfig(vocab_size=64, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=40,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    torch.manual_seed(16)
    roberta = RobertaModel(rcfg)
    apply_text_freeze(roberta, 3, pooler_para=(37, 38))
    args = ref_args(L=L, D=D, num_words_title=T, word_embedding_dim=32)
    torch.manual_seed(17)
    m = RefModel(args, N_ITEMS, True, roberta, np.ones(N_ITEMS + 1))
    cfg = Config(item_tower="modal", modality="text", embedding_dim=D,
                 max_seq_len=L, num_words_title=T, word_embedding_dim=32,
                 bert_model_load="roberta-base", freeze_paras_before=3)
    _, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == ref_group_order(m, "text")

    ocfg = HFOPTConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, ffn_dim=64,
                       max_position_embeddings=40, dropout=0.0,
                       attention_dropout=0.0)
    torch.manual_seed(18)
    opt_net = OPTModel(ocfg)
    for idx, (_n, p) in enumerate(opt_net.named_parameters()):
        if idx < 4:     # pooler_para = [] for OPT (run.py:42-47)
            p.requires_grad = False
    torch.manual_seed(19)
    m2 = RefModel(args, N_ITEMS, True, opt_net, np.ones(N_ITEMS + 1))
    cfg2 = Config(item_tower="modal", modality="text", embedding_dim=D,
                  max_seq_len=L, num_words_title=T, word_embedding_dim=32,
                  bert_model_load="opt-125m", freeze_paras_before=4)
    _, cmap2 = assert_map_matches(m2, cfg2)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg2, cmap2)] \
        == ref_group_order(m2, "text")


def test_map_vision_two_stage_dirs():
    """The two vision 2stage Model variants (bce_vision/main-2stage and
    bce_vision/id_plus_mo-2stage) — no encoder in the model, num_fc_ftr
    plays word_embedding_dim's role."""
    RefModel = load_ref_model_class("bce_vision/main-2stage(SASRec)",
                                    "cvtmap_v2s")
    args = ref_args(L=L, D=D, dnn_layer=2)
    torch.manual_seed(20)
    m = RefModel(args, N_ITEMS, WORD_DIM)
    cfg = Config(item_tower="modal", stage="two_stage", loss="bce",
                 modality="vision", embedding_dim=D, max_seq_len=L,
                 dnn_layers=2, word_embedding_dim=WORD_DIM)
    assert_map_matches(m, cfg)

    RefModel2 = load_ref_model_class("bce_vision/id_plus_mo-2stage",
                                     "cvtmap_vimo2s")
    args2 = ref_args(L=L, D=D, item_tower="modal_cat", mo_dnn_layers=8,
                     dnn_layers=0)
    torch.manual_seed(21)
    m2 = RefModel2(args2, N_ITEMS, WORD_DIM, True)
    cfg2 = Config(item_tower="modal_id_cat", stage="two_stage", loss="bce",
                  modality="vision", embedding_dim=D, max_seq_len=L,
                  mo_dnn_layers=8, dnn_layers=0,
                  word_embedding_dim=WORD_DIM)
    assert_map_matches(m2, cfg2)


def test_vision_swin_cli_roundtrip(tmp_path):
    """Vision end2end (tiny HF Swin, replaced classifier, vision two-group
    AdamW with the fc/classifier exception): torch-train -> reference
    save_model -> CLI -> our template. Params AND moments land exactly
    through the conv-layout/qkv transforms, and the converted tower
    produces the same item embeddings as the torch model."""
    hf_cfg, net = tiny_hf_swin(seed=30)
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_vision", "cvtrt_sw")
    args = ref_args(L=L, D=D, CV_model_load="swin_tiny", drop_rate=0.0)
    rng = np.random.default_rng(31)
    pop = np.ones(N_ITEMS + 1)
    torch.manual_seed(32)
    m = RefModel(args, N_ITEMS, True, net, pop)
    m.train()
    image_net_params, recsys_params = [], []
    for name, p in m.named_parameters():
        if p.requires_grad:
            if ("image_net" in name and "fc" not in name
                    and "classifier" not in name):
                image_net_params.append(p)
            else:
                recsys_params.append(p)
    opt = torch.optim.AdamW([
        {"params": image_net_params, "lr": 1e-4, "weight_decay": 0.02},
        {"params": recsys_params, "lr": 1e-3, "weight_decay": 0.01}])
    B = 2
    for i in range(2):
        r = np.random.default_rng(200 + i)
        ids = r.integers(1, N_ITEMS + 1, size=(B, L + 1))
        imgs = r.normal(size=(B * (L + 1), 3, 32, 32)).astype(np.float32)
        lm = np.ones((B, L), np.float32)
        opt.zero_grad()
        loss = m(torch.LongTensor(ids).reshape(-1),
                 torch.FloatTensor(imgs), torch.FloatTensor(lm), CPU)
        loss.backward()
        opt.step()
    pt_path = _write_ref_pt(tmp_path, m, opt, "cvtrt_sw")

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_reference_ckpt as tool
    out = tool.main(["--pt", pt_path, "--out", str(tmp_path),
                     "--item_tower", "modal", "--modality", "vision",
                     "--cv_model_load", "swin_tiny",
                     "--freeze_paras_before", "0",
                     "--embedding_dim", str(D), "--max_seq_len", str(L),
                     "--drop_rate", "0.0"])

    import flax.serialization as fs
    with open(out, "rb") as f:
        payload = fs.msgpack_restore(f.read())
    params = payload["params"]["params"]

    # moment spot-check through the swin transforms: group-0 position 0 is
    # the patch projection conv (OIHW -> HWIO)
    st = opt.state_dict()["state"]
    exp = st[0]["exp_avg"].numpy().transpose(2, 3, 1, 0)
    enc_inner = payload["opt_state"]["inner_states"]["encoder"]["inner_state"]
    np.testing.assert_allclose(
        enc_inner["0"]["mu"]["encoder"]["net"]["patch_projection"]["kernel"],
        exp, rtol=0, atol=0)
    # classifier (recsys group, inside image_net): moments present there
    rs_inner = payload["opt_state"]["inner_states"]["recsys"]["inner_state"]
    rs_names = ref_group_order(m, "vision")[len(image_net_params):]
    cpos = rs_names.index("cv_encoder.image_net.classifier.weight")
    np.testing.assert_allclose(
        rs_inner["0"]["mu"]["encoder"]["classifier"]["kernel"],
        st[len(image_net_params) + cpos]["exp_avg"].numpy().T)

    # the converted tower reproduces the torch model's item embeddings
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel
    from idvs.morec_tpu.models.vision_tower import VisionTower
    scfg = SwinConfig.from_hf(hf_cfg)
    tower = VisionTower(net=SwinModel(scfg), kind="swin", embedding_dim=D,
                        feature_dim=scfg.num_features)
    model = make_model(Config(item_tower="modal", modality="vision",
                              embedding_dim=D, max_seq_len=L,
                              cv_model_load="swin_tiny",
                              compute_dtype="float32"),
                       item_num=N_ITEMS, encoder=tower)
    r = np.random.default_rng(9)
    probe = r.normal(size=(4, 3, 32, 32)).astype(np.float32)
    m.eval()
    with torch.no_grad():
        want = t2n(m.cv_encoder(torch.FloatTensor(probe)))
    got = model.apply({"params": params}, jnp.arange(1, 5, dtype=jnp.int32),
                      jnp.asarray(probe.transpose(0, 2, 3, 1)),
                      method="item_embs")
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-5, atol=5e-5)


def test_cli_directory_mode(tmp_path):
    """--pt <dir> converts every epoch-N.pt in the directory (the
    reference's cpt_<hparams>/ layout, utils.py:107-114)."""
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "cvtdir")
    torch.manual_seed(40)
    m = RefModel(ref_args(L=L, D=D), N_ITEMS, False, None,
                 np.ones(N_ITEMS + 1))
    opt = torch.optim.AdamW(m.parameters(), lr=1e-3)
    from _ref_harness import load_ref_package
    load_ref_package("inbatch_sasrec_e2e_text", "data_utils", "cvtdir")
    utils_mod = sys.modules["_refpkg_data_utils_cvtdir.utils"]

    class _Mod:
        def __init__(self, m):
            self.module = m

    class _Scaler:
        def state_dict(self):
            return {}

    for ep in (1, 3):
        utils_mod.save_model(ep, _Mod(m), str(tmp_path), opt,
                             torch.get_rng_state(), torch.get_rng_state(),
                             _Scaler(), null_logger())
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_reference_ckpt as tool
    last = tool.main(["--pt", str(tmp_path),
                      "--item_tower", "id", "--embedding_dim", str(D),
                      "--max_seq_len", str(L), "--num_attention_heads", "2",
                      "--transformer_block", "2"])
    assert last.endswith("epoch-3.ckpt")
    assert os.path.exists(os.path.join(str(tmp_path), "epoch-1.ckpt"))
    assert os.path.exists(os.path.join(str(tmp_path), "epoch-3.ckpt"))


def test_dssm_cli_roundtrip(tmp_path):
    """DSSM IDRec (user_embedding + MLPs, plain AdamW): .pt -> CLI -> exact
    params + moments in our template (user_num/item_num come from the
    checkpoint tensors, not flags)."""
    RefModel = load_ref_model_class("bce_text/main-end2end(DSSM)", "cvtrt_ds")
    args = ref_args(L=L, D=D, dnn_layers=2, neg_num=2)
    torch.manual_seed(50)
    m = RefModel(args, N_USERS, N_ITEMS, False, None)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-3, weight_decay=0.01)
    r = np.random.default_rng(51)
    for i in range(3):
        users = torch.LongTensor(r.integers(1, N_USERS + 1, size=(6,)))
        items = torch.LongTensor(r.integers(1, N_ITEMS + 1, size=(6 * 3,)))
        labels = torch.FloatTensor(
            np.tile([1.0, 0.0, 0.0], 6).reshape(6, 3))
        opt.zero_grad()
        loss = m(users, items, labels)
        loss.backward()
        opt.step()
    pt_path = _write_ref_pt(tmp_path, m, opt, "cvtrt_ds")

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_reference_ckpt as tool
    out = tool.main(["--pt", pt_path, "--out", str(tmp_path),
                     "--user_tower", "dssm", "--loss", "bce",
                     "--item_tower", "id", "--embedding_dim", str(D),
                     "--max_seq_len", str(L), "--dnn_layers", "2",
                     "--neg_num", "2"])

    import flax.serialization as fs
    with open(out, "rb") as f:
        payload = fs.msgpack_restore(f.read())
    p = payload["params"]["params"]
    np.testing.assert_array_equal(p["user_embedding"]["embedding"],
                                  t2n(m.user_embedding.weight))
    np.testing.assert_array_equal(p["id_embedding"]["embedding"],
                                  t2n(m.id_embedding.weight))
    np.testing.assert_array_equal(
        p["user_mlp"]["mlp"]["Dense_0"]["kernel"],
        t2n(m.user_encoder.MLP.mlp_layers[1].weight).T)
    # single-group moments: index 0 = user_embedding
    st = opt.state_dict()["state"]
    np.testing.assert_array_equal(
        payload["opt_state"]["0"]["mu"]["user_embedding"]["embedding"],
        st[0]["exp_avg"].numpy())
    # structure loads into our DSSM template
    cfg = Config(user_tower="dssm", loss="bce", item_tower="id",
                 embedding_dim=D, max_seq_len=L, dnn_layers=2, neg_num=2)
    model = make_model(cfg, item_num=N_ITEMS, user_num=N_USERS)
    assert_loads_into(model, cfg, p, None, None)


def test_map_dssm_vision_modal():
    """DSSM + vision encoder (bce_vision/main-end2end(DSSM)/model/model.py:
    7-43, Vit_Encoder branch): user_embedding + MLP registered before the
    cv tower; the vision grouping rule applies (its run.py:128-143)."""
    hf_cfg, net = tiny_hf_swin(seed=60)
    FREEZE = 3
    for idx, (_n, p) in enumerate(net.named_parameters()):
        if idx < FREEZE:
            p.requires_grad = False
    RefModel = load_ref_model_class("bce_vision/main-end2end(DSSM)",
                                    "cvtmap_dsv")
    args = ref_args(L=L, D=D, dnn_layers=2, neg_num=2,
                    CV_model_load="swin_tiny")
    torch.manual_seed(61)
    m = RefModel(args, N_USERS, N_ITEMS, True, net)
    cfg = Config(user_tower="dssm", loss="bce", item_tower="modal",
                 modality="vision", embedding_dim=D, max_seq_len=L,
                 dnn_layers=2, neg_num=2, cv_model_load="swin_tiny",
                 freeze_paras_before=FREEZE)
    sd, cmap = assert_map_matches(m, cfg)
    assert [e.torch_name for e in optimizer_ordered_entries(cfg, cmap)] \
        == ref_group_order(m, "vision")
    params, _ = convert_model_state(sd, cmap)
    np.testing.assert_allclose(params["encoder"]["classifier"]["kernel"],
                               t2n(net.classifier.weight).T)


def test_converter_rejects_mismatched_optimizer(tmp_path):
    """Clear errors instead of silent mis-mapping: (a) wrong flags for the
    checkpoint's geometry (count mismatch), (b) a non-reference param-group
    split with the right total (structure mismatch — would scramble moment
    indices)."""
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "cvt_rej")
    torch.manual_seed(55)
    m = RefModel(ref_args(L=L, D=D), N_ITEMS, False, None,
                 np.ones(N_ITEMS + 1))
    opt = torch.optim.AdamW(m.parameters(), lr=1e-3)
    ids = torch.LongTensor(
        np.random.default_rng(0).integers(1, N_ITEMS + 1,
                                          size=(4 * (L + 1),)))
    opt.zero_grad()
    m(ids, ids, torch.ones(4, L), CPU).backward()
    opt.step()
    payload = {"model_state_dict": m.state_dict(),
               "optimizer": opt.state_dict(),
               "rng_state": torch.get_rng_state(),
               "cuda_rng_state": None, "scaler_state": {}}

    # (a) wrong transformer_block -> the composed map can't find tensors
    cfg_wrong = Config(item_tower="id", embedding_dim=D, max_seq_len=L,
                       num_attention_heads=2, transformer_block=3)
    with pytest.raises((KeyError, ValueError)):
        convert_reference_checkpoint(payload, cfg_wrong, epoch=1)

    # (b) right tensors, NON-reference group split (two groups for IDRec)
    params = list(m.parameters())
    opt2 = torch.optim.AdamW([
        {"params": params[:3], "lr": 1e-3},
        {"params": params[3:], "lr": 1e-3}])
    opt2.zero_grad()
    m(ids, ids, torch.ones(4, L), CPU).backward()
    opt2.step()
    payload2 = dict(payload, optimizer=opt2.state_dict())
    cfg = Config(item_tower="id", embedding_dim=D, max_seq_len=L,
                 num_attention_heads=2, transformer_block=2)
    with pytest.raises(ValueError, match="param_groups sizes"):
        convert_reference_checkpoint(payload2, cfg, epoch=1)
