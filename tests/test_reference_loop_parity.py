"""Executable COMPOSED-LOOP parity vs the reference's own run.py.

Runs the reference's actual train() orchestrator (inbatch_sasrec_e2e_text/
run.py:26-314: preprocess -> dataset -> DDP(model) -> AdamW -> epoch loop ->
run_eval -> save-best -> early-stop bookkeeping) end-to-end on CPU — with
only environment shims (single-rank gloo, DDP passthrough, no-op GradScaler/
autocast) — against our Trainer.train() on the same synthetic MIND-format
TSVs, identical transferred initial weights, and the reference's own
DistributedSampler batch order (injected via TrainBatcher.perm_fn).

Asserts: the per-epoch valid Hit@10 SEQUENCE is identical, hence the same
save-best epochs and the same early-stop counters (run.py:281-304).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (REF_ROOT, ensure_single_rank_group, load_ref_run,
                          load_ref_model_class, null_logger, patch_cuda_free,
                          ref_args, sasrec_params_from_torch, t2n)
from idvs.morec_tpu.config import Config
from idvs.morec_tpu.parallel.mesh import make_mesh, replicate
from idvs.morec_tpu.train.runner import Trainer

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
N_USERS, N_ITEMS, L, D, BS, EPOCHS = 24, 40, 8, 16, 8, 4
SEED_MODEL = 77


def write_tsvs(tmp_path, rng):
    """Synthetic MIND-format news/behaviors TSVs (3-col news for read_news,
    'user<TAB>space-separated item names' behaviors, preprocess.py:14-27)."""
    data_dir = tmp_path / "synth"
    data_dir.mkdir(exist_ok=True)
    with open(data_dir / "news.tsv", "w") as f:
        for j in range(1, N_ITEMS + 1):
            f.write(f"n{j}\titem {j} title\tabstract {j}\n")
    with open(data_dir / "behaviors.tsv", "w") as f:
        for u in range(N_USERS):
            n = int(rng.integers(5, L + 3 + 1))
            seq = rng.integers(1, N_ITEMS + 1, size=n)
            f.write(f"u{u}\t" + " ".join(f"n{j}" for j in seq) + "\n")
    return str(tmp_path)


def torch_sampler_perm(epoch: int) -> np.ndarray:
    """torch DistributedSampler order at world_size=1: randperm seeded
    seed(0) + epoch (torch/utils/data/distributed.py set_epoch semantics)."""
    g = torch.Generator()
    g.manual_seed(epoch)
    return torch.randperm(N_USERS, generator=g).numpy()


def ref_loop_args(root, **over):
    a = ref_args(L=L, D=D, HEADS=2, BLOCKS=2)
    a.root_data_dir = root
    a.dataset = "synth"
    a.news = "news.tsv"
    a.behaviors = "behaviors.tsv"
    a.min_seq_len = 5
    a.batch_size = BS
    a.num_workers = 0
    a.load_ckpt_name = "None"
    a.epoch = EPOCHS
    a.lr = 1e-3
    a.l2_weight = 0.01
    a.fine_tune_lr = 5e-4
    a.fine_tune_l2_weight = 0.02
    a.logging_num = 1
    a.testing_num = 1
    a.label_screen = "x"
    a.mode = "train"
    for k, v in over.items():
        setattr(a, k, v)
    return a


def our_cfg(root, **over):
    base = dict(item_tower="id", loss="inbatch_ce", mode="train",
                root_data_dir=root, dataset="synth", news="news.tsv",
                behaviors="behaviors.tsv", max_seq_len=L, min_seq_len=5,
                batch_size=BS, epoch=EPOCHS, lr=1e-3, l2_weight=0.01,
                fine_tune_lr=5e-4, fine_tune_l2_weight=0.02,
                embedding_dim=D, num_attention_heads=2, transformer_block=2,
                drop_rate=0.0, compute_dtype="float32", logging_num=1,
                testing_num=1, label_screen="x", seed=12345)
    base.update(over)
    return Config(**base)


def run_ours(cfg, transfer_fn, tmp_path, monkeypatch):
    """Build a Trainer, inject reference-initialized weights + the reference
    sampler order, train, and return (per-epoch hits, max_hit, max_epoch)."""
    monkeypatch.chdir(tmp_path)   # checkpoints under tmp (cfg.model_dir is cwd-relative)
    mesh = make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, log_file=null_logger("ours_loop"), mesh=mesh)
    tr.load_data()
    tr.build_model()
    p = jax.device_get(tr.state.params)
    transfer_fn(p, tr)
    tr.state = tr.state.replace(params=replicate(mesh, p))
    tr.batcher.perm_fn = torch_sampler_perm
    hits = []
    real_eval = tr.run_eval

    def spy(users="valid"):
        r = real_eval(users)
        hits.append(float(r[0]))
        return r

    tr.run_eval = spy
    max_hit, max_epoch = tr.train()
    return hits, float(max_hit), int(max_epoch)


def run_reference(run_mod, args, tmp_path, monkeypatch, use_modal=False):
    """Execute the reference train() verbatim; returns per-epoch hits."""
    ensure_single_rank_group()
    patch_cuda_free(monkeypatch, run_mod, str(tmp_path / "ref_ckpt"), args)
    os.makedirs(tmp_path / "ref_ckpt", exist_ok=True)
    hits = []
    real_eval = run_mod.eval_model

    def spy(*a, **k):
        r = real_eval(*a, **k)
        hits.append(float(r))
        return r

    monkeypatch.setattr(run_mod, "eval_model", spy)
    run_mod.train(args, use_modal, CPU)
    return hits


def save_epochs(hits):
    """Epochs (1-based) where the reference's run_eval sets need_save
    (strict improvement over the running max, run.py:293-297)."""
    out, best = [], 0.0
    for i, h in enumerate(hits):
        if h > best:
            best = h
            out.append(i + 1)
    return out


class WordHashTokenizer:
    """Deterministic HF-tokenizer stand-in (same callable contract as
    tokenizer(text, max_length=, padding='max_length', truncation=True)
    used by both preprocess paths). Shared by BOTH sides so the token
    matrices are identical."""

    def __init__(self, vocab_size=64):
        self.vocab_size = vocab_size

    def __call__(self, text, max_length, padding="max_length",
                 truncation=True):
        import zlib
        ids = [2 + (zlib.crc32(w.encode()) % (self.vocab_size - 3))
               for w in text.split()][:max_length]
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        return {"input_ids": ids + [0] * pad,
                "attention_mask": mask + [0] * pad}


def test_composed_loop_modal_save_resume_parity(tmp_path, monkeypatch):
    """Text MoRec composed loop incl. the reference's save-best checkpoints
    (run.py:264-267 writes only for modal runs) and the RESUME path
    (run.py:130-145: load_state_dict + start_epoch from filename + RNG +
    optimizer + scaler restore) — executed verbatim vs Trainer."""
    import types

    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict
    from idvs.morec_tpu.models.text_tower import TextTower
    from idvs.morec_tpu.models import encoders_zoo

    rng = np.random.default_rng(43)
    root = write_tsvs(tmp_path, rng)
    run_mod = load_ref_run("inbatch_sasrec_e2e_text", "loop_modal")
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text",
                                    "loop_modal_snap")
    tok = WordHashTokenizer()
    T = 8
    # bert-tiny GEOMETRY (2 layers, hidden 128) so run.py's name-keyed side
    # table (pooler [37,38], word_embedding_dim 128, run.py:55-57) is correct
    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=256,
                          max_position_embeddings=32, hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(100)
    hf_main = HFBertModel(hf_cfg)
    init_sd = {k: v.clone() for k, v in hf_main.state_dict().items()}
    monkeypatch.setattr(run_mod, "BertTokenizer",
                        types.SimpleNamespace(from_pretrained=lambda p: tok))
    monkeypatch.setattr(run_mod, "BertConfig", types.SimpleNamespace(
        from_pretrained=lambda p, **k: hf_cfg))
    monkeypatch.setattr(run_mod, "BertModel", types.SimpleNamespace(
        from_pretrained=lambda p, config=None: hf_main))

    def margs(**over):
        return ref_loop_args(root, bert_model_load="bert-tiny",
                             freeze_paras_before=0, num_words_title=T,
                             word_embedding_dim=128, **over)

    # ---- snapshot the initial weights train() will draw (same seed/order)
    hf_snap = HFBertModel(hf_cfg)
    hf_snap.load_state_dict(init_sd)
    cfg = our_cfg(root, item_tower="modal", modality="text",
                  num_words_title=T, word_embedding_dim=128,
                  bert_model_load="bert-tiny", freeze_paras_before=0)
    torch.manual_seed(SEED_MODEL)
    # pop probs don't affect RNG consumption; any array of the right size works
    snap = RefModel(margs(), N_ITEMS, True, hf_snap,
                    np.ones(N_ITEMS + 1))
    snap_ue = sasrec_params_from_torch(snap.user_encoder)
    fc = snap.bert_encoder.text_encoders["title"].fc
    snap_fc = {"kernel": t2n(fc.weight).T, "bias": t2n(fc.bias)}

    bcfg = BertConfig.from_hf(hf_cfg)
    net_params = convert_bert_state_dict(init_sd, hf_cfg.num_hidden_layers)

    def make_bundle():
        tower = TextTower(net=BertModel(bcfg), embedding_dim=D,
                          word_embedding_dim=128, pooling="cls",
                          attr_lengths=(T,))
        return (tower, {"params": net_params}, set(), 128)

    def transfer(p, tr):
        p["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)
        p["params"]["encoder"]["fc"] = jax.tree.map(jnp.asarray, snap_fc)

    monkeypatch.setattr(encoders_zoo, "load_tokenizer", lambda c: tok)

    def run_ours_modal(cfg_run):
        monkeypatch.chdir(tmp_path)
        mesh = make_mesh(jax.devices("cpu")[:1])
        tr = Trainer(cfg_run, log_file=null_logger("ours_modal"), mesh=mesh,
                     encoder_bundle=make_bundle())
        tr.load_data()
        tr.build_model()
        p = jax.device_get(tr.state.params)
        transfer(p, tr)
        tr.state = tr.state.replace(params=replicate(mesh, p))
        tr.batcher.perm_fn = torch_sampler_perm
        hits = []
        real_eval = tr.run_eval

        def spy(users="valid"):
            r = real_eval(users)
            hits.append(float(r[0]))
            return r

        tr.run_eval = spy
        tr.train()
        return hits, tr

    # ---- fresh 3-epoch runs both sides
    cfg3 = our_cfg(root, item_tower="modal", modality="text",
                   num_words_title=T, word_embedding_dim=128,
                   bert_model_load="bert-tiny", freeze_paras_before=0,
                   epoch=3)
    our_hits, tr3 = run_ours_modal(cfg3)

    torch.manual_seed(SEED_MODEL)
    ref_hits = run_reference(run_mod, margs(epoch=3), tmp_path, monkeypatch,
                             use_modal=True)
    np.testing.assert_allclose(our_hits, ref_hits, rtol=0, atol=1e-6)

    # the reference wrote epoch-N.pt exactly at improvement epochs; ours
    # wrote epoch-N.ckpt at the same epochs
    saves = save_epochs(ref_hits)
    ref_dir = tmp_path / "ref_ckpt"
    ref_saved = sorted(int(f.split("-")[1].split(".")[0])
                       for f in os.listdir(ref_dir) if f.startswith("epoch"))
    assert ref_saved == saves
    for e in saves:
        assert os.path.exists(os.path.join(tr3.model_dir, f"epoch-{e}.ckpt"))

    # ---- resume from the last saved epoch, 1 more epoch, both sides
    last = ref_saved[-1]
    torch.manual_seed(999)   # resume must NOT depend on the ambient RNG
    ref_hits_res = run_reference(
        run_mod, margs(epoch=1, load_ckpt_name=f"epoch-{last}.pt"),
        tmp_path, monkeypatch, use_modal=True)

    cfg_res = our_cfg(root, item_tower="modal", modality="text",
                      num_words_title=T, word_embedding_dim=128,
                      bert_model_load="bert-tiny", freeze_paras_before=0,
                      epoch=1, load_ckpt_name=f"epoch-{last}.ckpt")
    our_hits_res, _ = run_ours_modal(cfg_res)
    assert len(ref_hits_res) == len(our_hits_res) == 1
    # Each side's resumed epoch bit-matches its own fresh 4-epoch run
    # (measured; ours also proven in test_resume_and_eval_parity), but at
    # step 12 cross-framework f32 drift flips ONE of the 24 users across the
    # top-10 boundary (fresh 4-epoch runs show the same 0.2917-vs-0.25 gap).
    # Hit@10 is discrete in 1/N — allow exactly that one-user flip.
    assert abs(our_hits_res[0] - ref_hits_res[0]) <= 1.0 / N_USERS + 1e-6


def test_composed_loop_idrec_parity(tmp_path, monkeypatch):
    rng = np.random.default_rng(42)
    root = write_tsvs(tmp_path, rng)
    run_mod = load_ref_run("inbatch_sasrec_e2e_text", "loop_id")
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "loop_id_snap")

    # snapshot the exact initial weights train() will draw: same seed, same
    # construction order (run.py:127 builds Model right after data loading,
    # which consumes no torch RNG)
    cfg = our_cfg(root)
    mesh = make_mesh(jax.devices("cpu")[:1])
    probe = Trainer(cfg, log_file=null_logger("probe"), mesh=mesh)
    probe.load_data()
    pop = np.exp(np.asarray(probe.log_pop))
    torch.manual_seed(SEED_MODEL)
    snap = RefModel(ref_loop_args(root), probe.item_num, False, None, pop)
    snap_id = t2n(snap.id_embedding.weight)
    snap_ue = sasrec_params_from_torch(snap.user_encoder)

    def transfer(p, tr):
        p["params"]["id_embedding"]["embedding"] = jnp.asarray(snap_id)
        p["params"]["user_encoder"] = jax.tree.map(jnp.asarray, snap_ue)

    our_hits, max_hit, max_epoch = run_ours(our_cfg(root), transfer,
                                            tmp_path, monkeypatch)

    torch.manual_seed(SEED_MODEL)
    ref_hits = run_reference(run_mod, ref_loop_args(root), tmp_path,
                             monkeypatch)

    assert len(ref_hits) == EPOCHS and len(our_hits) == EPOCHS
    np.testing.assert_allclose(our_hits, ref_hits, rtol=0, atol=1e-6)
    # identical save-best bookkeeping follows from the identical sequence
    saves = save_epochs(ref_hits)
    assert max_epoch == saves[-1]
    assert max_hit == pytest.approx(max(ref_hits), abs=1e-6)
    # our side saved a checkpoint at every improvement epoch (the reference
    # computes need_save at the same epochs but inbatch-text only WRITES for
    # modal runs, run.py:265 — a documented deviation, PARITY.md)
    for e in saves:
        assert os.path.exists(os.path.join(probe.model_dir, f"epoch-{e}.ckpt")), \
            (e, os.listdir(probe.model_dir))
