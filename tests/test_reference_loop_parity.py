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
