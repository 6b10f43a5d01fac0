"""End-to-end vision MoRec: MKV image store -> native transform pipeline ->
ResNet tower with cross-replica BatchNorm -> sharded training + eval.
Mirrors the reference vision path (inbatch_sasrec_e2e_vision/train_*.py ->
run.py with the LMDB pipeline)."""

import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.data.imagestore import write_mkv
from idvs.morec_tpu.parallel.mesh import make_mesh
from idvs.morec_tpu.train.runner import Trainer


def synth_vision(tmp_path, n_users=40, n_items=20):
    rng = np.random.default_rng(0)
    base = tmp_path / "HMINY"
    base.mkdir(exist_ok=True)
    (base / "images.tsv").write_text("".join(
        f"v{k}\tx\n" for k in range(1, n_items + 1)))
    recs = [(str(k).encode(), rng.integers(0, 256, size=(40 + k, 30, 3),
                                           dtype=np.uint8))
            for k in range(1, n_items + 1)]
    write_mkv(str(base / "imgs.mkv"), iter(recs))
    lines = []
    for u in range(n_users):
        L = int(rng.integers(5, 9))
        items = rng.choice(np.arange(1, n_items + 1), size=L, replace=False)
        lines.append(f"u{u}\t" + " ".join(f"v{k}" for k in items))
    (base / "behaviors.tsv").write_text("\n".join(lines) + "\n")
    return str(tmp_path) + "/"


def quiet():
    lg = logging.getLogger("q"); lg.setLevel(logging.CRITICAL); return lg


def test_vision_resnet_end2end(tmp_path):
    root = synth_vision(tmp_path)
    cfg = Config(root_data_dir=root, dataset="HMINY", news="images.tsv",
                 behaviors="behaviors.tsv", image_store="imgs.mkv",
                 item_tower="modal", modality="vision", stage="end2end",
                 cv_model_load="resnet18", image_resize=32,
                 max_seq_len=6, min_seq_len=3, batch_size=2,
                 embedding_dim=16, transformer_block=1,
                 num_attention_heads=2, epoch=1, lr=1e-3, fine_tune_lr=1e-4,
                 eval_batch_size=8, freeze_paras_before=3)
    os.chdir(tmp_path)
    from idvs.morec_tpu.models.vision_tower import build_vision_tower
    bundle = build_vision_tower(cfg, axis_name="data")
    mesh = make_mesh(jax.devices("cpu")[:2])
    tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                 encoder_bundle=bundle)
    tr.load_data()
    assert tr.vision_pipe is not None
    tr.build_model()
    assert "batch_stats" in tr.state.params

    # uint8 image batches
    raw = next(iter(tr.batcher.epoch(1)))
    batch = tr.make_batch(raw)
    assert batch["content"].dtype == jnp.uint8
    assert batch["content"].shape[1:] == (32, 32, 3)
    # padding slots are zero images
    flat_ids = np.asarray(raw[0]).reshape(-1)
    pad_rows = np.asarray(batch["content"])[flat_ids == 0]
    assert (pad_rows == 0).all()

    bn_before = np.asarray(
        tr.state.params["batch_stats"]["encoder"]["net"]["bn1"]["mean"]).copy()
    losses = []
    it = iter(tr.batcher.epoch(1))
    for _ in range(3):
        tr.state, loss = tr.train_step(tr.state, tr.make_batch(next(it)))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    bn_after = np.asarray(
        tr.state.params["batch_stats"]["encoder"]["net"]["bn1"]["mean"])
    assert not np.allclose(bn_before, bn_after)  # SyncBN running stats update

    hit, ndcg = tr.run_eval("valid")
    assert 0.0 <= hit <= 1.0


def test_vision_tower_kinds():
    """Swin and MAE tower wrappers produce (N, ed) with GELU head."""
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel
    from idvs.morec_tpu.models.vit_mae import ViTMAEConfig, ViTMAEModel
    from idvs.morec_tpu.models.vision_tower import VisionTower

    x8 = jnp.zeros((2, 16, 16, 3), jnp.uint8)
    swin = VisionTower(
        net=SwinModel(SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                                 depths=(2,), num_heads=(2,), window_size=2,
                                 mlp_ratio=2.0, drop_path_rate=0.0)),
        kind="swin", embedding_dim=12, feature_dim=8)
    p = swin.init(jax.random.PRNGKey(0), x8, True)
    assert swin.apply(p, x8, True).shape == (2, 12)

    mae = VisionTower(
        net=ViTMAEModel(ViTMAEConfig(image_size=16, patch_size=4,
                                     hidden_size=24, num_hidden_layers=1,
                                     num_attention_heads=2,
                                     intermediate_size=48, mask_ratio=0.5)),
        kind="mae", embedding_dim=12, feature_dim=24)
    p = mae.init({"params": jax.random.PRNGKey(0),
                  "masking": jax.random.PRNGKey(1)}, x8, True)
    out = mae.apply(p, x8, True, rngs={"masking": jax.random.PRNGKey(2)})
    assert out.shape == (2, 12)


def test_vision_bce_with_negative_images(tmp_path):
    """BCE vision: negatives ship their own image batch
    (bce_vision/main-end2end semantics)."""
    root = synth_vision(tmp_path)
    cfg = Config(root_data_dir=root, dataset="HMINY", news="images.tsv",
                 behaviors="behaviors.tsv", image_store="imgs.mkv",
                 item_tower="modal", modality="vision", stage="end2end",
                 loss="bce", cv_model_load="resnet18", image_resize=32,
                 max_seq_len=6, min_seq_len=3, batch_size=2,
                 embedding_dim=16, transformer_block=1,
                 num_attention_heads=2, epoch=1, lr=1e-3,
                 eval_batch_size=8)
    os.chdir(tmp_path)
    from idvs.morec_tpu.models.vision_tower import build_vision_tower
    bundle = build_vision_tower(cfg)
    mesh = make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, log_file=quiet(), log_screen=quiet(), mesh=mesh,
                 encoder_bundle=bundle)
    tr.load_data()
    tr.build_model()
    raw = next(iter(tr.batcher.epoch(1)))
    batch = tr.make_batch(raw)
    assert "neg_content" in batch and batch["neg_content"].dtype == jnp.uint8
    # negative slots with id 0 must be zero images
    neg_ids = np.asarray(raw[1]).reshape(-1)
    assert (np.asarray(batch["neg_content"])[neg_ids == 0] == 0).all()
    tr.state, loss = tr.train_step(tr.state, batch)
    assert np.isfinite(float(loss))
