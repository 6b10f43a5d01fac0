"""Executable EVAL-chain parity vs the reference's own VISION torch code.

Extends test_reference_eval_parity.py to the vision variant: the reference's
actual LMDB eval pipeline (inbatch_sasrec_e2e_vision/data_utils/metrics.py:
64-113: get_itemLMDB_embeddings -> eval_model -> metrics_topK ->
distributed_concat) executes on CPU — with its genuine Build_Lmdb_Eval_Dataset
/ LMDB_Image / SequentialDistributedSampler code driven through faithful
single-purpose stand-ins for the two uninstalled C deps (lmdb env -> dict of
the same pickled records; torchvision transforms -> the identical
Resize/ToTensor/Normalize math) — against train/evaluate.py on identical
transferred weights, identical uint8 images, and identical users.

This is the surface the text-variant eval parity test cannot reach: the
LMDB record decode (LMDB_Image.get_image), the ToTensor+Normalize(0.5) image
path vs our on-device uint8 normalization, the index-0 NORMALIZED-zero pad
image (dataset.py:145 padding_emb — covered by VisionTower's pad_mask), and
the HF Swin classifier-head encoder (Vit_Encoder, model/encoders.py:24-31)
vs our converted Flax SwinModel inside the full eval chain.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (DDPShim, REF_ROOT, ensure_single_rank_group,
                          load_ref_metrics, load_ref_model_class,
                          load_ref_package, make_user_sequences, null_logger,
                          ref_args, sasrec_params_from_torch, t2n)
from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.train.evaluate import compute_item_embeddings, evaluate

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
ITEM_NUM, N_USERS, L, D, HEADS, BLOCKS = 20, 13, 8, 16, 2, 2
EVAL_BS = 4     # forces sampler padding: ceil(13/4)*4 = 16 rows, 3 pad users
RESIZE = 16     # tiny HF Swin geometry (test_swin.py)


# ------------------------------------------------------- third-party stand-ins
def _install_cv_stubs(monkeypatch, dbs: dict):
    """sys.modules stand-ins for the two uninstalled C deps the reference's
    dataset.py imports at module top (dataset.py:8-10). Each implements
    EXACTLY the surface the reference uses, with the library's documented
    semantics — the reference's own dataset/metrics code runs unmodified.
    """
    from PIL import Image

    # --- torchvision.transforms (dataset.py:152-157) ---
    class Compose:
        def __init__(self, fns):
            self.fns = list(fns)

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class Resize:
        def __init__(self, size):
            self.size = size  # (h, w)

        def __call__(self, img):
            return img.resize((self.size[1], self.size[0]), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.uint8)
            return torch.from_numpy(arr).permute(2, 0, 1).float().div(255.0)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    transforms = types.ModuleType("torchvision.transforms")
    transforms.Compose = Compose
    transforms.Resize = Resize
    transforms.ToTensor = ToTensor
    transforms.Normalize = Normalize
    tv = types.ModuleType("torchvision")
    tv.transforms = transforms

    # --- lmdb (dataset.py:146-151,166-168: open -> begin() -> txn.get) ---
    class _Txn:
        def __init__(self, d):
            self._d = d

        def get(self, key):
            return self._d.get(bytes(key))

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _Env:
        def __init__(self, d):
            self._d = d

        def begin(self, *a, **k):
            return _Txn(self._d)

    lmdb = types.ModuleType("lmdb")
    lmdb.open = lambda path, **k: _Env(dbs[path])

    # real ModuleSpecs: importlib.util.find_spec on an installed module
    # reads __spec__ and raises on None (transformers probes torchvision)
    import importlib.machinery
    for name, mod in (("torchvision", tv),
                      ("torchvision.transforms", transforms),
                      ("lmdb", lmdb)):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)

    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", transforms)
    monkeypatch.setitem(sys.modules, "lmdb", lmdb)


def _tiny_hf_swin_cls(rng_seed: int):
    """SwinForImageClassification with the classifier replaced by
    Linear(num_features, D) exactly as run.py:47-54 does."""
    from torch import nn
    from torch.nn.init import constant_, xavier_normal_
    from transformers import SwinConfig as HFC, SwinForImageClassification

    hf_cfg = HFC(image_size=RESIZE, patch_size=2, num_channels=3, embed_dim=8,
                 depths=[2, 2], num_heads=[2, 4], window_size=2,
                 mlp_ratio=2.0, drop_path_rate=0.0, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)
    torch.manual_seed(rng_seed)
    cv_model = SwinForImageClassification(hf_cfg)
    num_fc_ftr = cv_model.classifier.in_features
    cv_model.classifier = nn.Linear(num_fc_ftr, D)
    xavier_normal_(cv_model.classifier.weight.data)
    constant_(cv_model.classifier.bias.data, 0)
    return hf_cfg, cv_model


def test_eval_chain_vision_morec_parity(monkeypatch, tmp_path):
    # import transformers BEFORE the torchvision stand-in exists: its import
    # probe must see torchvision as genuinely absent
    import transformers  # noqa: F401

    rng = np.random.default_rng(21)
    images = rng.integers(0, 256, size=(ITEM_NUM + 1, RESIZE, RESIZE, 3),
                          dtype=np.uint8)  # row 0 unused on both sides

    # --- reference side: real LMDB-format records behind the env stand-in ---
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS,
                    CV_model_load="swin_tiny", CV_resize=RESIZE,
                    root_data_dir=str(tmp_path), dataset="ds")
    db_path = os.path.join(args.root_data_dir, args.dataset, "db")
    dbs = {db_path: {}}
    _install_cv_stubs(monkeypatch, dbs)

    tag = "evalpar_vis"
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_vision", tag)
    metrics_mod = load_ref_metrics("inbatch_sasrec_e2e_vision", tag)
    dataset_mod = sys.modules[f"_refpkg_data_utils_{tag}.dataset"]

    item_id_to_keys = {i: str(i).encode() for i in range(1, ITEM_NUM + 1)}
    db = dbs[db_path]
    for i, key in item_id_to_keys.items():
        db[key] = pickle.dumps(dataset_mod.LMDB_Image(images[i], key))
    db[b"__len__"] = pickle.dumps(ITEM_NUM)
    db[b"__keys__"] = pickle.dumps(list(item_id_to_keys.values()))

    _, users_valid, _, hist_valid, _ = make_user_sequences(
        rng, N_USERS, ITEM_NUM, L)
    pop = np.ones(ITEM_NUM + 1)
    hf_cfg, cv_model = _tiny_hf_swin_cls(22)
    torch.manual_seed(23)
    tm = RefModel(args, ITEM_NUM, True, cv_model, pop).to(CPU)
    tm.eval()

    ensure_single_rank_group()
    shim = DDPShim(tm)
    log = null_logger()
    ref_table = metrics_mod.get_itemLMDB_embeddings(
        shim, ITEM_NUM, item_id_to_keys, "db", 5, args, CPU)

    captured = {}
    real_concat = metrics_mod.eval_concat

    def spy_concat(eval_list, sampler):
        n = len(sampler.dataset)
        captured["hit"] = t2n(eval_list[0])[:n]
        captured["ndcg"] = t2n(eval_list[1])[:n]
        return real_concat(eval_list, sampler)

    metrics_mod.eval_concat = spy_concat
    user_history = {u: torch.LongTensor(h) for u, h in hist_valid.items()}
    ref_hr = metrics_mod.eval_model(shim, user_history, users_valid, ref_table,
                                    EVAL_BS, args, ITEM_NUM, log, "valid", CPU)
    metrics_mod.eval_concat = real_concat
    ref_ndcg = float(captured["ndcg"].mean())

    # --- our side: converted Flax Swin + the real vision eval path ---
    from idvs.morec_tpu.data.loader import EvalBatches, pad_user_sequences
    from idvs.morec_tpu.models.swin import (SwinConfig, SwinModel,
                                            convert_swin_state_dict)
    from idvs.morec_tpu.models.vision_tower import VisionTower
    from idvs.morec_tpu.train.runner import _pad_histories

    scfg = SwinConfig.from_hf(hf_cfg)
    encoder = VisionTower(net=SwinModel(scfg), kind="swin", embedding_dim=D,
                          feature_dim=scfg.num_features, compute_dtype=None)
    cfg = Config(item_tower="modal", modality="vision", loss="inbatch_ce",
                 max_seq_len=L, embedding_dim=D, batch_size=4,
                 num_attention_heads=HEADS, transformer_block=BLOCKS,
                 drop_rate=0.0, compute_dtype="float32")
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)

    seqs0 = jnp.ones((2, L + 1), jnp.int32)
    lm0 = jnp.ones((2, L), jnp.float32)
    init_content = jnp.asarray(images[np.asarray(seqs0).reshape(-1)])
    params = model.init(jax.random.PRNGKey(0), seqs0, init_content, lm0)
    params["params"]["user_encoder"] = jax.tree.map(
        jnp.asarray, sasrec_params_from_torch(tm.user_encoder))
    params["params"]["encoder"]["net"] = jax.tree.map(
        jnp.asarray, convert_swin_state_dict(
            {k: v.numpy() for k, v in cv_model.swin.state_dict().items()},
            scfg))
    params["params"]["encoder"]["classifier"] = {
        "kernel": jnp.asarray(t2n(cv_model.classifier.weight).T),
        "bias": jnp.asarray(t2n(cv_model.classifier.bias))}

    # uint8 content_fn exactly as VisionBatchPipe.images_for emits it
    # (id 0 -> uint8 zeros; the tower's pad_mask restores the reference's
    # NORMALIZED-zero pad image)
    def content_fn(ids):
        return images[np.asarray(ids)]

    table = compute_item_embeddings(model, params, ITEM_NUM, None, D,
                                    batch_size=5, content_fn=content_fn)
    seqs, lens = pad_user_sequences(users_valid, L + 1)
    hist = _pad_histories(hist_valid, L + 2)
    batches = EvalBatches(seqs, lens, L, EVAL_BS, hist, num_shards=1)
    our_hr, our_ndcg, our_hit_u, our_ndcg_u = evaluate(
        model, params, table, batches, per_user=True)

    # item tables equal (incl. row 0: encoder over the normalized-zero pad
    # image on both sides); Swin f32 cross-framework drift is ~1e-5 at this
    # depth (test_swin.py tolerance)
    np.testing.assert_allclose(np.asarray(table), t2n(ref_table),
                               rtol=1e-4, atol=3e-4)
    np.testing.assert_array_equal(our_hit_u, captured["hit"])
    np.testing.assert_allclose(our_ndcg_u, captured["ndcg"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(our_hr, float(ref_hr), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(our_ndcg, ref_ndcg, rtol=1e-6, atol=1e-6)
