"""Synthetic quality study (no-egress stand-in for the paper's table).

Reproduces the reference paper's DIRECTIONAL result with pretrained-free
proxies (random-init tiny BERT as the modality encoder):

1. Content-informative catalog with a long tail: MoRec should beat IDRec on
   HR@10 — rare items get almost no gradient into their ID embeddings, while
   the text tower generalizes through shared title tokens (the paper's
   "MoRec wins where modality is informative", README.md:111-121).
2. Uninformative catalog (titles identify the GROUP plus a noise token
   uncorrelated with behavior): IDRec should beat MoRec, which cannot rank
   within a group beyond chance.
3. --dedup_items quality effect under encoder dropout (the bench headline's
   one semantic deviation): same MoRec config with dedup on vs off, same
   seeds; reports the HR@10 delta.

Run:  python tools/quality_study.py [--seeds 3] [--out results.json]
CPU-friendly sizes; ~20-30 min on one core. Results are recorded in
PARITY.md section "Quality evidence".
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_dataset(base, seed, n_items=600, n_groups=12, n_users=1500,
                 informative=True, zipf_a=1.4):
    """Group-structured catalog with an in-group popularity long tail.

    Informative titles carry the group token AND an item-unique token (full
    content signal); uninformative titles carry ONLY the group token — every
    item in a group reads identically, so a content tower cannot rank within
    the group at all while an ID tower can. User sequences sample their
    group's items with a Zipf weight, so tail items appear rarely in
    training; leave-one-out targets therefore include poorly-observed items.
    """
    rng = np.random.default_rng(seed)
    # atomic like make_vision_dataset: a partially-written dataset left by
    # an interrupted run must never be silently reused by a rerun's
    # isdir() guard
    final = base
    base = final.rstrip(os.sep) + ".tmp"
    if os.path.isdir(base):
        shutil.rmtree(base)
    os.makedirs(base, exist_ok=True)
    per = n_items // n_groups
    with open(os.path.join(base, "news.tsv"), "w") as f:
        for k in range(1, n_items + 1):
            g = (k - 1) // per
            # uninformative: a noise token (uncorrelated with behavior,
            # shared across ~1/64 of the catalog) breaks embedding ties —
            # identical titles would tie every score and the rank metric
            # (1 + #greater, reference metrics.py:25) calls every tie a hit
            body = (f"item {k}" if informative
                    else f"item {1000 + int(rng.integers(64))}")
            f.write(f"i{k}\tg{g} g{g} {body}\tabs\n")
    with open(os.path.join(base, "behaviors.tsv"), "w") as f:
        for u in range(n_users):
            g = rng.integers(0, n_groups)
            members = np.arange(1 + g * per, 1 + (g + 1) * per)
            w = 1.0 / np.power(np.arange(1, per + 1), zipf_a)
            w /= w.sum()
            L = int(rng.integers(6, 12))
            items = rng.choice(members, size=min(L, per), replace=False, p=w)
            f.write(f"u{u}\t" + " ".join(f"i{k}" for k in items) + "\n")
    os.rename(base, final)


GROUP_PALETTE = np.array(
    [[200, 60, 60], [60, 200, 60], [60, 60, 200], [200, 200, 60],
     [200, 60, 200], [60, 200, 200], [230, 140, 40], [140, 40, 230],
     [40, 230, 140], [120, 120, 120], [230, 230, 230], [90, 50, 20]],
    dtype=np.uint8)


def _item_image(code, group):
    """32x32 uint8: group-colored frame + a 16-bit block pattern of `code`
    (4x4 grid of 6x6-px blocks — aligned with the tiny Swin's 4-px patches
    so the pattern survives patch embedding)."""
    img = np.empty((32, 32, 3), np.uint8)
    img[:, :] = GROUP_PALETTE[group % len(GROUP_PALETTE)]
    for i in range(4):
        for j in range(4):
            v = 255 if (code >> (i * 4 + j)) & 1 else 0
            img[4 + i * 6:10 + i * 6, 4 + j * 6:10 + j * 6] = v
    return img


def make_vision_dataset(base, seed, n_items=600, n_groups=12, n_users=1500,
                        informative=True, zipf_a=1.4):
    """The vision twin of make_dataset: same behavior generation, but item
    content is an IMAGE in an MKV record store. Informative images carry the
    group color AND an item-unique 16-bit block pattern; uninformative ones
    carry the group color plus a noise pattern shared across ~1/64 of the
    catalog (uncorrelated with behavior — same tie-breaking role as the text
    arm's noise token).

    Writes into a sibling temp dir and renames into place atomically, so an
    interrupted run never leaves a partially-written dataset that a rerun's
    isdir() check would silently reuse."""
    from idvs.morec_tpu.data.imagestore import write_mkv
    rng = np.random.default_rng(seed)
    final = base
    base = final.rstrip(os.sep) + ".tmp"
    if os.path.isdir(base):
        shutil.rmtree(base)
    os.makedirs(base, exist_ok=True)
    per = n_items // n_groups

    def records():
        for k in range(1, n_items + 1):
            g = (k - 1) // per
            code = k if informative else 1000 + int(rng.integers(64))
            yield str(k).encode("ascii"), _item_image(code, g)

    write_mkv(os.path.join(base, "images.mkv"), records())
    with open(os.path.join(base, "news.tsv"), "w") as f:
        for k in range(1, n_items + 1):
            f.write(f"v{k}\n")
    rng2 = np.random.default_rng(seed + 1)
    with open(os.path.join(base, "behaviors.tsv"), "w") as f:
        for u in range(n_users):
            g = rng2.integers(0, n_groups)
            members = np.arange(1 + g * per, 1 + (g + 1) * per)
            w = 1.0 / np.power(np.arange(1, per + 1), zipf_a)
            w /= w.sum()
            L = int(rng2.integers(6, 12))
            items = rng2.choice(members, size=min(L, per), replace=False, p=w)
            f.write(f"u{u}\t" + " ".join(f"v{k}" for k in items) + "\n")
    os.rename(base, final)


def swin_study_dir(root):
    """Random-init tiny HF Swin checkpoint on disk (32x32 images, 4-px
    patches) — the vision twin of bert_tiny_dir's pretrained-free proxy."""
    import torch
    from transformers import SwinConfig, SwinForImageClassification
    d = os.path.join(root, "pretrained", "swin-study")
    if os.path.isdir(d):
        return d
    os.makedirs(d, exist_ok=True)
    cfg = SwinConfig(image_size=32, patch_size=4, num_channels=3,
                     embed_dim=16, depths=[2, 2], num_heads=[2, 4],
                     window_size=4, mlp_ratio=2.0, drop_path_rate=0.0)
    torch.manual_seed(0)
    SwinForImageClassification(cfg).save_pretrained(d, safe_serialization=False)
    cfg.save_pretrained(d)
    return d


def bert_tiny_dir(root):
    """Random-init tiny BERT checkpoint on disk (pretrained-free proxy)."""
    import torch
    from transformers import BertConfig, BertModel
    d = os.path.join(root, "pretrained", "bert-tiny-study")
    if os.path.isdir(d):
        return d
    os.makedirs(d, exist_ok=True)
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "item", "abs", "x"]
             + [f"g{g}" for g in range(32)] + [str(i) for i in range(2000)])
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=64)
    torch.manual_seed(0)
    BertModel(cfg).save_pretrained(d, safe_serialization=False)
    cfg.save_pretrained(d)
    return d


def run_one(root, data_dir, tower, seed, pretrained_dir=None, dedup=False,
            drop_rate=0.1, epochs=8, loss="inbatch_ce", modality="text",
            user_tower="sasrec"):
    from idvs.morec_tpu.run import main as run_main
    cwd = os.getcwd()
    rundir = os.path.join(root, "run_{}_{}_{}_{}{}{}".format(
        os.path.basename(data_dir), tower, seed, int(dedup),
        "" if loss == "inbatch_ce" else "_" + loss,
        "" if user_tower == "sasrec" else "_" + user_tower))
    os.makedirs(rundir, exist_ok=True)
    cache = os.path.join(rundir, "result.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["hr10"]
    os.chdir(rundir)
    try:
        args = [
            "--root_data_dir", os.path.dirname(data_dir) + "/",
            "--dataset", os.path.basename(data_dir),
            "--news", "news.tsv", "--behaviors", "behaviors.tsv",
            "--item_tower", tower, "--max_seq_len", "10", "--min_seq_len", "4",
            "--batch_size", "64", "--embedding_dim", "32",
            "--transformer_block", "2", "--num_attention_heads", "2",
            "--epoch", str(epochs), "--lr", "1e-3", "--drop_rate", str(drop_rate),
            "--eval_batch_size", "256", "--seed", str(12345 + seed),
            "--mode", "train", "--loss", loss,
        ]
        if user_tower != "sasrec":
            # DSSM two-tower (bce_text/main-end2end(DSSM)/model/model.py:
            # 7-43): user-id embedding + MLP vs the item tower, pointwise
            # BCE over neg_num sampled negatives (parameters.py default 1,
            # dnn_layers from its train grid [0, 2, 4] — 2 here so the MLP
            # path is exercised)
            args += ["--user_tower", user_tower, "--neg_num", "1",
                     "--dnn_layers", "2"]
        if tower == "modal" and modality == "vision":
            # random-init tiny-Swin proxy: full-rate fine-tune lr like the
            # text proxy (a pretrained encoder would use the reference's low
            # fine_tune_lr); CV_resize matches the stored 32x32 images
            args += ["--modality", "vision", "--cv_model_load",
                     os.path.basename(pretrained_dir),
                     "--pretrained_models_dir", os.path.dirname(pretrained_dir),
                     "--image_store", "images.mkv", "--CV_resize", "32",
                     "--fine_tune_lr", "5e-3"]
        elif tower == "modal":
            # random-init proxy recipe: masked-mean pooling + a from-scratch
            # fine-tune lr (the paper fine-tunes PRETRAINED encoders at low
            # lr; a random-init proxy needs the signal path of mean pooling
            # and a full-rate lr to learn token semantics at all — CLS on a
            # random net scores ~12 vs ~66 HR@10 with this recipe)
            args += ["--modality", "text", "--bert_model_load",
                     os.path.basename(pretrained_dir),
                     "--pretrained_models_dir", os.path.dirname(pretrained_dir),
                     "--num_words_title", "8", "--news_attributes", "title",
                     "--word_embedding_dim", "32", "--text_pooling", "mean",
                     "--fine_tune_lr", "5e-3"]
        if dedup:
            args += ["--dedup_items", "true"]
        best, _ = run_main(args)
        with open(cache, "w") as f:
            json.dump({"hr10": best * 100}, f)
        return best * 100
    finally:
        os.chdir(cwd)


def mean_std(xs):
    return float(np.mean(xs)), float(np.std(xs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--workdir", default="")
    ap.add_argument("--arm", default="all",
                    choices=["all", "directional", "dedup", "bce", "vision",
                             "dssm"])
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of forced CPU "
                         "— exercises the fused Pallas kernels in a real "
                         "train-to-convergence loop (quality check for the "
                         "kernel paths, e.g. the A&S erf GELU)")
    args = ap.parse_args()

    if not args.tpu:
        force_cpu()
    root = args.workdir or tempfile.mkdtemp(prefix="quality_study_")
    print(f"workdir: {root}")
    bert_dir = bert_tiny_dir(root)

    results = {}
    arms_directional = args.arm in ("all", "directional")
    arms_dedup = args.arm in ("all", "dedup")
    for informative in ((True, False) if arms_directional else ()):
        tag = "informative" if informative else "uninformative"
        data_dir = os.path.join(root, f"DATA_{tag}")
        idrec, morec = [], []
        for s in range(args.seeds):
            if s == 0:
                make_dataset(data_dir, seed=100, informative=informative)
            idrec.append(run_one(root, data_dir, "id", s))
            morec.append(run_one(root, data_dir, "modal", s,
                                 pretrained_dir=bert_dir))
            print(f"[{tag}] seed {s}: IDRec {idrec[-1]:.2f}  "
                  f"MoRec {morec[-1]:.2f}")
        results[tag] = {"idrec_hr10": mean_std(idrec),
                        "morec_hr10": mean_std(morec)}

    # dedup-under-dropout quality effect (bench headline deviation)
    data_dir = os.path.join(root, "DATA_informative")
    if arms_dedup and not os.path.isdir(data_dir):
        make_dataset(data_dir, seed=100, informative=True)
    off, on = [], []
    for s in (range(args.seeds) if arms_dedup else ()):
        off.append(run_one(root, data_dir, "modal", 10 + s,
                           pretrained_dir=bert_dir, dedup=False))
        on.append(run_one(root, data_dir, "modal", 10 + s,
                          pretrained_dir=bert_dir, dedup=True))
        print(f"[dedup] seed {s}: off {off[-1]:.2f}  on {on[-1]:.2f}")
    if arms_dedup:
        results["dedup_effect"] = {"dedup_off_hr10": mean_std(off),
                                   "dedup_on_hr10": mean_std(on)}

    # BCE loss family (VERDICT r3 item 9): same informative catalog, same
    # towers, loss='bce' — the study's MoRec-vs-IDRec direction should hold
    # for both loss families (the reference notes in-batch CE converges
    # faster, README.md:121, so BCE gets more epochs)
    if args.arm in ("all", "bce"):
        data_dir = os.path.join(root, "DATA_informative")
        if not os.path.isdir(data_dir):
            make_dataset(data_dir, seed=100, informative=True)
        id_b, mo_b = [], []
        for s in range(args.seeds):
            id_b.append(run_one(root, data_dir, "id", 20 + s,
                                loss="bce", epochs=16))
            mo_b.append(run_one(root, data_dir, "modal", 20 + s,
                                pretrained_dir=bert_dir, loss="bce",
                                epochs=16))
            print(f"[bce] seed {s}: IDRec {id_b[-1]:.2f}  MoRec {mo_b[-1]:.2f}")
        results["bce"] = {"idrec_hr10": mean_std(id_b),
                          "morec_hr10": mean_std(mo_b)}

    # DSSM user tower (round 5, VERDICT r4 item 5): the one reference model
    # family the study had not examined — user-id-embedding + MLP two-tower
    # with pointwise BCE (bce_text/main-end2end(DSSM)). Both catalogs, so
    # the MoRec-vs-IDRec direction AND the content-causality ablation are
    # measured for this tower too.
    if args.arm in ("all", "dssm"):
        for informative in (True, False):
            tag = ("dssm_informative" if informative
                   else "dssm_uninformative")
            data_dir = os.path.join(
                root, "DATA_informative" if informative
                else "DATA_uninformative")
            if not os.path.isdir(data_dir):
                make_dataset(data_dir, seed=100, informative=informative)
            id_d, mo_d = [], []
            for s in range(args.seeds):
                id_d.append(run_one(root, data_dir, "id", s, loss="bce",
                                    user_tower="dssm", epochs=16))
                mo_d.append(run_one(root, data_dir, "modal", s, loss="bce",
                                    user_tower="dssm", epochs=16,
                                    pretrained_dir=bert_dir))
                print(f"[{tag}] seed {s}: IDRec {id_d[-1]:.2f}  "
                      f"MoRec {mo_d[-1]:.2f}")
            results[tag] = {"idrec_hr10": mean_std(id_d),
                            "morec_hr10": mean_std(mo_d)}

    # vision modality (round 4): the directional study's vision twin — item
    # content is an image in the MKV store through the real vision pipeline
    # (manifest -> store -> VisionBatchPipe -> Flax Swin tower)
    if args.arm in ("all", "vision"):
        swin_dir = swin_study_dir(root)
        for informative in (True, False):
            tag = "vis_informative" if informative else "vis_uninformative"
            data_dir = os.path.join(root, f"DATA_{tag}")
            idrec, morec = [], []
            for s in range(args.seeds):
                if s == 0 and not os.path.isdir(data_dir):
                    make_vision_dataset(data_dir, seed=200,
                                        informative=informative)
                idrec.append(run_one(root, data_dir, "id", s))
                morec.append(run_one(root, data_dir, "modal", s,
                                     pretrained_dir=swin_dir,
                                     modality="vision"))
                print(f"[{tag}] seed {s}: IDRec {idrec[-1]:.2f}  "
                      f"MoRec {morec[-1]:.2f}")
            results[tag] = {"idrec_hr10": mean_std(idrec),
                            "morec_hr10": mean_std(morec)}

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
