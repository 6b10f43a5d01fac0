"""Executed parity for the reference TEST ORCHESTRATOR on a CONVERTED
checkpoint — the converter's done-criterion (VERDICT r4 item 1/8).

Flow, all executed for real on CPU:
1. The reference's own run.py train() (inbatch_sasrec_e2e_text/run.py:26-314)
   trains a text-MoRec for 3 epochs and writes its genuine epoch-N.pt
   checkpoints (save-best, run.py:264-267).
2. tools/convert_reference_ckpt.py converts the last .pt to epoch-N.ckpt.
3. The reference's own run_test.py train() (run_test.py:26-133: rebuild model
   -> load .pt -> RNG restore -> DDP -> test-split eval) runs on the .pt.
4. Our Trainer.test (mode=test) runs on the CONVERTED .ckpt with the same
   data.
Asserts: identical per-user hit vectors, nDCG to 1e-6 — a reference user's
trained artifact keeps producing the same test numbers after migration.
5. Resume leg: both sides continue training 1 epoch from their checkpoint
   (ours from the converted one, with the converted AdamW moments) — the
   per-epoch Hit@10 agrees within one borderline user (the measured
   cross-framework f32 drift allowance of the composed-loop parity test).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from _ref_harness import (REF_ROOT, ensure_single_rank_group, load_ref_run,
                          null_logger, patch_cuda_free, t2n)
from idvs.morec_tpu.parallel.mesh import make_mesh, replicate
from idvs.morec_tpu.train.runner import Trainer, _pad_histories
from test_reference_loop_parity import (N_ITEMS, N_USERS, L, D, SEED_MODEL,
                                        WordHashTokenizer, our_cfg,
                                        ref_loop_args, save_epochs,
                                        torch_sampler_perm, write_tsvs)

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
T = 8


class InjectiveTokenizer(WordHashTokenizer):
    """Maps each distinct word to a distinct id (no hash collisions) so no
    two items share a title -> no bit-identical embeddings -> no exact score
    ties. The reference breaks exact ties by argsort order while our O(I)
    rank counts strictly-greater (ops/metrics.py:15 documents the
    equivalence as modulo ties) — tie-free content keeps this test about
    the CHECKPOINT, not about tie-break order."""

    def __init__(self):
        super().__init__(vocab_size=64)
        self.vmap = {}

    def __call__(self, text, max_length, padding="max_length",
                 truncation=True):
        ids = []
        for w in text.split()[:max_length]:
            if w not in self.vmap:
                self.vmap[w] = 2 + len(self.vmap)
                assert self.vmap[w] < self.vocab_size
            ids.append(self.vmap[w])
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        return {"input_ids": ids + [0] * pad,
                "attention_mask": mask + [0] * pad}


def _bert_patches(monkeypatch, mod, hf_cfg, hf_model, tok):
    monkeypatch.setattr(mod, "BertTokenizer",
                        types.SimpleNamespace(from_pretrained=lambda p: tok))
    monkeypatch.setattr(mod, "BertConfig", types.SimpleNamespace(
        from_pretrained=lambda p, **k: hf_cfg))
    monkeypatch.setattr(mod, "BertModel", types.SimpleNamespace(
        from_pretrained=lambda p, config=None: hf_model))


def test_run_test_and_resume_on_converted_ckpt(tmp_path, monkeypatch):
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel

    from idvs.morec_tpu.models import encoders_zoo
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict
    from idvs.morec_tpu.models.text_tower import TextTower

    rng = np.random.default_rng(51)
    root = write_tsvs(tmp_path, rng)
    tok = InjectiveTokenizer()
    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=256,
                          max_position_embeddings=32, hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(200)
    hf_main = HFBertModel(hf_cfg)
    init_sd = {k: v.clone() for k, v in hf_main.state_dict().items()}

    def margs(**over):
        return ref_loop_args(root, bert_model_load="bert-tiny",
                             freeze_paras_before=0, num_words_title=T,
                             word_embedding_dim=128, **over)

    # ---------------- 1. reference training writes genuine epoch-N.pt
    run_mod = load_ref_run("inbatch_sasrec_e2e_text", "rtp_train")
    _bert_patches(monkeypatch, run_mod, hf_cfg, hf_main, tok)
    ensure_single_rank_group()
    targs = margs(epoch=3)
    patch_cuda_free(monkeypatch, run_mod, str(tmp_path / "ref_ckpt"), targs)
    os.makedirs(tmp_path / "ref_ckpt", exist_ok=True)
    hits = []
    real_eval = run_mod.eval_model

    def spy(*a, **k):
        r = real_eval(*a, **k)
        hits.append(float(r))
        return r

    monkeypatch.setattr(run_mod, "eval_model", spy)
    torch.manual_seed(SEED_MODEL)
    run_mod.train(targs, True, CPU)
    last = save_epochs(hits)[-1]
    pt_path = tmp_path / "ref_ckpt" / f"epoch-{last}.pt"
    assert pt_path.exists()

    # ---------------- 2. convert via the CLI tool
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_reference_ckpt as tool
    ckpt_path = tool.main([
        "--pt", str(pt_path), "--out", str(tmp_path / "converted"),
        "--item_tower", "modal", "--modality", "text",
        "--bert_model_load", "bert-tiny", "--freeze_paras_before", "0",
        "--embedding_dim", str(D), "--max_seq_len", str(L),
        "--num_attention_heads", "2", "--transformer_block", "2",
        "--num_words_title", str(T), "--word_embedding_dim", "128",
        "--drop_rate", "0.0", "--lr", "1e-3", "--l2_weight", "0.01",
        "--fine_tune_lr", "5e-4", "--fine_tune_l2_weight", "0.02"])

    # ---------------- 3. reference run_test.py on the .pt
    rt_mod = load_ref_run("inbatch_sasrec_e2e_text", "rtp_test",
                          filename="run_test.py")
    _bert_patches(monkeypatch, rt_mod, hf_cfg, hf_main, tok)
    patch_cuda_free(monkeypatch, rt_mod, str(tmp_path / "ref_ckpt"),
                    margs(epoch=3, mode="test",
                          load_ckpt_name=f"epoch-{last}.pt"))
    captured = {}
    mglobals = rt_mod.eval_model.__globals__
    real_concat = mglobals["eval_concat"]

    def spy_concat(eval_list, sampler):
        n = len(sampler.dataset)
        captured["hit"] = t2n(eval_list[0])[:n]
        captured["ndcg"] = t2n(eval_list[1])[:n]
        return real_concat(eval_list, sampler)

    monkeypatch.setitem(mglobals, "eval_concat", spy_concat)
    torch.manual_seed(999)
    rt_mod.train(rt_mod.args, True, CPU)
    ref_hit_u, ref_ndcg_u = captured["hit"], captured["ndcg"]

    # ---------------- 4. our Trainer.test on the CONVERTED .ckpt
    bcfg = BertConfig.from_hf(hf_cfg)
    net_params = convert_bert_state_dict(init_sd, hf_cfg.num_hidden_layers)

    def make_bundle():
        tower = TextTower(net=BertModel(bcfg), embedding_dim=D,
                          word_embedding_dim=128, pooling="cls",
                          attr_lengths=(T,))
        return (tower, {"params": net_params}, set(), 128)

    monkeypatch.setattr(encoders_zoo, "load_tokenizer", lambda c: tok)
    monkeypatch.chdir(tmp_path)

    def make_trainer(cfg_run):
        mesh = make_mesh(jax.devices("cpu")[:1])
        tr = Trainer(cfg_run, log_file=null_logger("rtp_ours"), mesh=mesh,
                     encoder_bundle=make_bundle())
        tr.load_data()
        tr.build_model()
        return tr

    cfg_t = our_cfg(root, item_tower="modal", modality="text",
                    num_words_title=T, word_embedding_dim=128,
                    bert_model_load="bert-tiny", freeze_paras_before=0,
                    mode="test", load_ckpt_name=f"epoch-{last}.ckpt")
    tr = make_trainer(cfg_t)
    os.makedirs(tr.model_dir, exist_ok=True)
    import shutil
    shutil.copy(ckpt_path, os.path.join(tr.model_dir,
                                        f"epoch-{last}.ckpt"))
    hit, ndcg = tr.test()

    # per-user vectors from the loaded state (the same weights tr.test just
    # evaluated)
    from idvs.morec_tpu.train.evaluate import (compute_item_embeddings,
                                               evaluate)
    table = compute_item_embeddings(tr.model, tr.state.params, tr.item_num,
                                    tr.item_content, D,
                                    cfg_t.item_emb_batch_size, tr.mesh)
    _, _, our_hit_u, our_ndcg_u = evaluate(
        tr.model, tr.state.params, table, tr.eval_test, tr.mesh,
        per_user=True)

    np.testing.assert_array_equal(np.asarray(our_hit_u), ref_hit_u)
    np.testing.assert_allclose(np.asarray(our_ndcg_u), ref_ndcg_u,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hit, ref_hit_u.mean(), rtol=0, atol=1e-7)

    # ---------------- 5. resume: 1 more epoch on both sides
    run_mod2 = load_ref_run("inbatch_sasrec_e2e_text", "rtp_resume")
    _bert_patches(monkeypatch, run_mod2, hf_cfg, hf_main, tok)
    rargs = margs(epoch=1, load_ckpt_name=f"epoch-{last}.pt")
    patch_cuda_free(monkeypatch, run_mod2, str(tmp_path / "ref_ckpt"), rargs)
    res_hits = []
    real_eval2 = run_mod2.eval_model

    def spy2(*a, **k):
        r = real_eval2(*a, **k)
        res_hits.append(float(r))
        return r

    monkeypatch.setattr(run_mod2, "eval_model", spy2)
    torch.manual_seed(999)
    run_mod2.train(rargs, True, CPU)

    cfg_r = our_cfg(root, item_tower="modal", modality="text",
                    num_words_title=T, word_embedding_dim=128,
                    bert_model_load="bert-tiny", freeze_paras_before=0,
                    epoch=1, load_ckpt_name=f"epoch-{last}.ckpt")
    tr2 = make_trainer(cfg_r)
    os.makedirs(tr2.model_dir, exist_ok=True)
    shutil.copy(ckpt_path, os.path.join(tr2.model_dir,
                                        f"epoch-{last}.ckpt"))
    tr2.batcher.perm_fn = torch_sampler_perm
    our_res = []
    real_eval_ours = tr2.run_eval

    def spy_ours(users="valid"):
        r = real_eval_ours(users)
        our_res.append(float(r[0]))
        return r

    tr2.run_eval = spy_ours
    tr2.train()
    assert len(res_hits) == len(our_res) == 1
    assert np.isfinite(our_res[0])
    # the converted-moment continuation tracks the torch continuation to
    # within the measured one-borderline-user cross-framework allowance
    assert abs(our_res[0] - res_hits[0]) <= 1.0 / N_USERS + 1e-6


def test_reference_run_test_on_exported_ckpt(tmp_path, monkeypatch):
    """The mirror of the test above: OUR Trainer trains, the checkpoint
    exports to .pt (tools/export_reference_ckpt), and the reference's own
    run_test.py evaluates it — per-user test vectors identical to our
    Trainer.test on the original .ckpt. Train here, hand off to torch."""
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel

    from idvs.morec_tpu.models import encoders_zoo
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.convert_text import convert_bert_state_dict
    from idvs.morec_tpu.models.text_tower import TextTower

    rng = np.random.default_rng(61)
    root = write_tsvs(tmp_path, rng)
    tok = InjectiveTokenizer()
    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=256,
                          max_position_embeddings=32, hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(300)
    hf_main = HFBertModel(hf_cfg)
    # pooler frozen as the reference's size table would (run.py:55-75)
    for idx, (_n, p) in enumerate(hf_main.named_parameters()):
        if idx in (37, 38):
            p.requires_grad = False
    init_sd = {k: v.clone() for k, v in hf_main.state_dict().items()}

    bcfg = BertConfig.from_hf(hf_cfg)
    net_params = convert_bert_state_dict(init_sd, hf_cfg.num_hidden_layers)

    def make_bundle():
        tower = TextTower(net=BertModel(bcfg), embedding_dim=D,
                          word_embedding_dim=128, pooling="cls",
                          attr_lengths=(T,))
        return (tower, {"params": net_params}, set(), 128)

    monkeypatch.setattr(encoders_zoo, "load_tokenizer", lambda c: tok)
    monkeypatch.chdir(tmp_path)

    # ---- OUR side trains 2 epochs and saves
    cfg = our_cfg(root, item_tower="modal", modality="text",
                  num_words_title=T, word_embedding_dim=128,
                  bert_model_load="bert-tiny", freeze_paras_before=0,
                  epoch=2)
    mesh = make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, log_file=null_logger("exp_ours"), mesh=mesh,
                 encoder_bundle=make_bundle())
    tr.load_data()
    tr.build_model()
    tr.train()
    import re as _re
    saved = sorted(int(_re.findall(r"\d+", f)[0])
                   for f in os.listdir(tr.model_dir) if f.endswith(".ckpt"))
    last = saved[-1]
    ckpt_path = os.path.join(tr.model_dir, f"epoch-{last}.ckpt")

    # our per-user test vectors on the saved checkpoint
    cfg_t = our_cfg(root, item_tower="modal", modality="text",
                    num_words_title=T, word_embedding_dim=128,
                    bert_model_load="bert-tiny", freeze_paras_before=0,
                    mode="test", load_ckpt_name=f"epoch-{last}.ckpt")
    tr_t = Trainer(cfg_t, log_file=null_logger("exp_ours_t"), mesh=mesh,
                   encoder_bundle=make_bundle())
    tr_t.load_data()
    tr_t.build_model()
    tr_t.test()
    from idvs.morec_tpu.train.evaluate import (compute_item_embeddings,
                                               evaluate)
    table = compute_item_embeddings(tr_t.model, tr_t.state.params,
                                    tr_t.item_num, tr_t.item_content, D,
                                    cfg_t.item_emb_batch_size, tr_t.mesh)
    _, _, our_hit_u, our_ndcg_u = evaluate(
        tr_t.model, tr_t.state.params, table, tr_t.eval_test, tr_t.mesh,
        per_user=True)

    # ---- export the .ckpt to a reference .pt
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import export_reference_ckpt as rev_tool
    ref_dir = tmp_path / "ref_ckpt_exp"
    os.makedirs(ref_dir, exist_ok=True)
    flags = ["--item_tower", "modal", "--modality", "text",
             "--bert_model_load", "bert-tiny", "--freeze_paras_before", "0",
             "--embedding_dim", str(D), "--max_seq_len", str(L),
             "--num_words_title", str(T), "--word_embedding_dim", "128",
             "--drop_rate", "0.0", "--lr", "1e-3", "--l2_weight", "0.01",
             "--fine_tune_lr", "5e-4", "--fine_tune_l2_weight", "0.02"]
    rev_tool.main(["--ckpt", ckpt_path, "--out", str(ref_dir) + os.sep]
                  + flags, net_template_sd=init_sd)

    # ---- the reference's own run_test.py evaluates the exported .pt
    rt_mod = load_ref_run("inbatch_sasrec_e2e_text", "rtp_exp",
                          filename="run_test.py")
    _bert_patches(monkeypatch, rt_mod, hf_cfg, hf_main, tok)
    rargs = ref_loop_args(root, bert_model_load="bert-tiny",
                          freeze_paras_before=0, num_words_title=T,
                          word_embedding_dim=128, mode="test",
                          load_ckpt_name=f"epoch-{last}.pt")
    ensure_single_rank_group()
    patch_cuda_free(monkeypatch, rt_mod, str(ref_dir), rargs)
    captured = {}
    mglobals = rt_mod.eval_model.__globals__
    real_concat = mglobals["eval_concat"]

    def spy_concat(eval_list, sampler):
        n = len(sampler.dataset)
        captured["hit"] = t2n(eval_list[0])[:n]
        captured["ndcg"] = t2n(eval_list[1])[:n]
        return real_concat(eval_list, sampler)

    monkeypatch.setitem(mglobals, "eval_concat", spy_concat)
    torch.manual_seed(777)
    rt_mod.train(rargs, True, CPU)

    np.testing.assert_array_equal(np.asarray(our_hit_u), captured["hit"])
    np.testing.assert_allclose(np.asarray(our_ndcg_u), captured["ndcg"],
                               rtol=1e-5, atol=1e-6)
