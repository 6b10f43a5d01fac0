"""Executable COLD/NEW-item special-eval parity vs the reference's special.py.

Runs the reference's actual special-eval chain (inbatch_sasrec_e2e_text/
data_utils/special.py: read_behaviors_special -> BuildEvalColdDataset /
BuildEvalNewDataset -> eval_model_special with its per-user appended
new-item column, metrics_topK, distributed_concat) on CPU with a real
single-rank gloo group, against train/special_eval.py (read_behaviors_special,
eval_cold, eval_new) on identical transferred SASRec weights and identical
embedding tables. Covers the two surfaces the regular eval parity test does
not: the cold-file/new-file parsing + new-item re-iding, and the per-user
catalog+new-item ranking (special.py:196-210).

special.py is not reachable through the variant package __init__ (the text
variant never imports it there) and imports its sibling ABSOLUTELY
('from data_utils.dataset import ...', special.py:4) — so the loaded package
is aliased as 'data_utils' for the duration of the module exec.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _ref_harness import (DDPShim, REF_ROOT, ensure_single_rank_group,
                          load_ref_model_class, load_ref_package, null_logger,
                          ref_args, sasrec_params_from_torch, t2n)
from idvs.morec_tpu.models.model import RecModel
from idvs.morec_tpu.train.special_eval import (eval_cold, eval_new,
                                               read_behaviors_special)

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")

CPU = torch.device("cpu")
ITEM_NUM, L, D, HEADS, BLOCKS = 30, 8, 16, 2, 2
EVAL_BS = 4


def _load_ref_special(monkeypatch, tag: str):
    pkg = load_ref_package("inbatch_sasrec_e2e_text", "data_utils", tag)
    pkg_name = f"_refpkg_data_utils_{tag}"
    monkeypatch.setitem(sys.modules, "data_utils", pkg)
    monkeypatch.setitem(sys.modules, "data_utils.dataset",
                        sys.modules[f"{pkg_name}.dataset"])
    path = os.path.join(REF_ROOT, "inbatch_sasrec_e2e_text", "data_utils",
                        "special.py")
    spec = importlib.util.spec_from_file_location(f"{pkg_name}.special", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg_name}.special"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_special_files(tmp_path, rng):
    """Cold users target existing catalog items; new users target items that
    exist only in the 'before' universe (reference special.py:44-94)."""
    name = lambda k: f"i{k}"
    cold_lines, new_lines = [], []
    for u in range(9):   # 9 % EVAL_BS != 0 -> sampler pad leg exercised
        n = int(rng.integers(3, L + 2))
        seq = rng.integers(1, ITEM_NUM + 1, size=n)
        cold_lines.append(f"u{u}\t" + " ".join(name(k) for k in seq))
    before_extra = list(range(ITEM_NUM + 1, ITEM_NUM + 6))
    for u in range(7):
        n = int(rng.integers(2, L + 1))
        hist = rng.integers(1, ITEM_NUM + 1, size=n)
        tgt = before_extra[int(rng.integers(0, len(before_extra)))]
        new_lines.append(f"u{u}\t" + " ".join(name(k) for k in hist)
                         + f" {name(tgt)}")
    cold = tmp_path / "cold.tsv"
    cold.write_text("\n".join(cold_lines) + "\n")
    new = tmp_path / "new.tsv"
    new.write_text("\n".join(new_lines) + "\n")
    item_name_to_id = {name(k): k for k in range(1, ITEM_NUM + 1)}
    before_name_to_id = {name(k): k
                         for k in range(1, ITEM_NUM + 6)}
    before_id_to_dic = {k: f"content{k}" for k in range(1, ITEM_NUM + 6)}
    return str(cold), str(new), item_name_to_id, before_name_to_id, \
        before_id_to_dic


def test_special_eval_chain_parity(monkeypatch, tmp_path):
    special_mod = _load_ref_special(monkeypatch, "specialpar")
    RefModel = load_ref_model_class("inbatch_sasrec_e2e_text", "specialpar")
    rng = np.random.default_rng(31)
    cold_f, new_f, n2i, bn2i, bdic = _write_special_files(tmp_path, rng)
    log = null_logger()

    # --- parsing parity: their read_behaviors_special vs ours, same files ---
    r_cold, r_hcold, r_new, r_hnew, r_content = \
        special_mod.read_behaviors_special(cold_f, new_f, n2i, bdic, bn2i,
                                           log, True)
    o_cold, o_hcold, o_new, o_hnew, o_content = read_behaviors_special(
        cold_f, new_f, n2i, bdic, bn2i, True)
    assert o_cold == r_cold and o_new == r_new
    assert o_content == r_content
    for u in r_hcold:
        np.testing.assert_array_equal(o_hcold[u], t2n(r_hcold[u]))
    for u in r_hnew:
        np.testing.assert_array_equal(o_hnew[u], t2n(r_hnew[u]))

    # --- eval parity on identical weights + embedding tables ---
    args = ref_args(L=L, D=D, HEADS=HEADS, BLOCKS=BLOCKS)
    pop = np.ones(ITEM_NUM + 1)
    torch.manual_seed(32)
    tm = RefModel(args, ITEM_NUM, False, None, pop).to(CPU)
    tm.eval()
    n_new = len(r_content)
    table_np = rng.normal(size=(ITEM_NUM + 1, D)).astype(np.float32)
    new_np = rng.normal(size=(n_new + 1, D)).astype(np.float32)

    ensure_single_rank_group()
    captured = []
    real_concat = special_mod.eval_concat

    def spy_concat(eval_list, sampler):
        out = real_concat(eval_list, sampler)
        captured.append([float(v) for v in out])
        return out

    monkeypatch.setattr(special_mod, "eval_concat", spy_concat)
    special_mod.eval_model_special(
        DDPShim(tm), torch.FloatTensor(table_np), torch.FloatTensor(new_np),
        EVAL_BS, args, ITEM_NUM, log, r_cold, r_hcold, r_new, r_hnew, CPU,
        True)
    (ref_cold_hr, ref_cold_ndcg), (ref_new_hr, ref_new_ndcg) = captured

    model = RecModel(user_tower="sasrec", item_tower="id", item_num=ITEM_NUM,
                     embedding_dim=D, num_attention_heads=HEADS,
                     transformer_block=BLOCKS, max_seq_len=L, drop_rate=0.0)
    ids0 = jnp.ones((2, L + 1), jnp.int32)
    lm0 = jnp.ones((2, L), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids0, None, lm0)
    params["params"]["user_encoder"] = jax.tree.map(
        jnp.asarray, sasrec_params_from_torch(tm.user_encoder))
    table = jnp.asarray(table_np)
    new_embs = jnp.asarray(new_np)

    our_cold_hr, our_cold_ndcg = eval_cold(model, params, table, o_cold,
                                           o_hcold, L, EVAL_BS)
    our_new_hr, our_new_ndcg = eval_new(model, params, table, new_embs,
                                        o_new, o_hnew, L, EVAL_BS)

    np.testing.assert_allclose(our_cold_hr, ref_cold_hr, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(our_cold_ndcg, ref_cold_ndcg,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(our_new_hr, ref_new_hr, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(our_new_ndcg, ref_new_ndcg,
                               rtol=1e-6, atol=1e-6)
