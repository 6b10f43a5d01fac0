"""Cold-start / new-item evaluation (reference data_utils/special.py:44-214).

- cold: users whose target item exists in the training catalog but was cold
  (evaluated against the regular catalog with custom histories)
- new: users whose target item is UNSEEN — its embedding comes fresh from the
  modality encoder and is appended to the catalog per user before ranking
  (special.py:196-210). Device-side: the appended column is just one extra
  dot product, so the whole thing stays one batched jit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import EvalBatches, pad_user_sequences
from ..ops.metrics import hit_and_ndcg, masked_catalog_scores
from .evaluate import evaluate


def read_behaviors_special(file_for_cold: str, file_for_new: Optional[str],
                           item_name_to_id: Dict[str, int],
                           before_item_id_to_dic: Dict[int, object],
                           before_item_name_to_id: Dict[str, int],
                           use_modal: bool, log=None):
    """Returns (seqs_for_cold, history_for_cold, seqs_for_new,
    history_for_new, new_item_id_to_content) — reference special.py:44-94."""
    seqs_for_cold, history_for_cold = {}, {}
    uid = 0
    with open(file_for_cold) as f:
        for line in f:
            names = line.strip("\n").split("\t")[1].split(" ")
            seq = [item_name_to_id[n] for n in names]
            seqs_for_cold[uid] = seq
            history_for_cold[uid] = np.asarray(seq[:-1], dtype=np.int64)
            uid += 1

    if not use_modal or file_for_new is None:
        return seqs_for_cold, history_for_cold, None, None, None

    new_item_id = 1
    new_item_id_to_content = {}
    item_id_before_to_new = {}
    seqs_for_new, history_for_new = {}, {}
    uid = 0
    with open(file_for_new) as f:
        for line in f:
            names = line.strip("\n").split("\t")[1].split(" ")
            new_name = names[-1]
            before_id = before_item_name_to_id[new_name]
            if before_id not in item_id_before_to_new:
                item_id_before_to_new[before_id] = new_item_id
                new_item_id_to_content[new_item_id] = before_item_id_to_dic[before_id]
                new_item_id += 1
            target_id = item_id_before_to_new[before_id]
            seqs_input = [item_name_to_id[n] for n in names[:-1]]
            seqs_for_new[uid] = seqs_input + [target_id]
            history_for_new[uid] = np.asarray(seqs_input, dtype=np.int64)
            uid += 1
    return (seqs_for_cold, history_for_cold, seqs_for_new, history_for_new,
            new_item_id_to_content)


def _pad_histories(hist: Dict[int, np.ndarray], width: int) -> np.ndarray:
    out = np.zeros((len(hist), width), dtype=np.int64)
    for row, uid in enumerate(sorted(hist.keys())):
        h = hist[uid]
        out[row, :len(h)] = h[:width]
    return out


def eval_cold(model, params, item_table, seqs_for_cold, history_for_cold,
              max_seq_len: int, batch_size: int, mesh=None,
              topk: int = 10) -> Tuple[float, float]:
    """Cold eval = standard full-catalog eval over the cold users
    (special.py:151-181)."""
    seqs, lens = pad_user_sequences(seqs_for_cold, max_seq_len + 1)
    hist = _pad_histories(history_for_cold, max_seq_len + 2)
    batches = EvalBatches(seqs, lens, max_seq_len, batch_size, hist)
    return evaluate(model, params, item_table, batches, mesh, "sasrec", topk)


def make_new_item_eval_step(model, topk: int = 10):
    @jax.jit
    def step(params, item_table, new_embs, ids, log_mask, new_target,
             history, valid):
        input_embs = item_table[ids]
        states = model.apply(params, input_embs, log_mask, True,
                             method="user_states")
        uvec = states[:, -1]
        scores = masked_catalog_scores(uvec, item_table, history)  # (B, I+1)
        # per-user appended new-item column (special.py:203-205)
        tgt_emb = new_embs[new_target]                              # (B, D)
        tgt_score = jnp.sum(uvec.astype(jnp.float32)
                            * tgt_emb.astype(jnp.float32), axis=-1)
        rank = (scores[:, 1:] > tgt_score[:, None]).sum(axis=1) + 1
        hit, ndcg = hit_and_ndcg(rank, topk)
        v = valid.astype(jnp.float32)
        return (hit * v).sum(), (ndcg * v).sum(), v.sum()

    return step


def eval_new(model, params, item_table, new_item_embs, seqs_for_new,
             history_for_new, max_seq_len: int, batch_size: int,
             topk: int = 10) -> Tuple[float, float]:
    """New-item eval: the target's embedding is appended per user
    (special.py:182-214). seqs_for_new values end with the NEW-item id, which
    indexes new_item_embs, not the catalog."""
    # split inputs (catalog ids) from targets (new-item ids)
    inputs = {u: s[:-1] for u, s in seqs_for_new.items()}
    targets = np.asarray([seqs_for_new[u][-1]
                          for u in sorted(seqs_for_new.keys())], np.int32)
    seqs, lens = pad_user_sequences(inputs, max_seq_len)  # inputs only, len L
    hist = _pad_histories(history_for_new, max_seq_len + 2)
    n = seqs.shape[0]
    total = ((n + batch_size - 1) // batch_size) * batch_size
    step = make_new_item_eval_step(model, topk)
    L = max_seq_len
    s_hit = s_ndcg = s_n = 0.0
    pos = np.arange(L, dtype=np.int32)[None, :]
    for i in range(0, total, batch_size):
        idx = np.minimum(np.arange(i, i + batch_size), n - 1)
        rows = seqs[idx]
        head = (L - lens[idx])[:, None]
        lm = (pos >= head).astype(np.float32)
        valid = np.arange(i, i + batch_size) < n
        h, nd, c = step(params, item_table, new_item_embs,
                        jnp.asarray(rows.astype(np.int32)), jnp.asarray(lm),
                        jnp.asarray(targets[idx]), jnp.asarray(hist[idx]),
                        jnp.asarray(valid))
        s_hit += float(h); s_ndcg += float(nd); s_n += float(c)
    return s_hit / max(s_n, 1.0), s_ndcg / max(s_n, 1.0)
