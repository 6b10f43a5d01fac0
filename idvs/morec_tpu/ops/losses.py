"""The three reference losses as pure, jit-safe functions.

- in-batch debiased (logQ popularity-corrected) cross-entropy
  (reference inbatch_sasrec_e2e_text/model/model.py:31-69, math README.md:105-107)
- BCE with per-position sampled negatives for SASRec
  (reference bce_text/main-end2end/model/model.py:30-51)
- BCE over (1+neg) candidates for DSSM
  (reference bce_text/main-end2end(DSSM)/model/model.py:32-43)

TPU-first departures from the reference implementation (same math):
- the O(B^2 L^2) Python rejection loop is one vectorized comparison
- logits accumulate in float32 on the MXU regardless of input dtype
- optional `gather_negatives`: all-gather item embeddings across the data
  axis so the softmax sees the GLOBAL batch's negatives (flag-gated
  behavioral extension; the reference's DDP softmax is per-GPU only,
  model.py:49 computed pre-allreduce).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .masking import MASK_VAL, label_columns


def _log_softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                    weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted-mean softmax CE: mean over rows where weights != 0."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = (weights != 0).astype(logits.dtype)
    return -(tgt * w).sum() / jnp.maximum(w.sum(), 1.0)


def inbatch_debiased_ce(user_vec: jnp.ndarray,
                        item_embs: jnp.ndarray,
                        item_ids: jnp.ndarray,
                        log_mask: jnp.ndarray,
                        log_pop: jnp.ndarray,
                        axis_name: Optional[str] = None,
                        gather_negatives: bool = False) -> jnp.ndarray:
    """In-batch debiased cross-entropy (reference model.py:31-69).

    Args:
      user_vec:  (B, L, D) user states at every position.
      item_embs: (B, S, D), S = L+1 — embeddings of the padded item sequence
                 (the softmax's score/candidate embeddings).
      item_ids:  (B, S) int ids (0 = padding).
      log_mask:  (B, L) float 0/1 validity of each transition.
      log_pop:   (B, S) log popularity of each item (log_pop of id 0 is 0,
                 pop_prob_list[0] = 1 sentinel, preprocess.py:76).
      axis_name: data-parallel mesh axis (inside shard_map) or None.
      gather_negatives: if True (requires axis_name), candidates are the
                 global batch's items — effective softmax width scales with
                 the number of chips.

    Returns scalar loss (local mean over valid rows; callers running under
    shard_map should pmean it, matching DDP's gradient averaging).
    """
    B, L, D = user_vec.shape
    S = L + 1
    f32 = jnp.float32

    # candidate (column) side, possibly gathered across the DP axis
    cand_embs, cand_ids = item_embs, item_ids
    cand_colmask = jnp.concatenate(
        [log_mask, jnp.ones((B, 1), log_mask.dtype)], axis=1)     # (B, S)
    cand_logpop = log_pop
    label_off = 0
    if gather_negatives:
        assert axis_name is not None
        cand_embs = jax.lax.all_gather(item_embs, axis_name, tiled=True)     # (W*B, S, D)
        cand_ids = jax.lax.all_gather(item_ids, axis_name, tiled=True)
        cand_colmask = jax.lax.all_gather(cand_colmask, axis_name, tiled=True)
        cand_logpop = jax.lax.all_gather(cand_logpop, axis_name, tiled=True)
        label_off = jax.lax.axis_index(axis_name) * B * S

    WB = cand_embs.shape[0]
    flat_cand = cand_embs.reshape(WB * S, D)
    flat_user = user_vec.reshape(B * L, D)

    # (B*L, WB*S) similarity on the MXU, f32 accumulation
    logits = jnp.dot(flat_user, flat_cand.T, preferred_element_type=f32)
    logits = logits - cand_logpop.reshape(-1)[None, :].astype(f32)  # debias (model.py:50)

    # padding-column mask (model.py:51-52)
    colmask = cand_colmask.reshape(-1)
    logits = jnp.where(colmask[None, :] == 0, MASK_VAL, logits)

    # same-user rejection (model.py:55-63), vectorized.
    # reject[i, c] = candidate c's id appears in LOCAL user i's id list.
    flat_cand_ids = cand_ids.reshape(-1)
    reject = jnp.any(item_ids[:, :, None] == flat_cand_ids[None, None, :],
                     axis=1)                                        # (B, WB*S)
    # label exemption: column label_off + i*S + j + 1 for row (i, j)
    lab = label_columns(B, L) + label_off                           # (B, L)
    lab_onehot = jax.nn.one_hot(lab, WB * S, dtype=bool)            # (B, L, WB*S)
    reject3 = jnp.logical_and(reject[:, None, :], jnp.logical_not(lab_onehot))
    logits = logits.reshape(B, L, WB * S)
    logits = jnp.where(reject3, MASK_VAL, logits)

    return _log_softmax_ce(logits.reshape(B * L, -1),
                           lab.reshape(-1),
                           log_mask.reshape(-1))


def bce_sasrec_loss(user_vec: jnp.ndarray,
                    pos_embs: jnp.ndarray,
                    neg_embs: jnp.ndarray,
                    log_mask: jnp.ndarray) -> jnp.ndarray:
    """BCE over per-position (pos, neg) dot scores (reference
    bce_text/main-end2end/model/model.py:43-51).

    user_vec: (B, L, D) user states; pos_embs/neg_embs: (B, L, D) target
    embeddings at positions 1..L / sampled negatives; log_mask: (B, L).
    Loss = mean BCE(pos, 1) over valid + mean BCE(neg, 0) over valid.
    """
    f32 = jnp.float32
    pos_score = jnp.sum(user_vec.astype(f32) * pos_embs.astype(f32), axis=-1)
    neg_score = jnp.sum(user_vec.astype(f32) * neg_embs.astype(f32), axis=-1)
    w = (log_mask != 0).astype(f32)
    n = jnp.maximum(w.sum(), 1.0)
    # BCEWithLogits: softplus(-x) for label 1, softplus(x) for label 0
    pos_loss = (jax.nn.softplus(-pos_score) * w).sum() / n
    neg_loss = (jax.nn.softplus(neg_score) * w).sum() / n
    return pos_loss + neg_loss


def bce_dssm_loss(user_vec: jnp.ndarray,
                  item_vecs: jnp.ndarray,
                  labels: jnp.ndarray) -> jnp.ndarray:
    """DSSM pointwise BCE (reference bce_text/main-end2end(DSSM)/model/model.py:40-43).

    user_vec: (B, D); item_vecs: (B, 1+neg, D); labels: (B, 1+neg) in {0,1}.
    """
    f32 = jnp.float32
    scores = jnp.einsum("bnd,bd->bn", item_vecs.astype(f32), user_vec.astype(f32))
    labels = labels.astype(f32)
    # BCEWithLogits, mean over all elements
    per = jax.nn.softplus(scores) - scores * labels
    return per.mean()
