"""Device-side full-catalog retrieval metrics.

Replaces the reference's per-user Python scoring loop
(inbatch_sasrec_e2e_text/data_utils/metrics.py:90-102) with one batched,
jit-compiled computation:

    scores  = user_emb @ item_embs.T          (B, I+1) MXU matmul
    history -> -inf scatter                   (metrics.py:99-100)
    drop padding column 0                     (metrics.py:101 'score[1:]')
    rank of target                            (metrics.py:49-57)
    HR@K = rank <= K ; nDCG@K = 1/log2(rank+1)

Rank semantics: the reference sorts descending and takes the target's
1-based position; with continuous scores ties are measure-zero, so
rank = 1 + #{j : score_j > score_target} is equivalent (and O(I) instead of
O(I log I)).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def masked_catalog_scores(user_emb: jnp.ndarray,
                          item_embs: jnp.ndarray,
                          history: jnp.ndarray) -> jnp.ndarray:
    """(B, D) x (I+1, D) -> (B, I+1) scores with history positions at -inf.

    history: (B, H) int ids padded with 0; padding clobbers column 0, which is
    the padding item and gets dropped before ranking anyway (metrics.py:101).
    """
    f32 = jnp.float32
    scores = jnp.dot(user_emb.astype(f32), item_embs.astype(f32).T,
                     preferred_element_type=f32)             # (B, I+1)
    B = scores.shape[0]
    rows = jnp.arange(B)[:, None]
    return scores.at[rows, history].set(-jnp.inf)


def target_rank(scores: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1-based rank of `target` (id >= 1) among columns 1..I of `scores`.

    scores: (B, I+1) history-masked; target: (B,) int ids.
    """
    tgt_score = jnp.take_along_axis(scores, target[:, None], axis=1)  # (B, 1)
    # count over real items only (drop padding column 0)
    greater = (scores[:, 1:] > tgt_score).sum(axis=1)
    return greater + 1


def hit_and_ndcg(rank: jnp.ndarray, topk: int = 10
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HR@K and nDCG@K per user (reference metrics.py:49-57)."""
    hit = (rank <= topk).astype(jnp.float32)
    ndcg = hit / (jnp.log2(rank.astype(jnp.float32) + 1.0))
    return hit, ndcg
