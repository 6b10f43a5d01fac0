"""Full-catalog evaluation, device-side and mesh-sharded.

Replaces the reference eval path (inbatch_sasrec_e2e_text/data_utils/
metrics.py:60-107):
- item-embedding inference over the catalog in fixed-size jitted chunks
  (get_item_embeddings, metrics.py:60-74)
- user scoring: ONE batched jit — SASRec last-position state, (B, I+1)
  catalog matmul, history scatter to -inf, rank-of-target, HR@10/nDCG@10
  (replaces the per-user Python loop, metrics.py:90-102)
- aggregation: padding users are masked out exactly, reproducing
  SequentialDistributedSampler's pad-then-truncate semantics
  (dataset.py:68-94, metrics.py:33-46) without any collective on the host
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.metrics import hit_and_ndcg, masked_catalog_scores, target_rank


def compute_item_embeddings(model, params, item_num: int,
                            item_content: Optional[jnp.ndarray],
                            embedding_dim: int,
                            batch_size: int = 512,
                            mesh: Optional[Mesh] = None,
                            content_fn=None,
                            rng_seed: int = 0) -> jnp.ndarray:
    """Run the item tower over ids 0..item_num -> (item_num+1, D) table.

    content_fn: optional host callback ids -> per-chunk content (vision
    images from the record store); otherwise content is gathered from the
    device-resident catalog matrix (or None for pure-ID towers).
    """
    total = item_num + 1
    padded = ((total + batch_size - 1) // batch_size) * batch_size
    # fixed rng: MAE towers mask patches stochastically even at eval (HF
    # ViTMAEModel behavior, kept by the reference); seed it for determinism
    rngs = {"masking": jax.random.PRNGKey(rng_seed)}

    @jax.jit
    def chunk_from_catalog(ids):
        content = None if item_content is None else item_content[ids]
        return model.apply(params, ids, content, True, method="item_embs",
                           rngs=rngs)

    @jax.jit
    def chunk_with_content(ids, content):
        return model.apply(params, ids, content, True, method="item_embs",
                           rngs=rngs)

    out = np.zeros((padded, embedding_dim), dtype=np.float32)
    for start in range(0, padded, batch_size):
        ids = np.arange(start, start + batch_size, dtype=np.int32)
        ids = np.minimum(ids, item_num)  # pad tail with the last id
        if content_fn is not None:
            content = content_fn(ids)
            chunk = chunk_with_content(jnp.asarray(ids), jnp.asarray(content))
        else:
            chunk = chunk_from_catalog(jnp.asarray(ids))
        out[start:start + batch_size] = np.asarray(chunk)
    table = jnp.asarray(out[:total])
    if mesh is not None:
        table = jax.device_put(table, NamedSharding(mesh, P()))
    return table


def make_eval_step(model, user_tower: str = "sasrec", topk: int = 10):
    """One jitted eval step over a user batch.

    Returns (sum_hit, sum_ndcg, count) so the caller accumulates exact means.
    """

    @jax.jit
    def step(params, item_table, ids, log_mask, target, history, valid):
        if user_tower == "sasrec":
            input_embs = item_table[ids]                     # (B, L, D)
            states = model.apply(params, input_embs, log_mask, True,
                                 method="user_states")
            uvec = states[:, -1]                             # (B, D) last position
        else:  # dssm: ids are user ids
            uvec = model.apply(params, ids, True, method="user_vec")
        scores = masked_catalog_scores(uvec, item_table, history)
        rank = target_rank(scores, target)
        hit, ndcg = hit_and_ndcg(rank, topk)
        v = valid.astype(jnp.float32)
        return (hit * v).sum(), (ndcg * v).sum(), v.sum()

    return step


def evaluate(model, params, item_table, eval_batches, mesh: Optional[Mesh] = None,
             user_tower: str = "sasrec", topk: int = 10) -> Tuple[float, float]:
    """Mean HR@topk and nDCG@topk over all true users."""
    step = make_eval_step(model, user_tower, topk)
    shard = (lambda x: x) if mesh is None else (
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))))
    s_hit = s_ndcg = s_n = 0.0
    for ids, lm, target, history, valid in eval_batches:
        h, n, c = step(params, item_table, shard(jnp.asarray(ids)),
                       shard(jnp.asarray(lm)), shard(jnp.asarray(target)),
                       shard(jnp.asarray(history)), shard(jnp.asarray(valid)))
        s_hit += float(h); s_ndcg += float(n); s_n += float(c)
    return s_hit / max(s_n, 1.0), s_ndcg / max(s_n, 1.0)
