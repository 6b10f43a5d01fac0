"""Full-catalog evaluation, device-side and mesh-sharded.

Replaces the reference eval path (inbatch_sasrec_e2e_text/data_utils/
metrics.py:60-107):
- item-embedding inference over the catalog in fixed-size jitted chunks,
  sharded over the mesh's 'data' axis (replaces the rank-sharded
  get_item_embeddings, metrics.py:60-74 + dataset.py:68-94 — every chip
  encodes a slice of each chunk)
- user scoring: ONE batched jit — SASRec last-position state, (B, I+1)
  catalog matmul, history scatter to -inf, rank-of-target, HR@10/nDCG@10
  (replaces the per-user Python loop, metrics.py:90-102), user batches
  sharded P('data')
- aggregation: padding users are masked out exactly, reproducing
  SequentialDistributedSampler's pad-then-truncate semantics
  (dataset.py:68-94, metrics.py:33-46) without any collective on the host
- the host loop stages the NEXT batch's H2D transfer on a worker thread
  while the device scores the current one
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.vision_loader import Prefetcher
from ..ops.metrics import hit_and_ndcg, masked_catalog_scores, target_rank


def compute_item_embeddings(model, params, item_num: int,
                            item_content: Optional[jnp.ndarray],
                            embedding_dim: int,
                            batch_size: int = 512,
                            mesh: Optional[Mesh] = None,
                            content_fn=None,
                            rng_seed: int = 0) -> jnp.ndarray:
    """Run the item tower over ids 0..item_num -> (item_num+1, D) table.

    On a mesh every chunk's ids (and host-fetched content) are sharded
    P('data'), so the catalog-through-encoder pass — the dominant eval cost —
    runs data-parallel across all chips (the reference shards this work
    across ranks via ItemsDataset batches, metrics.py:60-74).

    content_fn: optional host callback ids -> per-chunk content (vision
    images from the record store); otherwise content is gathered from the
    device-resident catalog matrix (or None for pure-ID towers).
    """
    total = item_num + 1
    n_shards = 1 if mesh is None else int(mesh.devices.size)
    # global chunk: batch_size per shard, like the reference's per-rank
    # test_batch_size (run.py:262 uses 512/rank)
    chunk_bs = batch_size * n_shards
    padded = ((total + chunk_bs - 1) // chunk_bs) * chunk_bs
    # fixed rng: MAE towers mask patches stochastically even at eval (HF
    # ViTMAEModel behavior, kept by the reference); seed it for determinism
    rngs = {"masking": jax.random.PRNGKey(rng_seed)}

    if mesh is None or n_shards == 1:
        shard = jnp.asarray
    else:
        sh = NamedSharding(mesh, P("data"))
        shard = lambda x: jax.device_put(np.asarray(x), sh)

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
    for start in range(0, padded, chunk_bs):
        ids = np.arange(start, start + chunk_bs, dtype=np.int32)
        ids = np.minimum(ids, item_num)  # pad tail with the last id
        if content_fn is not None:
            content = content_fn(ids)
            chunk = chunk_with_content(shard(ids), shard(content))
        else:
            chunk = chunk_from_catalog(shard(ids))
        out[start:start + chunk_bs] = np.asarray(chunk)
    table = jnp.asarray(out[:total])
    if mesh is not None:
        table = jax.device_put(table, NamedSharding(mesh, P()))
    return table


def make_eval_step(model, user_tower: str = "sasrec", topk: int = 10):
    """One jitted eval step over a user batch.

    Returns per-user (hit, ndcg, valid) float32 vectors — already zeroed on
    padding users — so the caller can accumulate exact means (and tests can
    compare per-user values against the reference's metrics_topK outputs).
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
        return hit * v, ndcg * v, v

    return step


def evaluate(model, params, item_table, eval_batches, mesh: Optional[Mesh] = None,
             user_tower: str = "sasrec", topk: int = 10,
             per_user: bool = False):
    """Mean HR@topk and nDCG@topk over all true users.

    per_user=True additionally returns (hits, ndcgs) np arrays truncated to
    the true user count — the exact analogue of the reference's stacked
    eval_all_user tensors before eval_concat's mean (metrics.py:103-106).
    """
    step = make_eval_step(model, user_tower, topk)
    if mesh is None:
        pack = lambda raw: tuple(jnp.asarray(x) for x in raw)
    else:
        n_shards = int(mesh.devices.size)
        sh = NamedSharding(mesh, P("data"))

        def pack(raw):
            n = len(raw[-1])
            pad = (-n) % n_shards   # rows must divide over the 'data' axis
            if pad:
                raw = [np.concatenate([np.asarray(x)] +
                                      [np.asarray(x)[-1:]] * pad) for x in raw]
                raw[-1][n:] = False  # padding users never count
            return tuple(jax.device_put(np.asarray(x), sh) for x in raw)
    s_hit = s_ndcg = s_n = 0.0
    hits, ndcgs = [], []
    # H2D staging of the next batch overlaps the current batch's scoring
    for ids, lm, target, history, valid in Prefetcher(iter(eval_batches), pack):
        h, n, v = step(params, item_table, ids, lm, target, history, valid)
        h, n, v = np.asarray(h), np.asarray(n), np.asarray(v)
        s_hit += float(h.sum()); s_ndcg += float(n.sum()); s_n += float(v.sum())
        if per_user:
            keep = v > 0
            hits.append(h[keep]); ndcgs.append(n[keep])
    hr = s_hit / max(s_n, 1.0)
    nd = s_ndcg / max(s_n, 1.0)
    if per_user:
        return hr, nd, np.concatenate(hits), np.concatenate(ndcgs)
    return hr, nd
