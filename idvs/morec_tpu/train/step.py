"""The jit-compiled, mesh-sharded train step.

Replaces the reference's DDP + AMP loop (inbatch_sasrec_e2e_text/run.py:210-256):
- one process, shard_map over the 'data' mesh axis (batch sharded, params
  replicated); gradient pmean rides ICI exactly where DDP's allreduce sat in
  backward (run.py:245)
- bf16 compute on TPU needs no GradScaler; master params stay f32
- loss semantics: per-shard mean over valid rows, pmean'd across shards =
  DDP's mean-of-per-rank-means
- `gather_negatives` extension: in-batch CE candidates are all-gathered
  across the data axis so the softmax width scales with chip count

The modality catalog (tokenized text rows / cached two-stage embeddings) is
device-resident and gathered BY ID inside the step — hosts only ship (B, S)
int32 ids per step, eliminating the reference's per-batch H2D content copies
(run.py:233-234). Vision end2end ships decoded images via batch['content'].
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.losses import bce_dssm_loss, bce_sasrec_loss, inbatch_debiased_ce
from .state import TrainState

AXIS = "data"


def _gather_content(item_content, flat_ids):
    if item_content is None:
        return None
    return item_content[flat_ids]


def make_train_step(model, cfg, tx, mesh: Mesh,
                    item_content=None,
                    log_pop=None) -> Callable[[TrainState, Dict[str, Any]], tuple]:
    """Build the compiled train step for the configured variant.

    item_content: device-resident catalog (replicated), or None (pure-ID /
                  per-batch content).
    log_pop:      (item_num+1,) log popularity (in-batch CE only).
    """
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    n_shards = mesh.devices.size

    def local_loss(params, batch, rng):
        if cfg.user_tower == "dssm":
            users, items, labels = batch["users"], batch["items"], batch["labels"]
            B, N = items.shape
            content = batch.get("content")
            if content is None:
                content = _gather_content(item_content, items.reshape(-1))
            ivec = model.apply(params, items.reshape(-1), content, False,
                               method="item_embs", rngs={"dropout": rng})
            ivec = ivec.reshape(B, N, cfg.embedding_dim)
            uvec = model.apply(params, users, False,
                               method="user_vec", rngs={"dropout": rng})
            return bce_dssm_loss(uvec, ivec, labels)

        ids, lm = batch["ids"], batch["log_mask"]
        B, S = ids.shape
        content = batch.get("content")
        if content is None:
            content = _gather_content(item_content, ids.reshape(-1))
        if cfg.loss == "bce":
            neg_ids = batch["neg_ids"]
            neg_content = batch.get("neg_content")
            if neg_content is None:
                neg_content = _gather_content(item_content, neg_ids.reshape(-1))
            all_ids = jnp.concatenate([ids.reshape(-1), neg_ids.reshape(-1)])
            all_content = (None if content is None else
                           jnp.concatenate([content, neg_content]))
            embs = model.apply(params, all_ids, all_content, False,
                               method="item_embs", rngs={"dropout": rng})
            pos_embs = embs[:B * S].reshape(B, S, cfg.embedding_dim)
            neg_embs = embs[B * S:].reshape(B, S, cfg.embedding_dim)
            uv = model.apply(params, pos_embs[:, :-1], lm, False,
                             method="user_states", rngs={"dropout": rng})
            # targets = next positives; negatives sit at transition slots
            # (bce_text/main-end2end/model/model.py:39-41)
            return bce_sasrec_loss(uv, pos_embs[:, 1:], neg_embs[:, :-1], lm)

        # in-batch debiased CE
        embs = model.apply(params, ids.reshape(-1), content, False,
                           method="item_embs", rngs={"dropout": rng})
        embs = embs.reshape(B, S, cfg.embedding_dim)
        uv = model.apply(params, embs[:, :-1].astype(compute_dtype), lm, False,
                         method="user_states", rngs={"dropout": rng})
        return inbatch_debiased_ce(
            uv, embs, ids, lm, log_pop[ids],
            axis_name=AXIS if cfg.gather_negatives else None,
            gather_negatives=cfg.gather_negatives)

    single_device = n_shards == 1

    def _apply_updates(state, loss, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    if single_device:
        # Plain jit: identical semantics to the 1-shard shard_map (pmean of
        # one shard is identity; all_gather is identity), but avoids the
        # shard_map dispatch overhead, which is pathological on the tunneled
        # single-chip platform (~600ms/call vs ~3ms measured).
        def single_step(state: TrainState, batch):
            rng = jax.random.fold_in(state.dropout_rng, state.step)

            def loss1(params, batch, rng):
                if cfg.loss == "inbatch_ce" and cfg.user_tower != "dssm":
                    # gather over a 1-axis is identity: reuse the local path
                    ids, lm = batch["ids"], batch["log_mask"]
                    content = batch.get("content")
                    if content is None:
                        content = _gather_content(item_content, ids.reshape(-1))
                    B, S = ids.shape
                    embs = model.apply(params, ids.reshape(-1), content, False,
                                       method="item_embs", rngs={"dropout": rng})
                    embs = embs.reshape(B, S, cfg.embedding_dim)
                    uv = model.apply(params, embs[:, :-1].astype(compute_dtype),
                                     lm, False, method="user_states",
                                     rngs={"dropout": rng})
                    return inbatch_debiased_ce(uv, embs, ids, lm, log_pop[ids])
                return local_loss(params, batch, rng)

            loss, grads = jax.value_and_grad(loss1)(state.params, batch, rng)
            return _apply_updates(state, loss, grads)

        return jax.jit(single_step, donate_argnums=(0,))

    def sharded_step(state: TrainState, batch):
        rng = jax.random.fold_in(state.dropout_rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
        loss, grads = jax.value_and_grad(local_loss)(state.params, batch, rng)
        grads = jax.lax.pmean(grads, AXIS)      # == DDP allreduce (run.py:245)
        loss = jax.lax.pmean(loss, AXIS)
        return _apply_updates(state, loss, grads)

    batch_spec = P(AXIS)
    mapped = jax.shard_map(
        sharded_step, mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))
