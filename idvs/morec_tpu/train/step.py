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
- BatchNorm (ResNet towers): running stats live in the 'batch_stats'
  collection of TrainState.variables and update inside the step; with a
  multi-device mesh the norm's axis_name='data' gives cross-replica batch
  statistics — the reference's SyncBatchNorm (run.py:128)

The modality catalog (tokenized text rows / cached two-stage embeddings) is
device-resident and gathered BY ID inside the step — hosts only ship (B, S)
int32 ids per step, eliminating the reference's per-batch H2D content copies
(run.py:233-234). Vision end2end ships decoded images via batch['content'].
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.losses import bce_dssm_loss, bce_sasrec_loss, inbatch_debiased_ce
from .state import TrainState

AXIS = "data"


def make_train_step(model, cfg, tx, mesh: Mesh,
                    item_content=None,
                    log_pop=None,
                    n_steps: int = 1) -> Callable[[TrainState, Dict[str, Any]], tuple]:
    """Build the compiled train step for the configured variant.

    item_content: device-resident catalog (replicated), or None (pure-ID /
                  per-batch content).
    log_pop:      (item_num+1,) log popularity (in-batch CE only).
    n_steps:      steps per dispatch. >1 returns a fn taking batches whose
                  leaves carry a leading (n_steps,) axis and running them
                  sequentially in ONE compiled program (fully-unrolled
                  lax.scan), returning (state, (n_steps,) losses). Identical
                  update semantics to n_steps successive calls — it only
                  amortizes the per-launch dispatch cost (~0.7 ms/step
                  measured on the tunneled platform), which matters when
                  steps are tiny: IDRec B=256 32.7k -> 38.9k samples/s/chip
                  at n_steps=8 (PARITY.md IDRec bound). unroll=True matters:
                  a scanned (rolled) body re-pays the dispatch-sized cost in
                  the scan state machine and wins nothing (measured).
    """
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    n_shards = mesh.devices.size
    single_device = n_shards == 1

    def _gather_content(batch, key_ids, key_content):
        content = batch.get(key_content)
        if content is not None:
            return content
        if item_content is None:
            return None
        return item_content[batch[key_ids].reshape(-1)]

    def _split(variables):
        aux = {k: v for k, v in variables.items() if k != "params"}
        return variables["params"], aux

    def _cast_compute(tree):
        """bf16 compute policy: all f32 params are cast to bf16 for the
        forward/backward (MXU-native); attention logits, softmaxes, and loss
        logits stay f32 via explicit preferred_element_type in the modules.
        Master params stay f32 in the optimizer — the reference's AMP
        autocast (run.py:242) with bf16 instead of fp16 (no GradScaler).
        Set --compute_dtype float32 for bit-parity runs."""
        if compute_dtype == jnp.float32:
            return tree
        return jax.tree.map(
            lambda p: p.astype(compute_dtype)
            if p.dtype == jnp.float32 else p, tree)

    def _item_embs(trainable, aux, flat_ids, content, rngs, mutable):
        variables = {"params": trainable, **aux}
        if mutable:
            embs, mut = model.apply(variables, flat_ids, content, False,
                                    method="item_embs", rngs=rngs,
                                    mutable=["batch_stats"])
            return embs, {**aux, **mut}

        def fwd(variables, flat_ids, content):
            return model.apply(variables, flat_ids, content, False,
                               method="item_embs", rngs=rngs)

        chunk = cfg.encoder_chunk
        if chunk and content is not None and flat_ids.shape[0] % chunk == 0:
            # microbatch the encoder over item chunks: activation memory is
            # capped at one chunk (remat'd per chunk). Lets 224px vision
            # towers train at the reference batch sizes on 16 GB HBM.
            # Unrolled python loop, NOT lax.scan: the scan's while-loop
            # state machine + dynamic input slices cost ~35% extra
            # wall-clock at k=4 on v5e (traced: the two scan whiles were
            # the entire step; straight-line chunks overlap DMA/compute
            # across chunk boundaries). Falls back to a scan for large k
            # to bound compile time.
            k = flat_ids.shape[0] // chunk
            # save the windowed-attention kernel outputs across the remat
            # boundary (models/swin.py checkpoint_name 'swin_attn'): the
            # backward recompute then skips re-running the attention
            # kernels (~1/3 of their cost at +~250 MB/chunk residency).
            # Encoders without that name (text) save nothing — identical
            # to a plain jax.checkpoint.
            policy = jax.checkpoint_policies.save_only_these_names(
                "swin_attn")
            ck_fwd = jax.checkpoint(fwd, policy=policy)
            if k <= cfg.encoder_chunk_unroll:
                outs = [ck_fwd(variables, flat_ids[i * chunk:(i + 1) * chunk],
                               content[i * chunk:(i + 1) * chunk])
                        for i in range(k)]
                return jnp.concatenate(outs, axis=0), aux

            def body(_, xs):
                ids_c, content_c = xs
                return None, ck_fwd(variables, ids_c, content_c)

            _, outs = jax.lax.scan(
                body, None,
                (flat_ids.reshape(k, chunk),
                 content.reshape((k, chunk) + content.shape[1:])))
            return outs.reshape((flat_ids.shape[0],) + outs.shape[2:]), aux

        if cfg.remat_encoder:
            # rematerialize the item-encoder activations in backward: trades
            # FLOPs for HBM, letting B*(S) sequences through large encoders
            # at batch sizes that would otherwise OOM (same saved-attention
            # policy as the chunked path)
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.save_only_these_names(
                    "swin_attn"))
        return fwd(variables, flat_ids, content), aux

    def _as_dropout_key(rng):
        """Dropout key in the configured PRNG impl. The TrainState key (and
        the checkpoint rng slot) stays a threefry key; the per-step rbg key
        is derived from it, so resume determinism is untouched."""
        if cfg.dropout_prng != "rbg":
            return rng
        data = jax.random.bits(rng, (4,), jnp.uint32)
        return jax.random.wrap_key_data(data, impl="rbg")

    def local_loss(trainable, aux, batch, rng, gather: bool, axis):
        """Returns (loss, new_aux)."""
        rngs = {"dropout": _as_dropout_key(rng),
                "masking": jax.random.fold_in(rng, 13)}
        mutable = "batch_stats" in aux
        trainable = _cast_compute(trainable)  # bf16 compute, f32 master

        if cfg.user_tower == "dssm":
            users, items, labels = batch["users"], batch["items"], batch["labels"]
            B, N = items.shape
            content = _gather_content(batch, "items", "content")
            ivec, aux = _item_embs(trainable, aux, items.reshape(-1), content,
                                   rngs, mutable)
            ivec = ivec.reshape(B, N, cfg.embedding_dim)
            uvec = model.apply({"params": trainable, **aux}, users, False,
                               method="user_vec", rngs=rngs)
            return bce_dssm_loss(uvec, ivec, labels), aux

        ids, lm = batch["ids"], batch["log_mask"]
        B, S = ids.shape

        def _encode_slots(flat_ids, content_key):
            """Encode all item slots; with host-side dedup metadata present,
            encode only the unique items and gather back (the reference
            encodes every occurrence — duplicates are pure waste)."""
            if "uniq_ids" in batch:
                uniq = batch["uniq_ids"]
                content = batch.get("uniq_content")
                if content is None and item_content is not None:
                    content = item_content[uniq]
                embs_u, new_aux = _item_embs(trainable, aux, uniq, content,
                                             rngs, mutable)
                return embs_u[batch["inverse"]], new_aux
            content = batch.get(content_key)
            if content is None and item_content is not None:
                content = item_content[flat_ids]
            return _item_embs(trainable, aux, flat_ids, content, rngs, mutable)

        if cfg.loss == "bce":
            if "uniq_ids" in batch:
                embs, aux = _encode_slots(None, None)
            else:
                content = _gather_content(batch, "ids", "content")
                neg_content = _gather_content(batch, "neg_ids", "neg_content")
                all_ids = jnp.concatenate([ids.reshape(-1),
                                           batch["neg_ids"].reshape(-1)])
                all_content = (None if content is None else
                               jnp.concatenate([content, neg_content]))
                embs, aux = _item_embs(trainable, aux, all_ids, all_content,
                                       rngs, mutable)
            pos_embs = embs[:B * S].reshape(B, S, cfg.embedding_dim)
            neg_embs = embs[B * S:].reshape(B, S, cfg.embedding_dim)
            uv = model.apply({"params": trainable, **aux}, pos_embs[:, :-1],
                             lm, False, method="user_states", rngs=rngs)
            # targets = next positives; negatives sit at transition slots
            # (bce_text/main-end2end/model/model.py:39-41)
            return bce_sasrec_loss(uv, pos_embs[:, 1:], neg_embs[:, :-1], lm), aux

        # in-batch debiased CE
        embs, aux = _encode_slots(ids.reshape(-1), "content")
        embs = embs.reshape(B, S, cfg.embedding_dim)
        uv = model.apply({"params": trainable, **aux},
                         embs[:, :-1].astype(compute_dtype), lm, False,
                         method="user_states", rngs=rngs)
        if cfg.use_pallas and not gather:
            from ..ops.pallas.inbatch_ce import fused_inbatch_ce
            loss = fused_inbatch_ce(uv, embs, ids, lm, log_pop[ids],
                                    interpret=jax.default_backend() != "tpu")
        elif cfg.use_pallas and gather:
            from ..ops.pallas.inbatch_ce import fused_inbatch_ce_gathered
            loss = fused_inbatch_ce_gathered(
                uv, embs, ids, lm, log_pop[ids], axis,
                interpret=jax.default_backend() != "tpu")
        else:
            loss = inbatch_debiased_ce(uv, embs, ids, lm, log_pop[ids],
                                       axis_name=axis,
                                       gather_negatives=gather)
        return loss, aux

    def _update(state: TrainState, loss, grads, new_aux):
        trainable, _ = _split(state.params)
        # Keep the optimizer out of the backward matmuls: without this
        # barrier XLA fuses the AdamW update into the dW dots as an epilogue,
        # forcing a transpose-reuse emitter that runs the K=B*S*T contraction
        # at ~23 TFLOPS instead of ~120 (measured v5e, BERT-small geometry).
        grads = jax.lax.optimization_barrier(grads)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        trainable = jax.tree.map(lambda p, u: p + u, trainable, updates)
        return state.replace(step=state.step + 1,
                             params={"params": trainable, **new_aux},
                             opt_state=opt_state), loss

    def _dispatch(raw_step):
        if n_steps == 1:
            return jax.jit(raw_step, donate_argnums=(0,))

        def multi_step(state: TrainState, batches):
            # fully unrolled: the scan while-loop state machine itself costs
            # ~as much as the dispatch it amortizes at small step sizes
            # (measured: scanned n_steps=8 IDRec == n_steps=1 wall clock)
            return jax.lax.scan(raw_step, state, batches, unroll=True)

        return jax.jit(multi_step, donate_argnums=(0,))

    if single_device:
        # Plain jit: identical semantics to a 1-shard shard_map (pmean and
        # all_gather over one shard are identity), but avoids shard_map
        # dispatch overhead, pathological on the tunneled single-chip
        # platform (~600ms/call vs ~3ms measured).
        def single_step(state: TrainState, batch):
            rng = jax.random.fold_in(state.dropout_rng, state.step)
            trainable, aux = _split(state.params)
            (loss, new_aux), grads = jax.value_and_grad(
                local_loss, has_aux=True)(trainable, aux, batch, rng,
                                          False, None)
            return _update(state, loss, grads, new_aux)

        return _dispatch(single_step)

    def sharded_grads(params, step_count, dropout_rng, batch):
        rng = jax.random.fold_in(dropout_rng, step_count)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
        trainable, aux = _split(params)
        (loss, new_aux), grads = jax.value_and_grad(
            local_loss, has_aux=True)(trainable, aux, batch, rng,
                                      cfg.gather_negatives, AXIS)
        grads = jax.lax.pmean(grads, AXIS)      # == DDP allreduce (run.py:245)
        loss = jax.lax.pmean(loss, AXIS)
        # cross-replica running stats (SyncBN parity): per-shard batch stats
        # already pmean'd by the norm's axis_name; running averages now agree
        return loss, grads, new_aux

    mapped = jax.shard_map(
        sharded_grads, mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False)

    # The optimizer update runs OUTSIDE shard_map as plain GSPMD: with the
    # embedding-table AdamW moments stored sharded P('data')
    # (state.shard_table_opt_state), XLA partitions the table update by rows
    # (ZeRO-1) and all-gathers the fresh params once — bit-identical math,
    # n_chips x less moment traffic on the measured IDRec floor.
    zero1 = getattr(cfg, "zero1_table", True) and not single_device

    def sharded_step(state: TrainState, batch):
        loss, grads, new_aux = mapped(state.params, state.step,
                                      state.dropout_rng, batch)
        new_state, loss = _update(state, loss, grads, new_aux)
        if zero1:
            from .state import (constrain_params_replicated,
                                constrain_table_opt_state)
            new_state = new_state.replace(
                params=constrain_params_replicated(new_state.params, mesh),
                opt_state=constrain_table_opt_state(new_state.opt_state,
                                                    mesh))
        return new_state, loss

    # n_steps > 1: scan over the leading batch-group axis; each scan
    # iteration dispatches the shard_map'd grad pass on its (B, ...) slice
    # (slicing happens outside shard_map, so the per-step in_specs are
    # unchanged).
    return _dispatch(sharded_step)
