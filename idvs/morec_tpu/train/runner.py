"""Training/test orchestrator — the reference's run.py / run_test.py
(inbatch_sasrec_e2e_text/run.py:26-352) as one config-driven entry point.

Flow (parity with run.py):
  encoder load + freeze -> data read -> batcher -> model + optimizer ->
  [resume] -> epoch loop { train steps, eval, early stop, save-best } ->
  final report

TPU-first differences:
- one process over a jax.sharding.Mesh (no torch.distributed.launch)
- bf16 instead of AMP/GradScaler
- modality catalog device-resident; ids-only host->device traffic
- eval is jitted and batched (no per-user loop)
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import (BCETrainBatcher, DSSMTrainBatcher, EvalBatches,
                           TrainBatcher, pad_user_sequences)
from ..data.preprocess import (BehaviorData, build_doc_matrix, read_behaviors,
                               read_behaviors_pairs, read_items_text,
                               read_items_tokenized)
from ..models.model import make_model
from ..parallel.mesh import is_coordinator, make_mesh, replicate
from ..utils.logging import (para_and_log, print_metrics,
                             report_time_eval, report_time_train, setuplogger)
from .checkpoint import (epoch_from_name, get_checkpoint, load_checkpoint,
                         save_checkpoint)
from .evaluate import compute_item_embeddings, evaluate
from .state import (TrainState, default_encoder_predicate, make_optimizer,
                    param_labels)
from .step import make_train_step


def _dispatch_groups(batches, k: int):
    """Group a batch stream into lists of k structurally-identical batches
    for multi-step dispatch (--steps_per_dispatch). Batches whose key sets
    differ from the group under construction (dedup-capacity fallback drops
    the uniq keys on overflowing batches) and epoch-tail leftovers are
    yielded as singletons — the caller runs those through the single-step
    program, so update semantics never depend on the grouping."""
    if k <= 1:
        for b in batches:
            yield [b]
        return
    buf = []
    for b in batches:
        if buf and set(b.keys()) != set(buf[0].keys()):
            for one in buf:
                yield [one]
            buf = []
        buf.append(b)
        if len(buf) == k:
            yield buf
            buf = []
    for one in buf:
        yield [one]


def _pad_histories(hist_dict: Dict[int, np.ndarray], width: int) -> np.ndarray:
    n = len(hist_dict)
    out = np.zeros((n, width), dtype=np.int64)
    for row, uid in enumerate(sorted(hist_dict.keys())):
        h = hist_dict[uid]
        out[row, :len(h)] = h[:width]
    return out


class _dssm_eval_batches:
    """DSSM eval: score every (user, target) pair against the catalog
    (reference bce_text/main-end2end(DSSM)/data_utils/metrics.py:93-120).
    Yields the same 5-tuple shape as EvalBatches with user ids in the id slot.
    Note: histories are indexed by user id (1-based), so row uid-1.
    """

    def __init__(self, pairs: np.ndarray, history: np.ndarray, batch_size: int):
        self.pairs = pairs
        self.history = history
        self.batch_size = batch_size
        self.n = pairs.shape[0]
        self.total = ((self.n + batch_size - 1) // batch_size) * batch_size

    def __iter__(self):
        for i in range(0, self.total, self.batch_size):
            idx = np.minimum(np.arange(i, i + self.batch_size), self.n - 1)
            users = self.pairs[idx, 0].astype(np.int32)
            target = self.pairs[idx, 1].astype(np.int32)
            hist = self.history[np.minimum(users - 1, self.history.shape[0] - 1)]
            lm = np.zeros((len(idx), 1), np.float32)
            valid = (np.arange(i, i + self.batch_size) < self.n)
            yield users, lm, target, hist, valid


class Trainer:
    """Drives one experiment. Data/encoder are injectable for tests."""

    vision_pipe = None   # set for vision end2end (data/vision_loader.py)

    def __init__(self, cfg: Config, log_file=None, log_screen=None,
                 mesh=None, encoder_bundle=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = int(self.mesh.devices.size)
        if log_file is None:
            time_run = time.strftime("-%Y%m%d-%H%M%S", time.localtime())
            log_file, log_screen = setuplogger(
                cfg.dir_label(), cfg.log_paras(self.n_shards), time_run,
                cfg.mode, cfg.behaviors)
            if not is_coordinator():
                # reference rank gating: non-rank-0 loggers log WARN+ only
                log_file.setLevel(logging.WARNING)
                log_screen.setLevel(logging.WARNING)
        self.log = log_file
        self.log_screen = log_screen or log_file
        self.encoder_bundle = encoder_bundle   # (module, enc_params, freeze_paths, word_dim) or None
        self.model_dir = cfg.model_dir(self.n_shards)

    # ----------------------------------------------------------------- data
    def _encode_catalog(self, bundle, content_provider, item_num: int,
                        word_dim: int, batch: int = 256) -> np.ndarray:
        """Two-stage cache: run the FROZEN encoder once over the catalog
        (reference bce_text/main-2stage(SASRec)/data_utils/metrics.py:60-71,
        run.py:78-86). content_provider(ids)->content chunk."""
        module, enc_params, _, _ = bundle
        probe = content_provider(np.arange(0, min(2, item_num + 1)))
        variables = module.init(
            {"params": jax.random.PRNGKey(self.cfg.seed),
             "masking": jax.random.PRNGKey(1)}, jnp.asarray(probe), True)
        if enc_params is not None:
            # converted checkpoint collections are subtrees of the tower's
            # 'net' submodule
            for coll, sub in enc_params.items():
                merged = dict(variables.get(coll, {}).get("net", {}))
                merged.update(sub)
                variables.setdefault(coll, {})["net"] = merged
        enc_params = variables
        rngs = {"masking": jax.random.PRNGKey(0)}

        @jax.jit
        def chunk(content):
            return module.apply(enc_params, content, True, rngs=rngs)

        # shard each chunk's content P('data') so the frozen-encoder catalog
        # pass runs on every chip (same sharding as eval's
        # compute_item_embeddings)
        n_shards = int(self.mesh.devices.size)
        if n_shards > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P("data"))
            shard = lambda x: jax.device_put(np.asarray(x), sh)
        else:
            shard = jnp.asarray
        chunk_bs = batch * n_shards
        total = item_num + 1
        padded = ((total + chunk_bs - 1) // chunk_bs) * chunk_bs
        out = np.zeros((padded, word_dim), np.float32)
        for start in range(0, padded, chunk_bs):
            ids = np.minimum(np.arange(start, start + chunk_bs), item_num)
            out[start:start + chunk_bs] = np.asarray(
                chunk(shard(content_provider(ids))))
        out = out[:total]
        out[0] = 0.0  # padding item
        return out

    def _load_two_stage(self, base: str):
        """Build the cached-embedding catalog, then drop the encoder."""
        cfg = self.cfg
        from ..models.encoders_zoo import load_encoder
        bundle = self.encoder_bundle or load_encoder(cfg)
        word_dim = bundle[3]
        cfg.word_embedding_dim = word_dim
        if cfg.modality == "text":
            from ..models.encoders_zoo import load_tokenizer
            tokenizer = load_tokenizer(cfg)
            dic, n2i, i2n = read_items_tokenized(
                os.path.join(base, cfg.news), cfg, tokenizer)
            bd = read_behaviors(os.path.join(base, cfg.behaviors), dic, n2i,
                                i2n, cfg.max_seq_len, cfg.min_seq_len, self.log)
            doc = jnp.asarray(build_doc_matrix(bd.item_id_to_dic, cfg))
            provider = lambda ids: np.asarray(doc[jnp.asarray(ids)])
        else:
            from ..data.preprocess import read_image_manifest
            from ..data.imagestore import open_store
            from ..data.vision_loader import VisionBatchPipe
            keys_dic, n2i, i2n = read_image_manifest(os.path.join(base, cfg.news))
            bd = read_behaviors(os.path.join(base, cfg.behaviors), keys_dic,
                                n2i, i2n, cfg.max_seq_len, cfg.min_seq_len,
                                self.log)
            store = open_store(os.path.join(base, cfg.image_store))
            pipe = VisionBatchPipe(store, bd.item_id_to_dic, cfg.image_resize)
            provider = pipe.images_for
        cache = self._encode_catalog(bundle, provider, bd.item_num, word_dim)
        self.encoder_bundle = None  # encoder is frozen + discarded (2-stage)
        self.set_data(bd, cache)

    def load_data(self):
        cfg = self.cfg
        base = os.path.join(cfg.root_data_dir, cfg.dataset)
        if cfg.user_tower == "dssm":
            self._load_dssm_data(base)
            return
        if cfg.use_modal and cfg.stage == "two_stage":
            self._load_two_stage(base)
            return
        if cfg.use_modal and cfg.modality == "vision":
            from ..data.preprocess import read_image_manifest
            from ..data.imagestore import open_store
            from ..data.vision_loader import VisionBatchPipe
            keys_dic, n2i, i2n = read_image_manifest(os.path.join(base, cfg.news))
            bd = read_behaviors(os.path.join(base, cfg.behaviors), keys_dic,
                                n2i, i2n, cfg.max_seq_len, cfg.min_seq_len,
                                self.log)
            store = open_store(os.path.join(base, cfg.image_store))
            self.vision_pipe = VisionBatchPipe(store, bd.item_id_to_dic,
                                               cfg.image_resize)
            self.set_data(bd, None)
            return
        if cfg.use_modal and cfg.modality == "text" and cfg.stage == "end2end":
            from ..models.encoders_zoo import load_tokenizer
            tokenizer = load_tokenizer(cfg)
            dic, n2i, i2n = read_items_tokenized(
                os.path.join(base, cfg.news), cfg, tokenizer)
            bd = read_behaviors(os.path.join(base, cfg.behaviors), dic, n2i, i2n,
                                cfg.max_seq_len, cfg.min_seq_len, self.log)
            item_content = build_doc_matrix(bd.item_id_to_dic, cfg)
        else:
            dic, n2i, i2n = read_items_text(os.path.join(base, cfg.news))
            bd = read_behaviors(os.path.join(base, cfg.behaviors), dic, n2i, i2n,
                                cfg.max_seq_len, cfg.min_seq_len, self.log)
            item_content = None
        self.set_data(bd, item_content)

    def set_data(self, bd: BehaviorData, item_content: Optional[np.ndarray]):
        """item_content: None (id), int32 token matrix (text end2end), or
        float32 cached-embedding matrix (two_stage)."""
        cfg = self.cfg
        self.bd = bd
        self.item_num = bd.item_num
        self.item_content = (None if item_content is None
                             else jnp.asarray(item_content))
        self.log_pop = jnp.asarray(np.log(bd.pop_prob_list), jnp.float32)
        seqs, lens = pad_user_sequences(bd.users_train, cfg.seq_len_total)
        global_bs = cfg.batch_size * self.n_shards
        if cfg.loss == "inbatch_ce":
            self.batcher = TrainBatcher(seqs, lens, cfg.max_seq_len, global_bs,
                                        seed=cfg.seed)
        else:
            self.batcher = BCETrainBatcher(seqs, lens, cfg.max_seq_len, global_bs,
                                           self.item_num, seed=cfg.seed)

        H = cfg.max_seq_len + 2
        self.eval_valid = self._make_eval(bd.users_valid,
                                          bd.users_history_for_valid, H)
        self.eval_test = self._make_eval(bd.users_test,
                                         bd.users_history_for_test, H)

    def _make_eval(self, users_eval, histories, hist_width):
        cfg = self.cfg
        seqs, lens = pad_user_sequences(users_eval, cfg.seq_len_total)
        hist = _pad_histories(histories, hist_width)
        return EvalBatches(seqs, lens, cfg.max_seq_len,
                           cfg.eval_batch_size * self.n_shards, hist,
                           num_shards=1)

    def _load_dssm_data(self, base: str):
        cfg = self.cfg
        if cfg.use_modal and cfg.modality == "vision":
            from ..data.preprocess import read_image_manifest
            from ..data.imagestore import open_store
            from ..data.vision_loader import VisionBatchPipe
            dic, n2i, i2n = read_image_manifest(os.path.join(base, cfg.news))
        elif cfg.use_modal and cfg.stage == "end2end":
            from ..models.encoders_zoo import load_tokenizer
            tokenizer = load_tokenizer(cfg)
            dic, n2i, i2n = read_items_tokenized(
                os.path.join(base, cfg.news), cfg, tokenizer)
        else:
            dic, n2i, i2n = read_items_text(os.path.join(base, cfg.news))
        pd = read_behaviors_pairs(os.path.join(base, cfg.behaviors), dic, n2i,
                                  cfg.min_seq_len, cfg.max_seq_len, self.log)
        self.pd = pd
        self.item_num = pd.item_num
        self.user_num = pd.user_num
        self.item_content = None
        if cfg.use_modal and cfg.modality == "vision":
            store = open_store(os.path.join(base, cfg.image_store))
            self.vision_pipe = VisionBatchPipe(store, pd.item_id_to_content,
                                               cfg.image_resize)
        elif cfg.use_modal and cfg.stage == "end2end":
            self.item_content = jnp.asarray(
                build_doc_matrix(pd.item_id_to_content, cfg))
        self.log_pop = None
        global_bs = cfg.batch_size * self.n_shards
        self.batcher = DSSMTrainBatcher(pd.train_pairs, pd.users_valid,
                                        pd.item_num, cfg.neg_num, global_bs,
                                        seed=cfg.seed)
        H = cfg.max_seq_len + 2
        ebs = cfg.eval_batch_size * self.n_shards
        self.eval_valid = _dssm_eval_batches(
            pd.valid_pairs, _pad_histories(pd.users_history_for_valid, H), ebs)
        self.eval_test = _dssm_eval_batches(
            pd.test_pairs, _pad_histories(pd.users_history_for_test, H), ebs)

    # ---------------------------------------------------------------- model
    def build_model(self):
        cfg = self.cfg
        encoder = self.encoder_bundle[0] if self.encoder_bundle else None
        user_num = getattr(self, "user_num", 0)
        self.model = make_model(cfg, self.item_num, user_num, encoder)

        rng = jax.random.PRNGKey(cfg.seed)
        init_rng, mask_rng, self.dropout_seed = jax.random.split(rng, 3)
        # init with a tiny synthetic batch touching every tower
        S = cfg.seq_len_total
        ids = jnp.ones((2, S), jnp.int32)
        lm = jnp.ones((2, cfg.max_seq_len), jnp.float32)
        if self.vision_pipe is not None:
            content = jnp.asarray(self.vision_pipe.images_for(
                np.asarray(ids).reshape(-1)))
        elif self.item_content is not None:
            content = self.item_content[ids.reshape(-1)]
        else:
            content = None
        params = self.model.init({"params": init_rng, "masking": mask_rng},
                                 ids, content, lm)
        if self.encoder_bundle and self.encoder_bundle[1] is not None:
            # graft converted pretrained weights into the modal encoder; the
            # bundle maps collection name -> net subtree (e.g. 'params',
            # 'batch_stats' for ResNet towers)
            for coll, sub in self.encoder_bundle[1].items():
                tgt = params.setdefault(coll, {}).setdefault(
                    "encoder", {}).setdefault("net", {})
                merged = dict(params[coll]["encoder"]["net"])
                merged.update(sub)
                params[coll]["encoder"]["net"] = merged
        # Parameter audit in torch named_parameters() terms: count the
        # 'params' collection only (batch_stats are buffers, not parameters),
        # and trainable excludes the frozen encoder leaves — reference
        # data_utils/utils.py:92-96 logs both numbers.
        self.n_total = sum(int(x.size)
                           for x in jax.tree.leaves(params["params"]))

        labels = None
        self.n_trainable = self.n_total
        if cfg.use_modal and cfg.stage == "end2end":
            # frozen paths are relative to the 'params' collection
            frozen = self.encoder_bundle[2] if self.encoder_bundle else set()
            labels = param_labels(params["params"], default_encoder_predicate,
                                  frozen)
            from .state import FROZEN_LABEL
            n_frozen = sum(jax.tree.leaves(jax.tree.map(
                lambda lbl, x: int(x.size) if lbl == FROZEN_LABEL else 0,
                labels, params["params"])))
            self.n_trainable = self.n_total - n_frozen
        self.tx = make_optimizer(cfg, labels)
        if cfg.accumulation_step > 1:
            # real gradient accumulation (the reference declares the flag but
            # never uses it, inbatch_sasrec_e2e_vision/parameters.py:29)
            import optax
            self.tx = optax.MultiSteps(self.tx, cfg.accumulation_step)
        params = replicate(self.mesh, params)
        opt_state = self.tx.init(params["params"])
        if cfg.zero1_table:
            from .state import shard_table_opt_state
            opt_state = shard_table_opt_state(opt_state, self.mesh)
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=opt_state,
                                dropout_rng=self.dropout_seed)
        self.train_step = make_train_step(self.model, cfg, self.tx, self.mesh,
                                          item_content=self.item_content,
                                          log_pop=self.log_pop)
        self.train_step_multi = None
        if cfg.steps_per_dispatch > 1:
            self.train_step_multi = make_train_step(
                self.model, cfg, self.tx, self.mesh,
                item_content=self.item_content, log_pop=self.log_pop,
                n_steps=cfg.steps_per_dispatch)

    # ---------------------------------------------------------------- train
    def _dedup_pack(self, batch: Dict[str, Any], id_arrays) -> None:
        """Host-side unique-item packing (--dedup_items): ship the batch's
        unique ids (+ their content) and the inverse map; the step encodes
        each unique item ONCE. Falls back to full encoding (no keys added)
        when any shard's uniques exceed the static capacity.

        Multi-shard meshes get PER-SHARD packing: uniq arrays are
        (n_shards*cap,) stacked so that P('data') sharding hands each shard
        its own (cap,) id list and local inverse."""
        cfg = self.cfg
        W = self.n_shards
        per_shard = [np.concatenate(
            [np.array_split(np.asarray(a), W)[s].reshape(-1)
             for a in id_arrays]) for s in range(W)]
        n_flat = len(per_shard[0])
        cap = cfg.dedup_cap or max(256, int(0.75 * n_flat + 255) // 256 * 256)
        uniqs, invs = [], []
        for flat in per_shard:
            uniq, inv = np.unique(flat, return_inverse=True)
            if len(uniq) > cap:
                return
            uniq_p = np.zeros(cap, dtype=np.int32)
            uniq_p[:len(uniq)] = uniq
            uniqs.append(uniq_p)
            invs.append(inv.astype(np.int32))
        uniq_all = np.concatenate(uniqs)
        batch["uniq_ids"] = jnp.asarray(uniq_all)
        batch["inverse"] = jnp.asarray(np.concatenate(invs))
        if self.vision_pipe is not None:
            batch["uniq_content"] = jnp.asarray(
                self.vision_pipe.images_for(uniq_all))
            batch.pop("content", None)
            batch.pop("neg_content", None)

    def make_batch(self, raw) -> Dict[str, Any]:
        cfg = self.cfg
        if cfg.user_tower == "dssm":
            users, items, labels = raw
            batch = {"users": jnp.asarray(users), "items": jnp.asarray(items),
                     "labels": jnp.asarray(labels)}
            if self.vision_pipe is not None:
                batch["content"] = jnp.asarray(
                    self.vision_pipe.images_for(items))
            return batch
        if cfg.loss == "inbatch_ce":
            ids, lm = raw
            batch = {"ids": jnp.asarray(ids), "log_mask": jnp.asarray(lm)}
            if cfg.dedup_items and cfg.use_modal:
                self._dedup_pack(batch, [ids])
            if self.vision_pipe is not None and "uniq_ids" not in batch:
                batch["content"] = jnp.asarray(self.vision_pipe.images_for(ids))
            return batch
        pos, neg, lm = raw
        batch = {"ids": jnp.asarray(pos), "neg_ids": jnp.asarray(neg),
                 "log_mask": jnp.asarray(lm)}
        if cfg.dedup_items and cfg.use_modal:
            self._dedup_pack(batch, [pos, neg])
        if self.vision_pipe is not None and "uniq_ids" not in batch:
            batch["content"] = jnp.asarray(self.vision_pipe.images_for(pos))
            batch["neg_content"] = jnp.asarray(self.vision_pipe.images_for(neg))
        return batch

    def run_eval(self, users="valid") -> tuple:
        cfg = self.cfg
        content_fn = (self.vision_pipe.images_for
                      if self.vision_pipe is not None else None)
        table = compute_item_embeddings(
            self.model, self.state.params, self.item_num, self.item_content,
            cfg.embedding_dim, cfg.item_emb_batch_size, self.mesh,
            content_fn=content_fn)
        ev = self.eval_valid if users == "valid" else self.eval_test
        hit, ndcg = evaluate(self.model, self.state.params, table, ev,
                             self.mesh, cfg.user_tower)
        print_metrics([hit, ndcg], self.log, cfg.mode)
        return hit, ndcg

    def train(self):
        cfg = self.cfg
        start_time = time.time()
        start_epoch = 0
        is_early_stop = True
        if "None" not in cfg.load_ckpt_name:
            if cfg.load_ckpt_name == "latest":
                from .checkpoint import latest_checkpoint
                ckpt_path = latest_checkpoint(self.model_dir)
                cfg.load_ckpt_name = os.path.basename(ckpt_path)
            else:
                ckpt_path = get_checkpoint(self.model_dir, cfg.load_ckpt_name)
            self.state, payload = load_checkpoint(ckpt_path, self.state)
            self.state = self.state.replace(
                params=replicate(self.mesh, self.state.params))
            if cfg.zero1_table:
                from .state import shard_table_opt_state
                self.state = self.state.replace(opt_state=shard_table_opt_state(
                    self.state.opt_state, self.mesh))
            start_epoch = epoch_from_name(cfg.load_ckpt_name)
            is_early_stop = False
            self.log.info(f"Model loaded from {ckpt_path}")

        steps_for_log, _ = para_and_log(
            self.n_total, self.n_trainable, self.batcher.n,
            cfg.batch_size * self.n_shards, self.log,
            cfg.logging_num, cfg.testing_num)

        max_eval_value, max_epoch, early_stop_count = 0.0, 0, 0
        early_stop_epoch = cfg.epoch
        next_set_start = time.time()
        need_break = False
        for ep in range(cfg.epoch):
            now_epoch = start_epoch + ep + 1
            self.log.info(f"epoch {now_epoch} start")
            loss_sum, batch_index = 0.0, 1
            trace_state = 0   # 0=pending, 1=tracing, 2=done
            # Double-buffered host pipeline: image fetch/transform and dedup
            # packing for the NEXT batch run on a worker thread while the
            # device executes the current step (replaces the reference's
            # 12-worker DataLoader, dataset.py:78-99).
            from ..data.vision_loader import Prefetcher
            for batches in _dispatch_groups(
                    Prefetcher(self.batcher.epoch(now_epoch), self.make_batch),
                    cfg.steps_per_dispatch):
                if (cfg.profile_dir and ep == 0 and batch_index >= 10
                        and not trace_state):
                    jax.profiler.start_trace(cfg.profile_dir)
                    trace_state = 1
                if len(batches) > 1:
                    # one dispatch runs len(batches) train steps (train/step.py
                    # n_steps); bookkeeping below stays per-step on the
                    # returned loss vector
                    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
                    self.state, losses = self.train_step_multi(self.state,
                                                               stacked)
                    losses = [float(x) for x in np.asarray(losses)]
                else:
                    self.state, loss = self.train_step(self.state, batches[0])
                    losses = [float(loss)]
                if trace_state == 1 and batch_index >= 20:
                    jax.profiler.stop_trace()
                    trace_state = 2
                for loss in losses:
                    loss_sum += loss
                    if np.isnan(loss):
                        self.log.info(
                            "NaN loss — stopping (run.py:249-251 parity)")
                        need_break = True
                        break
                    if batch_index % steps_for_log == 0:
                        now = time.time()
                        sps = (steps_for_log * cfg.batch_size * self.n_shards /
                               max(now - getattr(self, "_last_log_t",
                                                 now - 1e-9), 1e-9))
                        self._last_log_t = now
                        self.log.info(
                            "cnt: {}, Ed: {}, batch loss: {:.5f}, sum loss: {:.5f},"
                            " samples/s: {:.0f}".format(
                                batch_index, batch_index * cfg.batch_size * self.n_shards,
                                loss_sum / batch_index, loss_sum, sps))
                    batch_index += 1
                if need_break:
                    break

            if not need_break:
                eval_start = time.time()
                self.log.info("Validating...")
                hit, ndcg = self.run_eval("valid")
                report_time_eval(eval_start, self.log)
                if hit > max_eval_value:
                    max_eval_value, max_epoch = hit, now_epoch
                    early_stop_count = 0
                    # all processes call (the sharded-opt-state gather inside
                    # is collective); only rank 0 writes (run.py:265-267)
                    save_checkpoint(self.model_dir, now_epoch, self.state,
                                    {"best": max_eval_value},
                                    self.log if is_coordinator() else None)
                else:
                    early_stop_count += 1
                    if early_stop_count > cfg.early_stop_gap:
                        early_stop_epoch = now_epoch
                        if is_early_stop:
                            need_break = True
            next_set_start = report_time_train(batch_index - 1, now_epoch,
                                               loss_sum, next_set_start,
                                               start_time, self.log)
            self.log_screen.info("{} training: epoch {}/{}".format(
                cfg.label_screen, now_epoch, cfg.epoch))
            if need_break:
                break
        self.log.info(" max eval Hit10 {:0.5f}  in epoch {}".format(
            max_eval_value * 100, max_epoch))
        self.log.info(" early stop in epoch {}".format(early_stop_epoch))
        return max_eval_value, max_epoch

    def test(self):
        """Standalone checkpoint evaluation (reference run_test.py:26-187)."""
        cfg = self.cfg
        if cfg.load_ckpt_name == "latest":
            from .checkpoint import latest_checkpoint
            ckpt_path = latest_checkpoint(self.model_dir)
        else:
            ckpt_path = get_checkpoint(self.model_dir, cfg.load_ckpt_name)
        if ckpt_path:
            self.state, _ = load_checkpoint(ckpt_path, self.state)
            self.state = self.state.replace(params=replicate(self.mesh, self.state.params))
            self.log.info(f"Model loaded from {ckpt_path}")
        result = self.run_eval("test")
        if cfg.cold_behaviors:
            self.run_special_eval()
        return result

    def run_special_eval(self):
        """Cold-start / new-item evaluation (reference special.py, imported by
        inbatch_sasrec_e2e_vision/run_test.py:12)."""
        cfg = self.cfg
        base = os.path.join(cfg.root_data_dir, cfg.dataset)
        from .special_eval import (eval_cold, eval_new,
                                   read_behaviors_special)
        # 'before' item catalogs (new items may be absent from training).
        # --new_items points the UNSEEN items at their own manifest file
        # (reference vision special.py:73-80, parameters.py:18); without it
        # the main catalog file carries them (text reference semantics).
        items_file = cfg.new_items or cfg.news
        if cfg.use_modal and cfg.modality == "text" and cfg.stage == "end2end":
            from ..models.encoders_zoo import load_tokenizer
            dic, before_n2i, _ = read_items_tokenized(
                os.path.join(base, items_file), cfg, load_tokenizer(cfg))
        elif cfg.use_modal and cfg.modality == "vision":
            from ..data.preprocess import read_image_manifest
            dic, before_n2i, _ = read_image_manifest(
                os.path.join(base, items_file))
        else:
            dic, before_n2i, _ = read_items_text(os.path.join(base, items_file))

        new_path = (os.path.join(base, cfg.new_behaviors)
                    if cfg.new_behaviors else None)
        sc, hc, sn, hn, new_content = read_behaviors_special(
            os.path.join(base, cfg.cold_behaviors), new_path,
            self.bd.item_name_to_id, dic, before_n2i, cfg.use_modal, self.log)

        content_fn = (self.vision_pipe.images_for
                      if self.vision_pipe is not None else None)
        table = compute_item_embeddings(
            self.model, self.state.params, self.item_num, self.item_content,
            cfg.embedding_dim, cfg.item_emb_batch_size, self.mesh,
            content_fn=content_fn)
        hit_c, ndcg_c = eval_cold(
            self.model, self.state.params, table, sc, hc, cfg.max_seq_len,
            cfg.eval_batch_size)
        print_metrics([hit_c, ndcg_c], self.log, "cold")
        if sn is None:
            return (hit_c, ndcg_c), None
        # encode new items fresh through the modality tower
        if cfg.modality == "text":
            new_rows = build_doc_matrix(new_content, cfg)
            new_embs = self.model.apply(
                self.state.params, jnp.zeros((len(new_rows),), jnp.int32),
                jnp.asarray(new_rows), True, method="item_embs",
                rngs={"masking": jax.random.PRNGKey(0)})
        else:
            # new_content maps new ids -> store keys; unseen items may live
            # in their own store (reference vision special.py)
            store = self.vision_pipe.store
            if cfg.new_image_store:
                from ..data.imagestore import open_store
                store = open_store(os.path.join(base, cfg.new_image_store))
            imgs = self.vision_pipe.transform(
                [store.get(new_content[i]) for i in sorted(new_content)])
            imgs = np.concatenate([np.zeros((1,) + imgs.shape[1:],
                                            imgs.dtype), imgs])
            new_embs = self.model.apply(
                self.state.params,
                jnp.zeros((imgs.shape[0],), jnp.int32), jnp.asarray(imgs),
                True, method="item_embs",
                rngs={"masking": jax.random.PRNGKey(0)})
        hit_n, ndcg_n = eval_new(
            self.model, self.state.params, table, new_embs, sn, hn,
            cfg.max_seq_len, cfg.eval_batch_size)
        print_metrics([hit_n, ndcg_n], self.log, "new")
        return (hit_c, ndcg_c), (hit_n, ndcg_n)


def run(cfg: Config):
    if cfg.distributed:
        # multi-host DP: must run before the first jax.devices() call so the
        # mesh sees the whole cluster (SURVEY §2b row 1)
        from ..parallel.mesh import init_distributed
        init_distributed(cfg)
    trainer = Trainer(cfg)
    if cfg.use_modal and cfg.stage == "end2end":
        from ..models.encoders_zoo import load_encoder
        axis = "data" if trainer.n_shards > 1 else None
        trainer.encoder_bundle = load_encoder(cfg, axis_name=axis)
    trainer.load_data()
    trainer.build_model()
    if "train" in cfg.mode:
        return trainer.train()
    return trainer.test()
