"""Production retrieval serving on TPU.

The reference stops at offline evaluation (run_test.py); deployment of an
IDvs.MoRec model is the natural next step of the same artifacts, so this
module packages them as a low-latency retrieval engine:

  1. encode the catalog ONCE through the item tower (text/vision/ID —
     exactly the table `train/evaluate.py` builds for eval, reference
     metrics.py:33-46 get_item_embeddings), keep it device-resident;
  2. serve `recommend(histories) -> top-K item ids` as ONE jitted program:
     user-tower forward on the last position, a (B, I+1) MXU matmul
     against the resident catalog, history/padding masking, `lax.top_k`.

Static shapes throughout: the engine compiles one program per
(batch_size, top_k) bucket and pads submitted batches up to the bucket,
so steady-state serving never retraces. New items can be spliced into the
live catalog with `update_items` (the cold/new-item scenario of
data_utils/special.py, reference special.py:44-214, as an online op).

Scoring semantics match eval exactly (ops/metrics.py): padding column 0
is never recommended, and (optionally) every item in the user's submitted
history is excluded — the same `.at[rows, history].set(-inf)` scatter the
reference applies before ranking (metrics.py:98-101).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .train.evaluate import compute_item_embeddings


def pad_histories(histories: Sequence[Sequence[int]], max_seq_len: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Left-pad item-id histories to (B, L) + log_mask, the user-tower input
    convention (reference dataset.py pad_to_fix_len: pads at the FRONT,
    keeps the most recent max_seq_len items)."""
    B, L = len(histories), max_seq_len
    ids = np.zeros((B, L), dtype=np.int32)
    mask = np.zeros((B, L), dtype=np.float32)
    for i, h in enumerate(histories):
        h = list(h)[-L:]
        if h:
            ids[i, L - len(h):] = h
            mask[i, L - len(h):] = 1.0
    return ids, mask


class Retriever:
    """Device-resident retrieval engine over a trained RecModel.

    model/params: the trained flax model and FULL variables dict (as stored
    by train/checkpoint.py). item_table: (item_num+1, D) catalog embeddings
    — build one with `Retriever.encode_catalog` or pass a cached two-stage
    table. batch_sizes: compiled bucket sizes (requests pad up to the
    smallest bucket that fits).
    """

    def __init__(self, model, params, item_table: jnp.ndarray, *,
                 user_tower: str = "sasrec", max_seq_len: int = 20,
                 batch_sizes: Sequence[int] = (1, 8, 64),
                 exclude_history: bool = True, mesh=None):
        self.model = model
        self.params = params
        self.user_tower = user_tower
        self.max_seq_len = int(max_seq_len)
        self.batch_sizes = tuple(sorted(int(b) for b in batch_sizes))
        self.exclude_history = bool(exclude_history)
        self.mesh = mesh
        self._compiled_cache = {}   # (B, top_k) -> jitted step; an instance
        # dict, NOT functools.lru_cache on the method (that caches `self`
        # globally — a leak pattern in long-lived servers)
        self.true_rows = int(item_table.shape[0])
        if mesh is not None:
            # shard the catalog rows over the mesh; pad to an even split
            # (padded rows are masked to -inf inside the sharded step)
            from jax.sharding import NamedSharding, PartitionSpec as P
            n = int(np.prod(list(mesh.shape.values())))
            pad = (-self.true_rows) % n
            if pad:
                item_table = jnp.concatenate(
                    [item_table, jnp.zeros((pad, item_table.shape[1]),
                                           item_table.dtype)])
            item_table = jax.device_put(
                item_table, NamedSharding(mesh, P("data", None)))
        self.item_table = item_table

    # ------------------------------------------------------------- build
    @staticmethod
    def encode_catalog(model, params, item_num: int,
                       item_content: Optional[jnp.ndarray],
                       embedding_dim: int, batch_size: int = 512,
                       content_fn=None) -> jnp.ndarray:
        """(item_num+1, D) catalog table through the item tower (one pass,
        the two-stage/eval table)."""
        return compute_item_embeddings(model, params, item_num,
                                       item_content, embedding_dim,
                                       batch_size=batch_size,
                                       content_fn=content_fn)

    # ------------------------------------------------------------- serve
    def _compiled(self, B: int, top_k: int):
        key = (B, top_k)
        hit = self._compiled_cache.get(key)
        if hit is not None:
            return hit
        step = self._build_step(top_k)
        self._compiled_cache[key] = step
        return step

    def _build_step(self, top_k: int):
        model, user_tower = self.model, self.user_tower
        exclude = self.exclude_history

        @jax.jit
        def step(params, table, ids, log_mask):
            if user_tower == "sasrec":
                input_embs = table[ids]                        # (B, L, D)
                states = model.apply(params, input_embs, log_mask, True,
                                     method="user_states")
                uvec = states[:, -1]
            else:                                   # dssm: ids = user ids
                uvec = model.apply(params, ids, True, method="user_vec")
            f32 = jnp.float32
            scores = jnp.dot(uvec.astype(f32), table.astype(f32).T,
                             preferred_element_type=f32)       # (B, I+1)
            scores = scores.at[:, 0].set(-jnp.inf)   # padding item
            if exclude and user_tower == "sasrec":
                rows = jnp.arange(ids.shape[0])[:, None]
                # history ids are padded with 0 -> clobbers column 0,
                # already -inf (same trick as ops/metrics.py)
                scores = scores.at[rows, ids].set(-jnp.inf)
            return jax.lax.top_k(scores, top_k)

        if self.mesh is None:
            return step
        return self._sharded_step(top_k)

    def _sharded_step(self, top_k: int):
        """Catalog-sharded recommend: each shard scores its rows against
        the (replicated, cheap) user vectors, takes a LOCAL top-K, and the
        K candidates per shard ride one small all-gather over ICI before a
        final merge — the (B, I+1) score matrix never materializes on any
        one chip and the catalog scales with the mesh."""
        from jax.sharding import PartitionSpec as P
        mesh = self.mesh
        model, user_tower = self.model, self.user_tower
        exclude = self.exclude_history
        total, true_rows = int(self.item_table.shape[0]), self.true_rows
        n = int(np.prod(list(mesh.shape.values())))
        local = total // n
        assert top_k <= local, f"top_k {top_k} exceeds {local} rows/shard"

        def body(params, table, ids, log_mask):
            if user_tower == "sasrec":
                # user tower on replicated inputs (tiny next to the catalog
                # matmul) — recomputed per shard, no collectives. The
                # sequence embeddings come from the LOCAL table slice via a
                # masked gather + psum (ids outside this shard contribute 0).
                lo = jax.lax.axis_index("data") * local
                li = jnp.clip(ids - lo, 0, local - 1)
                mine = (ids >= lo) & (ids < lo + local)
                input_embs = jnp.where(mine[..., None], table[li], 0.0)
                input_embs = jax.lax.psum(input_embs, "data")
                states = model.apply(params, input_embs, log_mask, True,
                                     method="user_states")
                uvec = states[:, -1]
            else:
                uvec = model.apply(params, ids, True, method="user_vec")
                lo = jax.lax.axis_index("data") * local
            f32 = jnp.float32
            scores = jnp.dot(uvec.astype(f32), table.astype(f32).T,
                             preferred_element_type=f32)      # (B, local)
            gcol = lo + jnp.arange(local)[None, :]
            scores = jnp.where((gcol == 0) | (gcol >= true_rows),
                               -jnp.inf, scores)
            if exclude and user_tower == "sasrec":
                rows = jnp.arange(ids.shape[0])[:, None]
                li = jnp.clip(ids - lo, 0, local - 1)
                val = jnp.where((ids >= lo) & (ids < lo + local),
                                -jnp.inf, jnp.inf)
                scores = scores.at[rows, li].min(val)  # min(+inf) = no-op
            v, i = jax.lax.top_k(scores, top_k)               # (B, k) local
            gi = i + lo
            av = jax.lax.all_gather(v, "data", axis=1, tiled=True)
            ai = jax.lax.all_gather(gi, "data", axis=1, tiled=True)
            fv, fi = jax.lax.top_k(av, top_k)
            return fv, jnp.take_along_axis(ai, fi, axis=1)

        stepped = jax.shard_map(body, mesh=mesh,
                                in_specs=(P(), P("data", None), P(), P()),
                                out_specs=(P(), P()),
                                check_vma=False)
        return jax.jit(stepped)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return ((n + self.batch_sizes[-1] - 1)
                // self.batch_sizes[-1]) * self.batch_sizes[-1]

    def recommend(self, histories: Sequence[Sequence[int]], top_k: int = 10
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """histories: per-user item-id lists (most recent last) ->
        (ids (B, top_k) int32, scores (B, top_k) f32), best first."""
        n = len(histories)
        B = self._bucket(n)
        ids, mask = pad_histories(histories, self.max_seq_len)
        if B > n:
            ids = np.pad(ids, ((0, B - n), (0, 0)))
            mask = np.pad(mask, ((0, B - n), (0, 0)))
        vals, idx = self._compiled(B, int(top_k))(
            self.params, self.item_table, jnp.asarray(ids),
            jnp.asarray(mask))
        return np.asarray(idx[:n]), np.asarray(vals[:n])

    def recommend_users(self, user_ids: Sequence[int], top_k: int = 10
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """DSSM tower: recommend for trained user ids."""
        assert self.user_tower == "dssm", "user-id serving is the DSSM path"
        n = len(user_ids)
        B = self._bucket(n)
        ids = np.zeros((B,), np.int32)
        ids[:n] = np.asarray(list(user_ids), np.int32)
        vals, idx = self._compiled(B, int(top_k))(
            self.params, self.item_table, jnp.asarray(ids), None)
        return np.asarray(idx[:n]), np.asarray(vals[:n])

    # ----------------------------------------------------------- updates
    def update_items(self, item_ids: Sequence[int],
                     content: Optional[jnp.ndarray] = None,
                     embeddings: Optional[jnp.ndarray] = None) -> None:
        """Splice new/updated items into the live catalog (the cold/new-item
        scenario as an online op). Pass precomputed `embeddings`, or raw
        `content` to run through the item tower."""
        ids = jnp.asarray(np.asarray(list(item_ids), np.int32))
        if embeddings is None:
            assert content is not None, "need content or embeddings"
            rngs = {"masking": jax.random.PRNGKey(0)}
            embeddings = self.model.apply(self.params, ids, content, True,
                                          method="item_embs", rngs=rngs)
        embeddings = jnp.asarray(embeddings, self.item_table.dtype)
        if self.mesh is None:
            self.item_table = self.item_table.at[ids].set(embeddings)
            return
        # Mesh-sharded catalog: an eager .at[].set would let XLA pick the
        # scatter's output sharding (measured: it re-replicates — a full-table
        # copy through every chip). Pin the result to the catalog's own
        # P('data', None) row sharding so the splice stays a local-row
        # scatter + tiny update broadcast.
        from jax.sharding import NamedSharding, PartitionSpec as P
        rows = NamedSharding(self.mesh, P("data", None))

        @functools.partial(jax.jit, out_shardings=rows, donate_argnums=(0,))
        def splice(table, ids, emb):
            return table.at[ids].set(emb)

        self.item_table = splice(self.item_table, ids, embeddings)
