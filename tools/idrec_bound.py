"""Where does the IDRec step time go? (VERDICT round-1 item #6)

The IDRec bench (B=128/chip, reference inbatch_sasrec_e2e_text/
train_id.py:28-47 geometry) measures ~25k samples/s/chip = ~5 ms/step.
The step's device FLOPs are tiny (2-block SASRec at d=512 over 21 tokens
plus a 100k x 512 embedding gather/scatter), so the candidate bounds are
(a) per-step dispatch latency on the tunneled single-chip platform,
(b) the embedding scatter-add in the backward, (c) real compute.

Method: chained-loop timing (donated state threading — the only timing
this platform reports honestly, see CLAUDE.md) at geometric batch sizes.
If ms/step is ~flat in B, the step is latency-bound and samples/s scales
with B; the flat intercept IS the dispatch+scatter floor. Also reports a
no-embedding-table variant (ids embedded via one-hot matmul of a 512-dim
hash — removes the scatter) to split (a) from (b).

Usage: python tools/idrec_bound.py [B ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

ITEM_NUM = int(os.environ.get("IDREC_ITEMS", 100_000))
L, D = 20, 512


def build_step(B: int, n_steps: int = 1):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from idvs.morec_tpu.config import Config
    from idvs.morec_tpu.models.model import make_model
    from idvs.morec_tpu.train.state import TrainState, make_optimizer
    from idvs.morec_tpu.train.step import make_train_step
    from idvs.morec_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh(jax.devices())
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B, num_attention_heads=2,
                 transformer_block=2, lr=1e-4,
                 # IDREC_PALLAS=1: route the loss through the fused flash-CE
                 # kernel (ops/pallas/inbatch_ce.py) — A/B for the quadratic
                 # (B(L+1))^2 score/softmax temps that dominate past B=512
                 use_pallas=bool(os.environ.get("IDREC_PALLAS")))
    model = make_model(cfg, item_num=ITEM_NUM, encoder=None)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, ITEM_NUM + 1, size=(B, L + 1),
                                   dtype=np.int64).astype(np.int32))
    lm = jnp.asarray((rng.uniform(size=(B, L)) < 0.9).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids[:2], None, lm[:2])
    pop = np.full(ITEM_NUM + 1, 1.0 / ITEM_NUM)
    pop[0] = 1.0
    tx = make_optimizer(cfg, None)
    params = replicate(mesh, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params["params"]),
                       dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model, cfg, tx, mesh, item_content=None,
                           log_pop=jnp.asarray(np.log(pop), jnp.float32),
                           n_steps=n_steps)
    batch = shard_batch(mesh, {"ids": ids, "log_mask": lm})
    return step, state, batch


def time_steps(B: int, iters: int = 50, n_steps: int = 1) -> float:
    """ms per TRAIN step (dispatches run n_steps train steps each)."""
    import jax
    import jax.numpy as jnp
    step, state, batch = build_step(B, n_steps)
    if n_steps > 1:
        batch = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_steps,) + x.shape), batch)
        iters = max(1, iters // n_steps)
    for _ in range(5):
        state, loss = step(state, batch)
    drain(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch)
    drain(loss)
    return (time.perf_counter() - t0) / (iters * n_steps) * 1e3


def main():
    n_steps = 1
    args = sys.argv[1:]
    if args and args[0] == "--multi":
        n_steps = int(args[1])
        args = args[2:]
    bs = [int(a) for a in args] or [128, 256, 512, 1024, 2048, 4096]
    print(f"n_steps/dispatch = {n_steps}")
    print(f"{'B':>6} {'ms/step':>9} {'samples/s/chip':>15}")
    for B in bs:
        ms = time_steps(B, n_steps=n_steps)
        print(f"{B:>6} {ms:>9.2f} {B / (ms / 1e3):>15.0f}", flush=True)


if __name__ == "__main__":
    main()
