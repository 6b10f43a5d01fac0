"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Flagship benchmark: SASRec + in-batch debiased CE train step throughput
(samples/sec/chip) at the reference's MIND config scale (batch 128/chip,
max_seq_len 20, embedding_dim 512, 2 transformer blocks — reference
inbatch_sasrec_e2e_text/train_bert_base.py:22-28). The item tower is the ID
embedding until the Flax text tower enters the bench path.

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md).
Baseline constant below is our recorded round-1 target: an estimated
A100-class per-GPU rate for this exact IDRec config under torch
(~25k samples/s, dominated by the (B*L x B*(L+1)) logits matmul + host
rejection-loop removal), times the BASELINE.json 3x north star.
"""

import json
import time

import numpy as np

BASELINE_SPS = 75_000.0  # 3 x estimated A100 torch samples/sec for this config


def main():
    import jax
    import jax.numpy as jnp
    from idvs.morec_tpu.config import Config
    from idvs.morec_tpu.models.model import make_model
    from idvs.morec_tpu.ops.losses import inbatch_debiased_ce
    from idvs.morec_tpu.train.state import TrainState, make_optimizer
    from idvs.morec_tpu.train.step import make_train_step
    from idvs.morec_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    item_num, B, L, D = 100_000, 128, 20, 512
    S = L + 1
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B, num_attention_heads=2,
                 transformer_block=2, lr=1e-4)
    mesh = make_mesh(jax.devices())
    n_chips = int(mesh.devices.size)
    model = make_model(cfg, item_num=item_num)

    rng = np.random.default_rng(0)
    GB = B * n_chips
    ids = rng.integers(1, item_num + 1, size=(GB, S)).astype(np.int32)
    lm = (rng.uniform(size=(GB, L)) < 0.9).astype(np.float32)
    lm[:, -1] = 1.0

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[:2]), None,
                        jnp.asarray(lm[:2]))
    pop = np.full(item_num + 1, 1.0 / item_num); pop[0] = 1.0
    log_pop = jnp.asarray(np.log(pop), jnp.float32)
    tx = make_optimizer(cfg)
    params = replicate(mesh, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params),
                       dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model, cfg, tx, mesh, item_content=None,
                           log_pop=log_pop)
    batch = shard_batch(mesh, {"ids": jnp.asarray(ids),
                               "log_mask": jnp.asarray(lm)})

    # warmup/compile (several steps: donation triggers a second compile, and
    # the tunneled platform autotunes on early executions)
    for _ in range(5):
        state, loss = step(state, batch)
    jax.block_until_ready(loss)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    sps_per_chip = (GB * iters / dt) / n_chips
    print(json.dumps({
        "metric": "idrec_inbatch_ce_train_samples_per_sec_per_chip",
        "value": round(sps_per_chip, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps_per_chip / BASELINE_SPS, 3),
    }))


if __name__ == "__main__":
    main()
