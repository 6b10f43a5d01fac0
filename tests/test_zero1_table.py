"""ZeRO-1 sharded embedding-table optimizer == replicated optimizer.

The table's AdamW moments are stored P('data') and the update row-partitioned
by GSPMD (train/step.py + train/state.py). Two claims, tested separately:

1. The partitioned UPDATE computes the same elementwise math: on identical
   grads the sharded and replicated transforms agree to last-ulp fusion
   noise (test_zero1_update_bitwise_on_same_grads).
2. End-to-end trajectories agree to f32 reduction-order tolerance: with a
   partitioned consumer XLA is free to lower the table-grad all-reduce as
   reduce-scatter, re-associating the cross-shard f32 sum — same math,
   different summation order (measured max 2e-5 relative after 4 steps).
   The reference's NCCL all-reduce has the same algorithm-dependence.

Covers the IDRec flagship (large id_embedding, the measured HBM-floor tensor,
PARITY.md "IDRec bound") and the odd-row-count case (GSPMD internal padding).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from idvs.morec_tpu.train.state import (TrainState, make_optimizer,
                                        shard_table_opt_state)
from idvs.morec_tpu.train.step import make_train_step

L, D, B_PER = 6, 16, 2
N_STEPS = 4


def _run(item_num, zero1: bool, n_devices=8, seed=0):
    mesh = make_mesh(jax.devices("cpu")[:n_devices])
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B_PER, num_attention_heads=2,
                 transformer_block=1, drop_rate=0.0, lr=1e-3, l2_weight=0.01,
                 compute_dtype="float32", zero1_table=zero1)
    model = make_model(cfg, item_num=item_num)
    rng = np.random.default_rng(seed)
    B, S = B_PER * n_devices, L + 1
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((2, S), jnp.int32), None,
                        jnp.ones((2, L), jnp.float32))
    pop = np.full(item_num + 1, 1.0 / item_num); pop[0] = 1.0
    log_pop = jnp.asarray(np.log(pop), jnp.float32)
    tx = make_optimizer(cfg)
    params = replicate(mesh, params)
    opt_state = tx.init(params["params"])
    if zero1:
        opt_state = shard_table_opt_state(opt_state, mesh)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model, cfg, tx, mesh, log_pop=log_pop)
    losses = []
    for i in range(N_STEPS):
        ids = rng.integers(1, item_num + 1, size=(B, S)).astype(np.int32)
        lm = np.ones((B, L), dtype=np.float32)
        batch = shard_batch(mesh, {"ids": jnp.asarray(ids),
                                   "log_mask": jnp.asarray(lm)})
        state, loss = step(state, batch)
        losses.append(float(loss))
    return losses, jax.device_get(state.params["params"]), \
        jax.device_get(state.opt_state)


def _assert_close_trees(a, b, rtol=1e-4, atol=1e-7):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol)


def test_zero1_update_bitwise_on_same_grads():
    """Claim 1: on IDENTICAL grads the partitioned AdamW transform computes
    the same elementwise math — equal to last-ulp fusion noise (the sharded
    program fuses/FMA-contracts differently; measured max 7.5e-9 absolute
    over 4 steps, i.e. one ulp at these magnitudes)."""
    from idvs.morec_tpu.train.state import (constrain_params_replicated,
                                            constrain_table_opt_state)

    mesh = make_mesh(jax.devices("cpu")[:8])
    item_num = 5000   # uneven: 5001 rows over 8 shards (GSPMD pads)
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B_PER, lr=1e-3, l2_weight=0.01,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=item_num)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, L + 1), jnp.int32),
                        None, jnp.ones((2, L), jnp.float32))["params"]
    rng = np.random.default_rng(0)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0, 1e-2, p.shape), p.dtype), params)
    tx = make_optimizer(cfg)

    def steps(params, opt_state, zero1):
        for _ in range(N_STEPS):
            def upd(params, opt_state, grads):
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                if zero1:
                    params = constrain_params_replicated({"params": params},
                                                         mesh)["params"]
                    opt_state = constrain_table_opt_state(opt_state, mesh)
                return params, opt_state

            params, opt_state = jax.jit(upd)(params, opt_state, grads)
        return jax.device_get(params), jax.device_get(opt_state)

    p_rep = replicate(mesh, params)
    p0, o0 = steps(p_rep, tx.init(p_rep), False)
    p1, o1 = steps(p_rep, shard_table_opt_state(tx.init(p_rep), mesh), True)
    for la, lb in zip(jax.tree.leaves(p0) + jax.tree.leaves(o0),
                      jax.tree.leaves(p1) + jax.tree.leaves(o1)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=0, atol=2e-8)


def test_zero1_table_e2e_trajectory():
    # 4096 rows: divisible by 8 — clean row blocks
    l0, p0, o0 = _run(4095, zero1=False)
    l1, p1, o1 = _run(4095, zero1=True)
    np.testing.assert_allclose(l0, l1, rtol=0, atol=1e-6)
    _assert_close_trees(p0, p1)
    _assert_close_trees(o0, o1)


def test_zero1_table_e2e_trajectory_uneven_rows():
    # 5001 rows: NOT divisible by 8 — exercises GSPMD's internal padding
    l0, p0, o0 = _run(5000, zero1=False, seed=3)
    l1, p1, o1 = _run(5000, zero1=True, seed=3)
    np.testing.assert_allclose(l0, l1, rtol=0, atol=1e-6)
    _assert_close_trees(p0, p1)
    _assert_close_trees(o0, o1)


def test_zero1_moments_actually_sharded():
    """The moment leaves must really live P('data') after a step (not
    silently re-replicated by XLA)."""
    mesh = make_mesh(jax.devices("cpu")[:8])
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B_PER, num_attention_heads=2,
                 transformer_block=1, drop_rate=0.0, compute_dtype="float32",
                 zero1_table=True)
    item_num = 4095
    model = make_model(cfg, item_num=item_num)
    S = L + 1
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, S), jnp.int32),
                        None, jnp.ones((2, L), jnp.float32))
    pop = np.full(item_num + 1, 1.0 / item_num); pop[0] = 1.0
    tx = make_optimizer(cfg)
    params = replicate(mesh, params)
    opt_state = shard_table_opt_state(tx.init(params["params"]), mesh)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model, cfg, tx, mesh,
                           log_pop=jnp.asarray(np.log(pop), jnp.float32))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, item_num + 1, size=(16, S)).astype(np.int32)
    batch = shard_batch(mesh, {"ids": jnp.asarray(ids),
                               "log_mask": jnp.ones((16, L), jnp.float32)})
    state, _ = step(state, batch)

    mu = state.opt_state[0].mu["id_embedding"]["embedding"]
    # each device holds one row block, not the full table
    shard_rows = {s.data.shape[0] for s in mu.addressable_shards}
    assert shard_rows == {(item_num + 1) // 8}, shard_rows
    # params stay replicated for the next forward
    p = state.params["params"]["id_embedding"]["embedding"]
    assert all(s.data.shape == p.shape for s in p.addressable_shards)


def test_zero1_checkpoint_save_resume(tmp_path, monkeypatch):
    """VERDICT r4 item 2: checkpointing a --zero1_table run whose moments
    are ACTUALLY sharded must (a) write correct bytes through the
    collective-gather path, and (b) resume to the same trajectory as an
    uninterrupted run.

    The 8 virtual devices live in one process, so sharded arrays here are
    fully addressable; _needs_gather is forced to treat them as a
    multi-process pod would, so the save exercises the real
    _replicate_collective all-gather program."""
    from idvs.morec_tpu.train import checkpoint as ckpt_mod
    from idvs.morec_tpu.train.checkpoint import (load_checkpoint,
                                                 save_checkpoint)

    monkeypatch.setattr(
        ckpt_mod, "_needs_gather",
        lambda x: isinstance(x, jax.Array)
        and len(getattr(x, "sharding", None).device_set) > 1
        if hasattr(x, "sharding") else False)

    item_num = 4095
    mesh = make_mesh(jax.devices("cpu")[:8])
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B_PER, num_attention_heads=2,
                 transformer_block=1, drop_rate=0.0, lr=1e-3, l2_weight=0.01,
                 compute_dtype="float32", zero1_table=True)
    model = make_model(cfg, item_num=item_num)
    S = L + 1
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, S), jnp.int32),
                        None, jnp.ones((2, L), jnp.float32))
    pop = np.full(item_num + 1, 1.0 / item_num); pop[0] = 1.0
    log_pop = jnp.asarray(np.log(pop), jnp.float32)
    tx = make_optimizer(cfg)
    params = replicate(mesh, params)
    opt_state = shard_table_opt_state(tx.init(params["params"]), mesh)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model, cfg, tx, mesh, log_pop=log_pop)

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(4):
        ids = rng.integers(1, item_num + 1, size=(16, S)).astype(np.int32)
        batches.append(shard_batch(mesh, {
            "ids": jnp.asarray(ids),
            "log_mask": jnp.ones((16, L), jnp.float32)}))

    state, _ = step(state, batches[0])
    state, _ = step(state, batches[1])
    mu = state.opt_state[0].mu["id_embedding"]["embedding"]
    assert {s.data.shape[0] for s in mu.addressable_shards} \
        == {(item_num + 1) // 8}   # the save really sees SHARDED moments

    path = save_checkpoint(str(tmp_path), 1, state)
    assert path.endswith("epoch-1.ckpt")

    # uninterrupted continuation
    cont = state
    for b in batches[2:]:
        cont, loss_direct = step(cont, b)

    # resumed continuation: fresh template, sharded opt template, load
    params2 = replicate(mesh, model.init(
        jax.random.PRNGKey(9), jnp.ones((2, S), jnp.int32), None,
        jnp.ones((2, L), jnp.float32)))
    opt2 = shard_table_opt_state(tx.init(params2["params"]), mesh)
    state2 = TrainState(step=jnp.zeros((), jnp.int32), params=params2,
                        opt_state=opt2, dropout_rng=jax.random.PRNGKey(2))
    state2, payload = load_checkpoint(path, state2)
    assert payload["epoch"] == 1
    for b in batches[2:]:
        state2, loss_resumed = step(state2, b)

    np.testing.assert_allclose(float(loss_resumed), float(loss_direct),
                               rtol=0, atol=1e-6)
    for la, lb in zip(jax.tree.leaves(jax.device_get(cont.params)),
                      jax.tree.leaves(jax.device_get(state2.params))):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-7)


def test_save_checkpoint_nonzero_rank_does_not_write(tmp_path, monkeypatch):
    """process_index != 0: participates (returns the path) but writes no
    file — the reference's rank-0-only save, run.py:265-267."""
    from idvs.morec_tpu.train.checkpoint import save_checkpoint

    mesh = make_mesh(jax.devices("cpu")[:1])
    cfg = Config(item_tower="id", max_seq_len=L, embedding_dim=D,
                 compute_dtype="float32")
    model = make_model(cfg, item_num=50)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, L + 1), jnp.int32),
                        None, jnp.ones((2, L), jnp.float32))
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params["params"]),
                       dropout_rng=jax.random.PRNGKey(1))
    monkeypatch.setattr(jax, "process_index", lambda *a, **k: 1)
    out = tmp_path / "rank1"
    path = save_checkpoint(str(out), 2, state)
    assert path.endswith("epoch-2.ckpt")
    assert not os.path.exists(path) and not out.exists()
