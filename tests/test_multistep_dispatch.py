"""Multi-step dispatch (make_train_step(n_steps=k)) semantics.

One compiled program scanning k train steps must produce the same state and
per-step losses as k successive single-step dispatches — the feature only
amortizes the per-launch dispatch cost (~2.9 ms on the tunneled v5e-1, 57%
of an IDRec B=128 step; PARITY.md "IDRec bound"), never changes the math.
Covered: the single-device plain-jit path and the multi-device shard_map
path (reference DDP semantics, inbatch_sasrec_e2e_text/run.py:210-256).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from idvs.morec_tpu.train.state import TrainState, make_optimizer
from idvs.morec_tpu.train.step import make_train_step

K = 3  # steps per dispatch


def test_runner_steps_per_dispatch_exact(tmp_path):
    """Trainer with --steps_per_dispatch 3 reproduces the single-step run
    (same batch order, same per-step rng folding; the epoch tail that
    doesn't fill a group runs single-step). Scanned and straight-line
    programs compile to differently-associated float reductions, so equality
    is to ~1e-7 absolute (measured max 6e-8 over an epoch), not bitwise."""
    from tests.test_train_integration import make_trainer

    def run(sub, k):
        d = tmp_path / sub
        d.mkdir()
        tr = make_trainer(d, epoch=1, steps_per_dispatch=k,
                          compute_dtype="float32", drop_rate=0.1)
        tr.load_data()
        tr.build_model()
        tr.train()
        return jax.tree.map(np.asarray, tr.state.params), int(tr.state.step)

    p1, s1 = run("a", 1)
    pk, sk = run("b", K)
    assert s1 == sk and s1 > 0
    # steps_per_epoch not divisible by K exercises the single-step tail
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pk)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def _setup(n_devices: int):
    item_num, B_per, L, D = 150, 4, 6, 16
    S = L + 1
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B_per, num_attention_heads=2,
                 transformer_block=1, compute_dtype="float32",
                 gather_negatives=n_devices > 1)
    mesh = make_mesh(jax.devices()[:n_devices])
    model = make_model(cfg, item_num=item_num)
    rng = np.random.default_rng(7)
    B = B_per * n_devices
    ids = rng.integers(1, item_num + 1, size=(K, B, S)).astype(np.int32)
    lm = np.ones((K, B, L), dtype=np.float32)
    lm[:, :, 0] = 0.0
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[0, :2]), None,
                        jnp.asarray(lm[0, :2]))
    # host copies: the train step donates its state, which would delete the
    # device buffers shared between the two fresh_state() calls
    params = jax.tree.map(np.asarray, params)
    pop = np.full(item_num + 1, 1.0 / item_num)
    pop[0] = 1.0
    log_pop = jnp.asarray(np.log(pop), jnp.float32)
    tx = make_optimizer(cfg)

    def fresh_state():
        p = replicate(mesh, params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=p,
                          opt_state=tx.init(p["params"]),
                          dropout_rng=jax.random.PRNGKey(1))

    return cfg, model, tx, mesh, ids, lm, log_pop, fresh_state


@pytest.mark.parametrize("n_devices", [1, 4])
def test_multistep_matches_sequential(n_devices):
    cfg, model, tx, mesh, ids, lm, log_pop, fresh_state = _setup(n_devices)

    single = make_train_step(model, cfg, tx, mesh, log_pop=log_pop)
    multi = make_train_step(model, cfg, tx, mesh, log_pop=log_pop, n_steps=K)

    state_a = fresh_state()
    losses_seq = []
    for i in range(K):
        batch = shard_batch(mesh, {"ids": jnp.asarray(ids[i]),
                                   "log_mask": jnp.asarray(lm[i])})
        state_a, loss = single(state_a, batch)
        losses_seq.append(float(loss))

    state_b = fresh_state()
    stacked = {"ids": jnp.asarray(ids), "log_mask": jnp.asarray(lm)}
    state_b, losses = multi(state_b, stacked)

    assert losses.shape == (K,)
    np.testing.assert_allclose(np.asarray(losses), losses_seq, rtol=1e-6)
    assert int(state_b.step) == K
    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
