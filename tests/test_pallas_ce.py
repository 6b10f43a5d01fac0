"""Fused Pallas in-batch CE vs the XLA reference implementation
(interpret mode on CPU; the real-TPU path is exercised by bench/graft)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idvs.morec_tpu.ops.losses import inbatch_debiased_ce
from idvs.morec_tpu.ops.pallas.inbatch_ce import fused_inbatch_ce


def _batch(rng, B=4, L=8, D=32, item_num=50):
    S = L + 1
    lens = rng.integers(2, S + 1, size=B)
    item_ids = np.zeros((B, S), dtype=np.int32)
    for b in range(B):
        item_ids[b, S - lens[b]:] = rng.integers(1, item_num + 1, size=lens[b])
    # force a cross-user duplicate to exercise rejection
    item_ids[0, -1] = item_ids[1, -1] = 7
    log_mask = np.zeros((B, L), dtype=np.float32)
    for b in range(B):
        log_mask[b, S - lens[b]:] = 1.0
    user_vec = rng.normal(size=(B, L, D)).astype(np.float32)
    item_embs = rng.normal(size=(B, S, D)).astype(np.float32)
    pop = rng.uniform(0.01, 1.0, size=item_num + 1)
    pop[0] = 1.0
    log_pop = np.log(pop[item_ids]).astype(np.float32)
    return (jnp.asarray(user_vec), jnp.asarray(item_embs),
            jnp.asarray(item_ids), jnp.asarray(log_mask),
            jnp.asarray(log_pop))


@pytest.mark.parametrize("bm,bn", [(8, 128), (16, 128)])
def test_fused_ce_forward_matches_xla(bm, bn):
    args = _batch(np.random.default_rng(0))
    want = inbatch_debiased_ce(*args)
    got = fused_inbatch_ce(*args, bm=bm, bn=bn, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_fused_ce_grads_match_xla():
    args = _batch(np.random.default_rng(1))

    ref_g = jax.grad(lambda u, e: inbatch_debiased_ce(u, e, *args[2:]),
                     argnums=(0, 1))(args[0], args[1])
    got_g = jax.grad(lambda u, e: fused_inbatch_ce(u, e, *args[2:],
                                                   bm=8, bn=128,
                                                   interpret=True),
                     argnums=(0, 1))(args[0], args[1])
    np.testing.assert_allclose(np.asarray(got_g[0]), np.asarray(ref_g[0]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=2e-4, atol=1e-6)


def test_fused_ce_nondivisible_shapes():
    """M and N not multiples of the tile sizes exercise the padding path."""
    args = _batch(np.random.default_rng(2), B=3, L=5, D=16, item_num=30)
    want = inbatch_debiased_ce(*args)
    got = fused_inbatch_ce(*args, bm=8, bn=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_fused_gathered_matches_xla_gathered():
    """fused_inbatch_ce_gathered under a 4-shard mesh == XLA gather path."""
    from jax.sharding import Mesh, PartitionSpec as P
    from idvs.morec_tpu.ops.pallas.inbatch_ce import fused_inbatch_ce_gathered

    rng = np.random.default_rng(5)
    B, L, D, item_num = 8, 4, 16, 40
    S = L + 1
    item_ids = rng.integers(1, item_num + 1, size=(B, S)).astype(np.int32)
    log_mask = np.ones((B, L), dtype=np.float32)
    user_vec = rng.normal(size=(B, L, D)).astype(np.float32)
    item_embs = rng.normal(size=(B, S, D)).astype(np.float32)
    pop = rng.uniform(0.01, 1.0, size=item_num + 1); pop[0] = 1.0
    log_pop = np.log(pop[item_ids]).astype(np.float32)

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("data",))

    def xla_fn(u, e, i, m, p):
        return jax.lax.pmean(inbatch_debiased_ce(
            u, e, i, m, p, axis_name="data", gather_negatives=True), "data")

    def fused_fn(u, e, i, m, p):
        return jax.lax.pmean(fused_inbatch_ce_gathered(
            u, e, i, m, p, "data", bm=8, bn=128, interpret=True), "data")

    args = (user_vec, item_embs, item_ids, log_mask, log_pop)
    want = jax.shard_map(xla_fn, mesh=mesh, in_specs=(P("data"),) * 5,
                         out_specs=P(), check_vma=False)(*args)
    got = jax.shard_map(fused_fn, mesh=mesh, in_specs=(P("data"),) * 5,
                        out_specs=P(), check_vma=False)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    # gradients through the gather transpose
    def loss_of(fn):
        def f(u, e):
            g = jax.shard_map(fn, mesh=mesh, in_specs=(P("data"),) * 5,
                              out_specs=P(), check_vma=False)
            return g(u, e, item_ids, log_mask, log_pop)
        return jax.grad(f, argnums=(0, 1))(jnp.asarray(user_vec),
                                           jnp.asarray(item_embs))
    gw = loss_of(xla_fn)
    gg = loss_of(fused_fn)
    np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gw[0]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gw[1]),
                               rtol=2e-4, atol=1e-6)
