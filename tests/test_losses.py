"""Golden-value tests: each vectorized JAX loss vs a deliberately naive,
loop-based numpy re-derivation of the reference math
(inbatch_sasrec_e2e_text/model/model.py:31-69,
bce_text/main-end2end/model/model.py:30-51,
bce_text/main-end2end(DSSM)/model/model.py:32-43).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from idvs.morec_tpu.ops.losses import (
    inbatch_debiased_ce, bce_sasrec_loss, bce_dssm_loss)


def _softmax_ce_row(logits_row, label):
    m = logits_row.max()
    logsumexp = m + np.log(np.exp(logits_row - m).sum())
    return logsumexp - logits_row[label]


def naive_inbatch_ce(user_vec, item_embs, item_ids, log_mask, pop_prob):
    """Loop transcription of reference model.py:31-69 in pure numpy."""
    B, L, D = user_vec.shape
    S = L + 1
    flat_ids = item_ids.reshape(-1)
    debias = np.log(pop_prob[flat_ids])
    logits = user_vec.reshape(B * L, D) @ item_embs.reshape(B * S, D).T
    logits = logits - debias[None, :]
    colmask = np.concatenate([log_mask, np.ones((B, 1))], axis=1).reshape(-1)
    logits[:, colmask == 0] = -1e4
    logits = logits.reshape(B, L, B * S)
    for i in range(B):
        reject_list = item_ids[i]  # full padded row, S ids
        for j in range(L):
            for c in range(B * S):
                if flat_ids[c] in reject_list and c != i * S + j + 1:
                    logits[i, j, c] = -1e4
    losses, count = 0.0, 0
    for i in range(B):
        for j in range(L):
            if log_mask[i, j] != 0:
                losses += _softmax_ce_row(logits[i, j], i * S + j + 1)
                count += 1
    return losses / count


def _rand_batch(rng, B=3, L=5, D=8, item_num=40):
    S = L + 1
    lens = rng.integers(2, S + 1, size=B)
    item_ids = np.zeros((B, S), dtype=np.int32)
    for b in range(B):
        item_ids[b, S - lens[b]:] = rng.integers(1, item_num + 1, size=lens[b])
    log_mask = np.zeros((B, L), dtype=np.float32)
    for b in range(B):
        log_mask[b, S - lens[b]:] = 1.0
    user_vec = rng.normal(size=(B, L, D)).astype(np.float32)
    item_embs = rng.normal(size=(B, S, D)).astype(np.float32)
    pop = rng.uniform(0.01, 1.0, size=item_num + 1)
    pop[0] = 1.0
    return user_vec, item_embs, item_ids, log_mask, pop


def test_inbatch_ce_matches_naive():
    rng = np.random.default_rng(0)
    user_vec, item_embs, item_ids, log_mask, pop = _rand_batch(rng)
    want = naive_inbatch_ce(user_vec, item_embs, item_ids, log_mask, pop)
    log_pop = np.log(pop[item_ids])
    got = inbatch_debiased_ce(jnp.asarray(user_vec), jnp.asarray(item_embs),
                              jnp.asarray(item_ids), jnp.asarray(log_mask),
                              jnp.asarray(log_pop))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4)


def test_inbatch_ce_duplicate_items_rejected():
    """A duplicated item across two users must be masked as a negative for
    both, except at its own label position."""
    rng = np.random.default_rng(1)
    user_vec, item_embs, item_ids, log_mask, pop = _rand_batch(rng, B=2, L=4)
    item_ids[0, -1] = item_ids[1, -1] = 7  # force a cross-user duplicate
    want = naive_inbatch_ce(user_vec, item_embs, item_ids, log_mask, pop)
    log_pop = np.log(pop[item_ids])
    got = inbatch_debiased_ce(jnp.asarray(user_vec), jnp.asarray(item_embs),
                              jnp.asarray(item_ids), jnp.asarray(log_mask),
                              jnp.asarray(log_pop))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4)


def naive_bce_sasrec(user_vec, pos_embs, neg_embs, log_mask):
    def bce(x, y):
        return np.log1p(np.exp(-abs(x))) + max(x, 0) - x * y
    pos_score = (user_vec * pos_embs).sum(-1)
    neg_score = (user_vec * neg_embs).sum(-1)
    sel = log_mask != 0
    pos_losses = [bce(s, 1.0) for s in pos_score[sel]]
    neg_losses = [bce(s, 0.0) for s in neg_score[sel]]
    return np.mean(pos_losses) + np.mean(neg_losses)


def test_bce_sasrec_matches_naive():
    rng = np.random.default_rng(2)
    B, L, D = 3, 5, 8
    user_vec = rng.normal(size=(B, L, D)).astype(np.float32)
    pos = rng.normal(size=(B, L, D)).astype(np.float32)
    neg = rng.normal(size=(B, L, D)).astype(np.float32)
    log_mask = (rng.uniform(size=(B, L)) > 0.4).astype(np.float32)
    log_mask[:, -1] = 1.0
    want = naive_bce_sasrec(user_vec, pos, neg, log_mask)
    got = bce_sasrec_loss(jnp.asarray(user_vec), jnp.asarray(pos),
                          jnp.asarray(neg), jnp.asarray(log_mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_bce_dssm_matches_naive():
    rng = np.random.default_rng(3)
    B, N, D = 4, 3, 8
    user = rng.normal(size=(B, D)).astype(np.float32)
    items = rng.normal(size=(B, N, D)).astype(np.float32)
    labels = np.zeros((B, N), dtype=np.float32)
    labels[:, 0] = 1.0
    scores = np.einsum("bnd,bd->bn", items, user)
    want = np.mean(np.logaddexp(0, scores) - scores * labels)
    got = bce_dssm_loss(jnp.asarray(user), jnp.asarray(items), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_inbatch_ce_gathered_equals_single_when_one_shard():
    """gather_negatives over a 1-device axis must equal the plain loss."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(4)
    user_vec, item_embs, item_ids, log_mask, pop = _rand_batch(rng)
    log_pop = np.log(pop[item_ids]).astype(np.float32)
    plain = inbatch_debiased_ce(jnp.asarray(user_vec), jnp.asarray(item_embs),
                                jnp.asarray(item_ids), jnp.asarray(log_mask),
                                jnp.asarray(log_pop))
    mesh = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    fn = shard_map(
        lambda u, e, i, m, p: jax.lax.pmean(
            inbatch_debiased_ce(u, e, i, m, p, axis_name="data",
                                gather_negatives=True), "data"),
        mesh=mesh,
        in_specs=(P("data"),) * 5, out_specs=P())
    got = fn(user_vec, item_embs, item_ids, log_mask, log_pop)
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain), rtol=1e-5)


def test_gathered_negatives_match_global_batch():
    """8-way sharded gather_negatives == single-device loss over the full
    global batch (with equal per-shard valid counts, mean-of-means == mean)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(7)
    B, L, D, item_num = 16, 4, 8, 40  # 2 rows/shard on 8 devices
    S = L + 1
    item_ids = rng.integers(1, item_num + 1, size=(B, S)).astype(np.int32)
    log_mask = np.ones((B, L), dtype=np.float32)  # equal valid counts
    user_vec = rng.normal(size=(B, L, D)).astype(np.float32)
    item_embs = rng.normal(size=(B, S, D)).astype(np.float32)
    pop = rng.uniform(0.01, 1.0, size=item_num + 1); pop[0] = 1.0
    log_pop = np.log(pop[item_ids]).astype(np.float32)

    global_loss = inbatch_debiased_ce(
        jnp.asarray(user_vec), jnp.asarray(item_embs), jnp.asarray(item_ids),
        jnp.asarray(log_mask), jnp.asarray(log_pop))

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    fn = jax.shard_map(
        lambda u, e, i, m, p: jax.lax.pmean(
            inbatch_debiased_ce(u, e, i, m, p, axis_name="data",
                                gather_negatives=True), "data"),
        mesh=mesh, in_specs=(P("data"),) * 5, out_specs=P(),
        check_vma=False)
    sharded_loss = fn(user_vec, item_embs, item_ids, log_mask, log_pop)
    np.testing.assert_allclose(np.asarray(sharded_loss),
                               np.asarray(global_loss), rtol=1e-5)
