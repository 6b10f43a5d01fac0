"""Retrieval serving engine (idvs/morec_tpu/serve.py) vs naive numpy."""

import numpy as np

import jax
import jax.numpy as jnp

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.models.model import make_model
from idvs.morec_tpu.serve import Retriever, pad_histories

ITEMS, L, D = 50, 6, 16


def _build(user_tower="sasrec"):
    cfg = Config(item_tower="id",
                 loss="bce" if user_tower == "dssm" else "inbatch_ce",
                 max_seq_len=L, embedding_dim=D, batch_size=4,
                 num_attention_heads=2, transformer_block=1,
                 user_tower=user_tower, dnn_layers=0)
    model = make_model(cfg, item_num=ITEMS, user_num=9, encoder=None)
    if user_tower == "sasrec":
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, L + 1), jnp.int32), None,
                            jnp.zeros((2, L), jnp.float32))
    else:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 1 + 1), jnp.int32), None,
                            jnp.zeros((2, 1), jnp.float32),
                            jnp.zeros((2,), jnp.int32))
    table = Retriever.encode_catalog(model, params, ITEMS, None, D)
    return model, params, table


def _naive_topk(model, params, table, histories, k, exclude=True):
    ids, mask = pad_histories(histories, L)
    embs = np.asarray(table)[ids]
    states = model.apply(params, jnp.asarray(embs), jnp.asarray(mask), True,
                         method="user_states")
    uvec = np.asarray(states)[:, -1]
    scores = uvec @ np.asarray(table).T
    scores[:, 0] = -np.inf
    if exclude:
        for i, h in enumerate(histories):
            scores[i, list(h)] = -np.inf
    idx = np.argsort(-scores, axis=1)[:, :k]
    return idx, np.take_along_axis(scores, idx, axis=1)


def test_recommend_matches_naive_topk():
    model, params, table = _build()
    hist = [[3, 7, 11], [5], [2, 2, 9, 40, 41, 42, 43]]  # >L history too
    got_ids, got_scores = Retriever(
        model, params, table, max_seq_len=L,
        batch_sizes=(4,)).recommend(hist, top_k=5)
    want_ids, want_scores = _naive_topk(model, params, table, hist, 5)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5, atol=1e-6)
    # ids can differ only inside exact score ties
    for g, w, gs, ws in zip(got_ids, want_ids, got_scores, want_scores):
        mismatch = g != w
        assert (gs[mismatch] == ws[mismatch]).all()


def test_history_and_padding_never_recommended():
    model, params, table = _build()
    hist = [[1, 2, 3, 4, 5, 6]]
    ids, _ = Retriever(model, params, table, max_seq_len=L,
                       batch_sizes=(1,)).recommend(hist, top_k=ITEMS - 7)
    assert 0 not in ids
    assert not (set(hist[0]) & set(ids[0].tolist()))


def test_exclude_history_off_keeps_history_candidates():
    model, params, table = _build()
    r = Retriever(model, params, table, max_seq_len=L, batch_sizes=(1,),
                  exclude_history=False)
    ids, _ = r.recommend([[1, 2, 3]], top_k=ITEMS)
    assert set([1, 2, 3]) <= set(ids[0].tolist())
    assert 0 not in ids  # padding item still excluded


def test_batch_bucketing_pads_and_slices():
    model, params, table = _build()
    r = Retriever(model, params, table, max_seq_len=L, batch_sizes=(4, 8))
    one, _ = r.recommend([[3, 7]], top_k=3)          # pads 1 -> 4
    four, _ = r.recommend([[3, 7]] * 4, top_k=3)     # exact bucket
    assert one.shape == (1, 3) and four.shape == (4, 3)
    np.testing.assert_array_equal(one[0], four[0])


def test_update_items_changes_ranking():
    model, params, table = _build()
    r = Retriever(model, params, table, max_seq_len=L, batch_sizes=(1,))
    ids0, _ = r.recommend([[3, 7]], top_k=1)
    # plant a new item whose embedding IS the user's vector -> must win
    hist_ids, mask = pad_histories([[3, 7]], L)
    embs = np.asarray(table)[hist_ids]
    states = model.apply(params, jnp.asarray(embs), jnp.asarray(mask), True,
                         method="user_states")
    uvec = np.asarray(states)[0, -1]
    r.update_items([49], embeddings=jnp.asarray(uvec[None] * 100.0))
    ids1, _ = r.recommend([[3, 7]], top_k=1)
    assert ids1[0, 0] == 49
    assert ids0[0, 0] != 49 or True


def test_dssm_user_serving():
    model, params, table = _build(user_tower="dssm")
    r = Retriever(model, params, table, user_tower="dssm",
                  max_seq_len=1, batch_sizes=(2,))
    ids, scores = r.recommend_users([1, 5], top_k=4)
    uvec = np.asarray(model.apply(params, jnp.asarray([1, 5], jnp.int32),
                                  True, method="user_vec"))
    want = uvec @ np.asarray(table).T
    want[:, 0] = -np.inf
    widx = np.argsort(-want, axis=1)[:, :4]
    np.testing.assert_allclose(
        scores, np.take_along_axis(want, widx, axis=1), rtol=1e-5, atol=1e-6)


def test_sharded_catalog_matches_single_device():
    """Catalog sharded over the 8-device mesh: local top-k + all-gather
    merge == the single-device engine (same weights, same queries)."""
    from idvs.morec_tpu.parallel.mesh import make_mesh
    model, params, table = _build()
    mesh = make_mesh(jax.devices())
    assert int(np.prod(list(mesh.shape.values()))) == 8
    single = Retriever(model, params, table, max_seq_len=L,
                       batch_sizes=(4,))
    sharded = Retriever(model, params, table, max_seq_len=L,
                        batch_sizes=(4,), mesh=mesh)
    hist = [[3, 7, 11], [5], [2, 9, 40, 41], [48, 1]]
    ids_s, sc_s = single.recommend(hist, top_k=5)
    ids_m, sc_m = sharded.recommend(hist, top_k=5)
    np.testing.assert_allclose(sc_m, sc_s, rtol=1e-5, atol=1e-6)
    mismatch = ids_m != ids_s
    assert (sc_m[mismatch] == sc_s[mismatch]).all()   # ties only


def test_sharded_update_items_stays_sharded_and_correct():
    """update_items on a mesh-sharded catalog must keep the table row-sharded
    (no full-copy re-replication) and serve the spliced item correctly."""
    from idvs.morec_tpu.parallel.mesh import make_mesh
    model, params, table = _build()
    mesh = make_mesh(jax.devices())
    r = Retriever(model, params, table, max_seq_len=L,
                  batch_sizes=(1,), mesh=mesh)
    n = 8
    total = int(r.item_table.shape[0])
    assert total % n == 0

    hist_ids, mask = pad_histories([[3, 7]], L)
    embs = np.asarray(table)[hist_ids]
    states = model.apply(params, jnp.asarray(embs), jnp.asarray(mask), True,
                         method="user_states")
    uvec = np.asarray(states)[0, -1]
    r.update_items([49], embeddings=jnp.asarray(uvec[None] * 100.0))

    # still one row block per device, not a replicated copy
    shard_rows = {s.data.shape[0] for s in r.item_table.addressable_shards}
    assert shard_rows == {total // n}, shard_rows
    ids1, _ = r.recommend([[3, 7]], top_k=1)
    assert ids1[0, 0] == 49
    # and the spliced row round-trips exactly
    np.testing.assert_allclose(np.asarray(r.item_table[49]), uvec * 100.0,
                               rtol=1e-6, atol=0)
