"""Pallas TPU kernel: fused in-batch debiased cross-entropy.

Computes ops/losses.py:inbatch_debiased_ce without materializing the
(B*L, B*S) logits matrix or the (B, L, B*S) rejection/one-hot booleans in
HBM: logits tiles live in VMEM only, with a flash-style online softmax over
column tiles; the same-user rejection mask is recomputed on the fly from a
per-row id list shipped as a tiny (M, S+1) metadata matrix (ids + label
column — precomputed on host, no in-kernel gathers).

Math per row r (user i = r // L, position j = r % L), column c:
    logit[r, c] = u[r] . cand[c] - log_pop[c]
    masked to -1e4 when colmask[c] == 0 or (cand_id[c] in ids[i] and
    c != label[r]), label[r] = i*S + j + 1
    loss = mean over rows with log_mask != 0 of CE(logit[r], label[r])

-1e4 is the reference's finite mask value (model/model.py:52,63);
exp(-1e4 - m) underflows to exactly 0 in f32, so results match the XLA path
up to reduction order.

Backward (custom VJP) recomputes logits tile-wise:
    dlogit[r, c] = (softmax[r, c] - onehot_label) * w[r] * g / n_valid
    du = dlogit @ cand ; dcand = dlogit^T @ u

Grid: (M_tiles, N_tiles); N is minor (sequential on TPU) so the online
max/sum accumulators live in VMEM scratch across column tiles. Row-level
stats are stored lane-replicated (bm, 128) to respect TPU tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VAL = -1e4
NEG_BIG = -1e9  # accumulator init; never leaks into results
LANES = 128


def _tile_logits(u, cand, logpop_row, colmask_row, meta, candids_row, n0, bn):
    """(bm, bn) masked logits. meta: (bm, S+1) int32 [user ids || label]."""
    bm = u.shape[0]
    S = meta.shape[1] - 1
    logits = jnp.dot(u, cand.T, preferred_element_type=jnp.float32)
    logits = logits - logpop_row[0][None, :]
    logits = jnp.where(colmask_row[0][None, :] == 0, MASK_VAL, logits)
    user_ids = meta[:, :S]
    labels = meta[:, S]
    cand_ids = candids_row[0]
    rej = jnp.any(user_ids[:, :, None] == cand_ids[None, None, :], axis=1)
    cols = n0 * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    is_label = cols == labels[:, None]
    logits = jnp.where(jnp.logical_and(rej, jnp.logical_not(is_label)),
                       MASK_VAL, logits)
    return logits, is_label


def _fwd_kernel(meta_ref, u_ref, cand_ref, logpop_ref, colmask_ref,
                candids_ref, ce_ref, m_out, l_out, m_scr, l_scr, t_scr,
                *, bn: int):
    ni = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    bm = u_ref.shape[0]

    @pl.when(ni == 0)
    def _():
        m_scr[:] = jnp.full((bm, LANES), NEG_BIG, jnp.float32)
        l_scr[:] = jnp.zeros((bm, LANES), jnp.float32)
        t_scr[:] = jnp.zeros((bm, LANES), jnp.float32)

    logits, is_label = _tile_logits(
        u_ref[:].astype(jnp.float32), cand_ref[:].astype(jnp.float32),
        logpop_ref[:], colmask_ref[:], meta_ref[:], candids_ref[:],
        ni, bn)

    m_prev = m_scr[:, :1]                                     # (bm, 1)
    tile_max = logits.max(axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, tile_max)
    scale = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * scale + jnp.exp(logits - m_new).sum(
        axis=1, keepdims=True)
    t_new = t_scr[:, :1] + jnp.where(is_label, logits, 0.0).sum(
        axis=1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, (bm, LANES))
    l_scr[:] = jnp.broadcast_to(l_new, (bm, LANES))
    t_scr[:] = jnp.broadcast_to(t_new, (bm, LANES))

    @pl.when(ni == n_tiles - 1)
    def _():
        ce = jnp.log(l_scr[:, :1]) + m_scr[:, :1] - t_scr[:, :1]
        ce_ref[:] = jnp.broadcast_to(ce, (bm, LANES))
        m_out[:] = m_scr[:]
        l_out[:] = l_scr[:]


def _bwd_kernel(meta_ref, u_ref, cand_ref, logpop_ref, colmask_ref,
                candids_ref, m_ref, l_ref, w_ref, du_ref, dcand_ref,
                *, bn: int):
    mi = pl.program_id(0)
    ni = pl.program_id(1)

    logits, is_label = _tile_logits(
        u_ref[:].astype(jnp.float32), cand_ref[:].astype(jnp.float32),
        logpop_ref[:], colmask_ref[:], meta_ref[:], candids_ref[:],
        ni, bn)
    p = jnp.exp(logits - m_ref[:, :1]) / l_ref[:, :1]
    dlogit = (p - is_label.astype(jnp.float32)) * w_ref[:, :1]  # (bm, bn)

    @pl.when(ni == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)
    du_ref[:] += jnp.dot(dlogit, cand_ref[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32)

    @pl.when(mi == 0)
    def _():
        dcand_ref[:] = jnp.zeros_like(dcand_ref)
    dcand_ref[:] += jnp.dot(dlogit.T, u_ref[:].astype(jnp.float32),
                            preferred_element_type=jnp.float32)


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _prep(user_vec, item_ids, log_mask, cand_e, cand_i, cand_cm, cand_lp,
          label_off, L, bm, bn):
    """Rows are always local (user_vec, item_ids, log_mask); candidates may
    be the local batch or the gathered global batch (gather_negatives)."""
    B, _, D = user_vec.shape
    S = L + 1
    M = B * L
    N = cand_e.shape[0] * S
    Mp = ((M + bm - 1) // bm) * bm
    Np = ((N + bn - 1) // bn) * bn
    u = _pad_to(user_vec.reshape(M, D).astype(jnp.float32), Mp)
    cand = _pad_to(cand_e.reshape(N, D).astype(jnp.float32), Np)
    logpop = _pad_to(cand_lp.reshape(1, N).astype(jnp.float32), Np, axis=1)
    colmask = _pad_to(cand_cm.reshape(1, N).astype(jnp.float32), Np, axis=1)
    cand_ids = _pad_to(cand_i.reshape(1, N).astype(jnp.int32), Np,
                       axis=1, value=-1)
    # per-row metadata: [user's S ids || label column index]
    rows = jnp.arange(M)
    users = rows // L
    labels = (label_off + users * S + rows % L + 1).astype(jnp.int32)
    meta = jnp.concatenate(
        [item_ids.astype(jnp.int32)[users], labels[:, None]], axis=1)
    meta = _pad_to(meta, Mp, value=-2)  # padded rows: ids -2 never match
    w = (log_mask.reshape(M) != 0).astype(jnp.float32)
    w = _pad_to(w, Mp)
    return u, cand, logpop, colmask, cand_ids, meta, w, M, N, Mp, Np, S, D


def _full_specs(meta, bm, bn, D, S):
    return [
        pl.BlockSpec((bm, S + 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),                 # meta
        pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _fused_ce(user_vec, cand_embs, item_ids, log_mask, cand_ids,
              cand_colmask, cand_logpop, label_off,
              L: int, bm: int, bn: int, interpret: bool):
    loss, _ = _fused_ce_fwd(user_vec, cand_embs, item_ids, log_mask,
                            cand_ids, cand_colmask, cand_logpop, label_off,
                            L, bm, bn, interpret)
    return loss


def _run_fwd(u, cand, logpop, colmask, cand_ids, meta, bm, bn, D, S,
             Mp, Np, interpret):
    grid = (Mp // bm, Np // bn)
    out_spec = pl.BlockSpec((bm, LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bn=bn),
        grid=grid,
        in_specs=_full_specs(meta, bm, bn, D, S),
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((Mp, LANES), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((bm, LANES), jnp.float32)] * 3,
        interpret=interpret,
    )(meta, u, cand, logpop, colmask, cand_ids)


def _fused_ce_fwd(user_vec, cand_embs, item_ids, log_mask, cand_ids_in,
                  cand_colmask, cand_logpop, label_off,
                  L, bm, bn, interpret):
    (u, cand, logpop, colmask, cand_ids, meta, w,
     M, N, Mp, Np, S, D) = _prep(user_vec, item_ids, log_mask, cand_embs,
                                 cand_ids_in, cand_colmask, cand_logpop,
                                 label_off, L, bm, bn)
    ce, m_arr, l_arr = _run_fwd(u, cand, logpop, colmask, cand_ids, meta,
                                bm, bn, D, S, Mp, Np, interpret)
    n_valid = jnp.maximum(w.sum(), 1.0)
    loss = (ce[:, 0] * w).sum() / n_valid
    return loss, (user_vec, cand_embs, item_ids, log_mask, cand_ids_in,
                  cand_colmask, cand_logpop, label_off, m_arr, l_arr)


def _fused_ce_bwd(L, bm, bn, interpret, res, g):
    (user_vec, cand_embs, item_ids, log_mask, cand_ids_in, cand_colmask,
     cand_logpop, label_off, m_arr, l_arr) = res
    (u, cand, logpop, colmask, cand_ids, meta, w,
     M, N, Mp, Np, S, D) = _prep(user_vec, item_ids, log_mask, cand_embs,
                                 cand_ids_in, cand_colmask, cand_logpop,
                                 label_off, L, bm, bn)
    n_valid = jnp.maximum(w.sum(), 1.0)
    w_scaled = jnp.broadcast_to((w * g / n_valid)[:, None], (Mp, LANES))

    stat_spec = pl.BlockSpec((bm, LANES), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    du, dcand = pl.pallas_call(
        functools.partial(_bwd_kernel, bn=bn),
        grid=(Mp // bm, Np // bn),
        in_specs=_full_specs(meta, bm, bn, D, S) + [stat_spec] * 3,
        out_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Mp, D), jnp.float32),
                   jax.ShapeDtypeStruct((Np, D), jnp.float32)],
        interpret=interpret,
    )(meta, u, cand, logpop, colmask, cand_ids, m_arr, l_arr, w_scaled)

    B = user_vec.shape[0]
    du = du[:M].reshape(B, L, D).astype(user_vec.dtype)
    dcand = dcand[:N].reshape(cand_embs.shape).astype(cand_embs.dtype)
    return du, dcand, None, None, None, None, None, None


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def _tiles(M, N, bm, bn):
    bm = max(8, min(bm, M))
    while M % bm:
        bm //= 2
    bn = max(128, min(bn, N))
    return bm, bn


def fused_inbatch_ce(user_vec, item_embs, item_ids, log_mask, log_pop,
                     bm: int = 128, bn: int = 512, interpret: bool = False):
    """Drop-in fused replacement for ops.losses.inbatch_debiased_ce with
    LOCAL negatives. log_pop is (B, S) like the XLA path."""
    B, L, D = user_vec.shape
    bm, bn = _tiles(B * L, B * (L + 1), bm, bn)
    colmask = jnp.concatenate(
        [log_mask, jnp.ones((B, 1), log_mask.dtype)], axis=1)
    return _fused_ce(user_vec, item_embs, item_ids, log_mask, item_ids,
                     colmask, log_pop, jnp.zeros((), jnp.int32),
                     L, bm, bn, interpret)


def fused_inbatch_ce_gathered(user_vec, item_embs, item_ids, log_mask,
                              log_pop, axis_name: str,
                              bm: int = 128, bn: int = 512,
                              interpret: bool = False):
    """gather_negatives edition (inside shard_map): candidates are
    all-gathered across `axis_name`; rows stay local. The gradient wrt the
    gathered candidates flows back through all_gather's transpose.

    This is the kernel's target regime: with W chips the logits matrix is
    (B*L, W*B*S) and materializing it in HBM (the XLA path) costs W times
    more than single-chip — the fused kernel keeps tiles in VMEM."""
    B, L, D = user_vec.shape
    S = L + 1
    cand_embs = jax.lax.all_gather(item_embs, axis_name, tiled=True)
    cand_ids = jax.lax.all_gather(item_ids, axis_name, tiled=True)
    colmask = jnp.concatenate(
        [log_mask, jnp.ones((B, 1), log_mask.dtype)], axis=1)
    cand_colmask = jax.lax.all_gather(colmask, axis_name, tiled=True)
    cand_logpop = jax.lax.all_gather(log_pop, axis_name, tiled=True)
    label_off = (jax.lax.axis_index(axis_name) * B * S).astype(jnp.int32)
    W = cand_embs.shape[0] // B
    bm, bn = _tiles(B * L, W * B * S, bm, bn)
    return _fused_ce(user_vec, cand_embs, item_ids, log_mask, cand_ids,
                     cand_colmask, cand_logpop, label_off,
                     L, bm, bn, interpret)
