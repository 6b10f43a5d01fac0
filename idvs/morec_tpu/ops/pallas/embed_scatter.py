"""Pallas TPU kernel: dense scatter-add for the embedding-table backward.

The word-embedding backward is dE[ids[i]] += dX[i] over M = B*T*num_words
token rows into the (V, D) vocab table. XLA lowers this scatter-add
serially enough that it was measured at ~9.1 ms/step on the BERT-small
bench geometry (PARITY.md ablation matrix, `sgemb` row) — ~20x off the
HBM roofline for the ~230 MB of actual traffic. Every XLA-level
reformulation (sorted segment_sum, prefix-sum-difference gathers) measured
WORSE (PARITY.md dead-end log); this kernel is the remaining structural
lever: keep the whole (V, bd) gradient-table stripe RESIDENT IN VMEM as
the kernel output across a sequential grid over token blocks, stream dX
through, and do the per-row read-modify-write at VMEM latency instead of
HBM latency. HBM then sees dX exactly once in and the table exactly once
out.

Semantics match `jax.lax.scatter-add`'s (i.e. nn.Embed's backward) up to
f32 accumulation order: duplicates accumulate in token order within the
kernel; accumulation is always f32 even when dX is bf16 (XLA accumulates
bf16 there — the kernel is strictly tighter).

Reference semantics being accelerated: the torch embedding backward inside
the reference's BERT encoder (reference inbatch_sasrec_e2e_text/run.py
Model -> TextEncoder -> BertModel word_embeddings), an implicit
`index_add_` in torch autograd. Math is identical; only the schedule is
TPU-native.

Grid: (D_blocks, M_blocks) with M minor (sequential on TPU), so the
(Vp, bd) output stripe persists in VMEM across all token blocks of one
column stripe and is written back once per stripe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, dx_ref, out_ref, *, bm: int):
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, carry):
        r = ids_ref[0, i]
        out_ref[pl.ds(r, 1), :] += dx_ref[pl.ds(i, 1), :]
        return carry

    jax.lax.fori_loop(0, bm, body, 0)


def _pad_axis(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def scatter_add_rows(ids, dx, num_rows: int, *, bm: int = 1024,
                     bd: int = 512, interpret: bool = False):
    """sum_i onehot(ids[i], num_rows)[:, None] * dx[i] as (num_rows, D) f32.

    ids: (M,) int32 in [0, num_rows); dx: (M, D) f32/bf16. Rows whose dx is
    all-zero may carry any valid id (padding convention: id 0, dx 0).
    """
    M, D = dx.shape
    # Mosaic cannot dynamically sublane-index packed bf16 rows; stream dX as
    # f32 (2x the dX read, ~0.1 ms at bench geometry — accumulation is f32
    # regardless)
    dx = dx.astype(jnp.float32)
    Vp = ((num_rows + 7) // 8) * 8
    bd = min(bd, ((D + 127) // 128) * 128)
    Mp = ((M + bm - 1) // bm) * bm
    Dp = ((D + bd - 1) // bd) * bd
    ids = _pad_axis(ids.astype(jnp.int32), Mp, 0).reshape(1, Mp)
    dx = _pad_axis(_pad_axis(dx, Mp, 0), Dp, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, bm=bm),
        grid=(Dp // bd, Mp // bm),
        in_specs=[
            pl.BlockSpec((1, bm), lambda d, m: (0, m),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bd), lambda d, m: (m, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Vp, bd), lambda d, m: (0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, Dp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(ids, dx)
    return out[:num_rows, :D]


# The VMEM-resident (Vp, bd) stripe is the design; tables whose f32 stripe
# cannot fit stay on the XLA scatter. bd floor is one lane tile (128).
_VMEM_STRIPE_BYTES = 96 * 1024 * 1024


def kernel_supported(num_rows: int, d: int) -> bool:
    Vp = ((num_rows + 7) // 8) * 8
    return Vp * 128 * 4 <= _VMEM_STRIPE_BYTES


def _stripe_bd(num_rows: int, d: int) -> int:
    Vp = ((num_rows + 7) // 8) * 8
    bd = 512
    while bd > 128 and Vp * bd * 4 > _VMEM_STRIPE_BYTES:
        bd //= 2
    return bd


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _embed_gather(table, ids, num_rows: int, interpret: bool):
    return table[ids]


def _embed_gather_fwd(table, ids, num_rows, interpret):
    return table[ids], ids


def _embed_gather_bwd(num_rows, interpret, ids, g):
    D = g.shape[-1]
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, D)
    dtab = scatter_add_rows(flat_ids, flat_g, num_rows,
                            bd=_stripe_bd(num_rows, D), interpret=interpret)
    return dtab.astype(g.dtype), None


_embed_gather.defvjp(_embed_gather_fwd, _embed_gather_bwd)


def embed_gather(table, ids, interpret: bool = False):
    """table[ids] with the backward scatter-add running as the Pallas
    kernel above. Forward is the plain XLA gather (already fast)."""
    return _embed_gather(table, ids, table.shape[0], interpret)
