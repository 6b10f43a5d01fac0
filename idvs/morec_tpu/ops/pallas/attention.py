"""Fused multi-head self-attention Pallas kernel for short sequences.

Why: XLA's attention lowering needs (batch, head)-major layouts for the
batched (T,T) score matmuls, so it transposes Q/K/V around every attention
call AND propagates the transposed {seq-major} layout into the whole
residual stream — on v5e the BERT-small encoder step spends ~20% in pure
layout copies and mixed-layout elementwise fusions (trace analysis in
PARITY.md). This kernel consumes the QKV projection's NATURAL (B, T, 3H)
output, does the head split / (T,T) softmax dance entirely in VMEM, and
writes the context back in (B, T, H) — no HBM layout changes anywhere.

Scope: encoder-style bidirectional attention with a key-validity mask
(BERT/RoBERTa semantics: bias = (1-mask)*-1e9 on keys, reference
model/encoders.py pools over HF BERT), sequence lengths ~8..128 where the
whole (T, T) score tile fits VMEM — no KV tiling needed (flash-attention's
streaming is for long T; MoRec titles are T=30).

Exact math parity with the XLA path (models/bert.py BertSelfAttention):
scores = (q·k)/sqrt(dh) f32 + bias, softmax f32, probs cast to input dtype,
attention-prob dropout (train), ctx = probs·v with f32 accumulation.
Dropout uses the TPU PRNG seeded from the flax dropout key, so draws differ
from flax's threefry BITS but have identical Bernoulli semantics; backward
regenerates the same mask (flash-style, nothing stored but qkv).

Backward is a custom VJP: recompute scores/probs per head, then
  dv = dropped_probsᵀ·dctx, dprobs = dctx·vᵀ (un-dropped),
  dscores = probs*(dprobs - Σ probs*dprobs), dq = dscores·k, dk = dscoresᵀ·q
all in f32, packed straight into the (B, T, 3H) cotangent — the dW_qkv and
dx matmuls downstream see natural layouts too.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _pick_block(B: int) -> int:
    # Mosaic wants the mask block's second-to-last dim (NB) divisible by 8;
    # the wrapper pads B up to a multiple of the chosen block. NB=16 keeps
    # the backward kernel's double-buffered blocks (qkv + dout + dqkv at
    # 3H wide) under the 16 MB VMEM budget at H=512/T=30.
    for nb in (16, 8):
        if B % nb == 0:
            return nb
    return 8


def _pick_block_bias(T: int, H3: int, nh: int, rows: int, B: int,
                     itemsize: int, bias_grad: bool) -> int:
    """VMEM-budget-aware row-block size for the full-bias path. Mosaic pads
    the last two dims of every block to tiles — (T, T) biases become
    (pad8(T), pad128(T)) — so big-nh stages (Swin stage 3/4) blow the
    16 MB scoped budget at NB=16, while tiny blocks drown the short-T Swin
    shapes in per-grid-step overhead (~7 us each). Estimate the backward
    call's footprint (the worst case: qkv + dout + dqkv double-buffered IO
    blocks plus the bias blocks / resident f32 dbias accumulator) and take
    the largest block that fits."""
    sub = 16 if itemsize == 2 else 8
    Ts = -(-T // sub) * sub            # qkv/dout sublane padding
    T8 = -(-T // 8) * 8                # bias sublane padding (f32 tile)
    Tl = -(-T // 128) * 128
    Hl = -(-H3 // 128) * 128
    Hl3 = -(-(H3 // 3) // 128) * 128
    bias_row = nh * T8 * Tl * itemsize     # bias rides in the qkv dtype
    dbias_row = nh * T8 * Tl * 4 if bias_grad else 0

    def pick(bwd: bool) -> int:
        for nb in (32, 16, 8, 4, 2):
            io = 2 * nb * Ts * Hl * itemsize           # qkv in (dbl-buffered)
            io += 2 * nb * Ts * Hl3 * itemsize         # out / dout
            # live f32 (nb, T, T) temporaries: scores/probs(+casts) fwd;
            # + dropped/dprobs/dscores and the dbias staging in bwd
            tmp = (6 if bwd else 3) * nb * T8 * Tl * 4
            bias = 0
            if bwd:
                io += 2 * nb * Ts * Hl * itemsize      # dqkv out
            if rows == B:      # full bias: blocks in (+ dbias blocks out)
                bias = 2 * nb * (bias_row + (dbias_row if bwd else 0))
            elif rows > nb:    # cyclic blocks in + resident dbias
                bias = 2 * nb * bias_row + (rows * dbias_row if bwd else 0)
            else:              # resident small-period bias + dbias
                bias = rows * (bias_row + (dbias_row if bwd else 0))
            if io + tmp + bias <= 10 * 2 ** 20:
                return nb
        return 2

    return pick(False), pick(True)


def _dropout_keep(shape, p):
    """Bernoulli keep-mask from the already-seeded kernel PRNG."""
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(min(int(p * (2.0 ** 32)), 2 ** 32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _head_groups(nh: int, dh: int):
    """[(first_head, n_heads)] tile groups of up to 128 lanes. For dh < 128
    a per-head (.., dh)-wide lane slice is NOT tile-aligned, and Mosaic
    lowers it (and the matching sub-tile store) as a lane relayout — the
    dominant cost of the naive kernel. Instead each 128-wide group of
    heads is taken as an ALIGNED-OFFSET view and individual heads are
    selected by multiplying with a constant lane mask: masked lanes
    contribute exactly 0 to the 128-lane contraction, so per-head dot
    semantics are exact and every VMEM access stays tile-aligned. A final
    remainder group (nh % hpt heads, e.g. Swin stage-1's 3 heads of 32) is
    narrower but still starts at an aligned offset."""
    if dh >= 128 or 128 % dh:
        return [(h, 1) for h in range(nh)]
    hpt = 128 // dh
    return [(h0, min(hpt, nh - h0)) for h0 in range(0, nh, hpt)]


def _lane_sel(j: int, dh: int, W: int, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2) // dh
    return (lane == j).astype(dtype)


def _add_bias(scores, mask_ref, h):
    """scores (NB, T, T) += per-head bias. The bias block either matches
    the row block (full / cyclic-large: (NB, nh, T, T)) or is a resident
    small-period block of P rows that cycles NB//P times within the row
    block — broadcast via a leading-dim reshape (minor dims untouched).
    P == 1 (every non-shifted Swin block) is a plain broadcast add."""
    NB, P = scores.shape[0], mask_ref.shape[0]
    if P == NB:
        return scores + mask_ref[:, h]
    if P == 1:
        return scores + mask_ref[0, h][None]
    T = scores.shape[1]
    s = scores.reshape(NB // P, P, T, T) + mask_ref[:, h][None]
    return s.reshape(NB, T, T)


def _fwd_kernel(seed_ref, qkv_ref, mask_ref, out_ref, *, nh, dh, p,
                full_bias=False):
    H = nh * dh
    scale = 1.0 / math.sqrt(dh)
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    if not full_bias:
        bias = (1.0 - mask_ref[:].astype(jnp.float32)) * NEG  # (NB, T)
    for h0, gh in _head_groups(nh, dh):
        base = h0 * dh
        W = gh * dh
        qg = qkv_ref[:, :, base:base + W]                  # aligned views
        kg = qkv_ref[:, :, H + base:H + base + W]
        vg = qkv_ref[:, :, 2 * H + base:2 * H + base + W]
        ctx_acc = None
        for j in range(gh):
            sel = _lane_sel(j, dh, W, qg.dtype) if gh > 1 else None
            qj = qg * sel if gh > 1 else qg
            scores = jax.lax.dot_general(
                qj, kg, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale    # (NB, T, T)
            scores = (_add_bias(scores, mask_ref, h0 + j) if full_bias
                      else scores + bias[:, None, :])
            probs = jax.nn.softmax(scores, axis=-1).astype(qkv_ref.dtype)
            if p > 0.0:
                keep = _dropout_keep(probs.shape, p)
                probs = jnp.where(keep, probs / (1.0 - p),
                                  jnp.zeros_like(probs))
            vj = vg * sel if gh > 1 else vg
            ctx = jax.lax.dot_general(
                probs, vj, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (NB, T, W)
            ctx_acc = ctx if ctx_acc is None else ctx_acc + ctx
        out_ref[:, :, base:base + W] = ctx_acc.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, qkv_ref, mask_ref, dout_ref, dqkv_ref,
                *dbias_ref, nh, dh, p, full_bias=False, bias_rows=0):
    """bias_rows selects the optional dbias output (trainable biases, e.g.
    Swin's relative-position table): 0 = no dbias; -1 = per-row blocks
    (full bias, each written once); >0 = a (bias_rows, nh, T, T) buffer
    kept VMEM-resident across the whole grid (constant index map) into
    which every block accumulates — a dynamic row slice when the period
    exceeds the block, a fold-and-sum over in-block cycles otherwise."""
    H = nh * dh
    scale = 1.0 / math.sqrt(dh)
    if p > 0.0:
        # same seed, same per-head generation order => same masks as forward
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    NB = qkv_ref.shape[0]
    if bias_rows > 0:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbias_ref[0][...] = jnp.zeros_like(dbias_ref[0])
        if bias_rows > NB:
            row0 = (pl.program_id(0) % (bias_rows // NB)) * NB
    if not full_bias:
        bias = (1.0 - mask_ref[:].astype(jnp.float32)) * NEG
    for h0, gh in _head_groups(nh, dh):
        base = h0 * dh
        W = gh * dh
        qg = qkv_ref[:, :, base:base + W]
        kg = qkv_ref[:, :, H + base:H + base + W]
        vg = qkv_ref[:, :, 2 * H + base:2 * H + base + W]
        dctxg = dout_ref[:, :, base:base + W]
        dq_acc = dk_acc = dv_acc = None
        for j in range(gh):
            sel = _lane_sel(j, dh, W, qg.dtype) if gh > 1 else None
            qj = qg * sel if gh > 1 else qg
            dctxj = dctxg * sel if gh > 1 else dctxg
            scores = jax.lax.dot_general(
                qj, kg, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            scores = (_add_bias(scores, mask_ref, h0 + j) if full_bias
                      else scores + bias[:, None, :])
            probs = jax.nn.softmax(scores, axis=-1)            # f32
            probs_c = probs.astype(qkv_ref.dtype)              # fwd's cast
            if p > 0.0:
                keep = _dropout_keep(probs_c.shape, p)
                inv = 1.0 / (1.0 - p)
                dropped = jnp.where(keep, probs_c * inv,
                                    jnp.zeros_like(probs_c))
            else:
                dropped = probs_c
            # dv = droppedᵀ · dctx (contract over queries); the masked dctx
            # zeroes every lane outside head j
            dv = jax.lax.dot_general(
                dropped, dctxj, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (NB, T, W)
            # dprobs (pre-dropout) = (dctx_j · vᵀ) — masking one side of the
            # 128-lane contraction selects head j exactly
            dprobs = jax.lax.dot_general(
                dctxj, vg, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (NB, T, T)
            if p > 0.0:
                dprobs = jnp.where(keep, dprobs * inv,
                                   jnp.zeros_like(dprobs))
            # softmax backward in f32
            dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                                keepdims=True))
            if bias_rows == -1:      # d(score)/d(bias) = 1, per-row output
                dbias_ref[0][:, h0 + j] = dscores
            elif bias_rows > NB:     # accumulate into the cyclic row slice
                dbias_ref[0][pl.ds(row0, NB), h0 + j] += dscores
            elif bias_rows == 1:     # single shared bias row: plain sum
                dbias_ref[0][0, h0 + j] += jnp.sum(dscores, axis=0)
            elif bias_rows > 0:      # fold in-block cycles, accumulate
                T = dscores.shape[1]
                folded = dscores.reshape(NB // bias_rows, bias_rows, T, T)
                dbias_ref[0][:, h0 + j] += jnp.sum(folded, axis=0)
            dscores = (dscores * scale).astype(qkv_ref.dtype)
            kj = kg * sel if gh > 1 else kg
            dq = jax.lax.dot_general(
                dscores, kj, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (NB, T, W)
            dk = jax.lax.dot_general(
                dscores, qj, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if dq_acc is None:
                dq_acc, dk_acc, dv_acc = dq, dk, dv
            else:
                dq_acc, dk_acc, dv_acc = (dq_acc + dq, dk_acc + dk,
                                          dv_acc + dv)
        dqkv_ref[:, :, base:base + W] = dq_acc.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, H + base:H + base + W] = dk_acc.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * H + base:2 * H + base + W] = \
            dv_acc.astype(dqkv_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build(nh: int, p: float, interpret: bool, full_bias: bool = False,
           bias_grad: bool = False, NBf: int = 0, NBb: int = 0):
    def mask_spec(nb, T, rows):
        if full_bias:
            if rows <= nb:
                # small-period bias: the whole (P, nh, T, T) array stays
                # VMEM-resident (constant index map, fetched once); the
                # kernel folds the NB//P in-block cycles via reshape
                return pl.BlockSpec((rows, nh, T, T),
                                    lambda i: (0, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            # (nbb*nb, nh, T, T) additive bias, h-indexed in-kernel. nbb <
            # n_grid_blocks means the bias CYCLES: qkv block i reads bias
            # block i % nbb (per-window Swin biases repeat with period nW,
            # so only nW rows ever live in HBM).
            nbb = rows // nb
            return pl.BlockSpec((nb, nh, T, T),
                                lambda i: (i % nbb, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((nb, T), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(qkv, mask, seed):
        B, T, H3 = qkv.shape
        dh = H3 // 3 // nh
        NB_ = NBf or _pick_block(B)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, nh=nh, dh=dh, p=p,
                              full_bias=full_bias),
            grid=(B // NB_,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((NB_, T, H3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                mask_spec(NB_, T, mask.shape[0]),
            ],
            out_specs=pl.BlockSpec((NB_, T, H3 // 3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, H3 // 3), qkv.dtype),
            interpret=interpret,
        )(seed, qkv, mask)

    def bwd_call(qkv, mask, seed, dout):
        B, T, H3 = qkv.shape
        dh = H3 // 3 // nh
        NB_ = NBb or _pick_block(B)
        rows = mask.shape[0]
        bias_rows = 0 if not bias_grad else (-1 if rows == B else rows)
        out_specs = pl.BlockSpec((NB_, T, H3), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, T, H3), qkv.dtype)
        if bias_rows == -1:   # per-row dbias, one block per grid step
            out_specs = [out_specs,
                         pl.BlockSpec((NB_, nh, T, T),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM)]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((B, nh, T, T), jnp.float32)]
        elif bias_rows > 0:   # VMEM-resident cyclic accumulator
            out_specs = [out_specs,
                         pl.BlockSpec((rows, nh, T, T),
                                      lambda i: (0, 0, 0, 0),
                                      memory_space=pltpu.VMEM)]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((rows, nh, T, T), jnp.float32)]
        return pl.pallas_call(
            functools.partial(_bwd_kernel, nh=nh, dh=dh, p=p,
                              full_bias=full_bias, bias_rows=bias_rows),
            grid=(B // NB_,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((NB_, T, H3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                mask_spec(NB_, T, mask.shape[0]),
                pl.BlockSpec((NB_, T, H3 // 3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(seed, qkv, mask, dout)

    @jax.custom_vjp
    def mha(qkv, mask, seed):
        return fwd_call(qkv, mask, seed)

    def mha_fwd(qkv, mask, seed):
        return fwd_call(qkv, mask, seed), (qkv, mask, seed)

    def mha_bwd(res, dout):
        qkv, mask, seed = res
        if bias_grad:
            dqkv, dbias = bwd_call(qkv, mask, seed, dout)
            return dqkv, dbias.astype(mask.dtype), None
        return bwd_call(qkv, mask, seed, dout), None, None

    mha.defvjp(mha_fwd, mha_bwd)
    return mha


def fused_mha(qkv: jnp.ndarray, mask: jnp.ndarray = None, *, n_heads: int,
              bias: jnp.ndarray = None, bias_grad: bool = False,
              drop_rate: float = 0.0, dropout_rng=None,
              interpret: bool = None) -> jnp.ndarray:
    """(B, T, 3H) packed QKV -> (B, T, H) context.

    Exactly one of:
      mask — (B, T) key-validity mask (BERT semantics: invalid keys get
             -1e9 before softmax), or
      bias — (P, nh, T, T) f32 additive score bias (causal masks, Swin
             relative-position + shift masks, ...), added per head. P == B,
             or P divides B and the bias CYCLES: row r gets bias[r % P].
             Swin passes its per-window rel-pos + shift bias with P = nW
             (window order is fastest-varying in the row dim), so the bias
             stays (nW, nh, w², w²) in HBM instead of a per-row broadcast.

    bias_grad=True makes the call differentiable w.r.t. bias (needed when
    the bias contains trainable parameters, e.g. Swin's relative-position
    table): the backward kernel emits the f32 softmax-backward dscores —
    per row for a full bias, accumulated in a VMEM-resident (P, nh, T, T)
    buffer for a cyclic one — and the wrapper's tile/pad/take VJPs reduce
    it back to the caller's bias shape.

    drop_rate > 0 needs dropout_rng (a jax PRNG key); the kernel PRNG is
    seeded from it so runs are deterministic given the key.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if drop_rate > 0.0 and dropout_rng is not None:
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
        drop_rate = 0.0
    assert (mask is None) != (bias is None), "pass exactly one of mask/bias"
    full = bias is not None
    B, T, H3 = qkv.shape
    # The bias rides in the qkv dtype: in bf16-compute regimes the bias add
    # rounds to bf16 where the XLA path adds f32 — a deviation bounded by
    # bf16 resolution of the bias values, only present where activations
    # are already bf16. f32 runs (parity tests) stay exact. Scores and the
    # softmax stay f32 either way; dbias is accumulated in f32.
    m = bias.astype(qkv.dtype) if full else mask.astype(qkv.dtype)
    if full:
        NBf, NBb = _pick_block_bias(T, H3, n_heads, m.shape[0], B,
                                    qkv.dtype.itemsize, bool(bias_grad))
        if drop_rate > 0.0:
            # The flash-style dropout mask is REGENERATED in backward from
            # (seed + program_id) with block-shaped (NB, T, T) draws, so the
            # two passes must run the exact same grid geometry — different
            # row-block sizes would apply one mask in forward and a
            # different one in backward (silently wrong gradients). The
            # backward pick is the tighter VMEM constraint, so it always
            # fits the forward too.
            NBf = NBb
    else:
        NBf = NBb = _pick_block(B)
    pad = (-B) % max(NBf, NBb)
    cyclic = full and m.shape[0] != B
    if cyclic:
        P = m.shape[0]
        assert B % P == 0, f"cyclic bias period {P} must divide B={B}"

        def fits(nb):
            return (P <= nb and nb % P == 0) or (P > nb and P % nb == 0)

        if not (fits(NBf) and fits(NBb)):
            # mutually indivisible period: materialize the full bias
            # (the pad branch below zero-pads the extra rows)
            m = jnp.take(m, jnp.arange(B) % P, axis=0)
            cyclic = False
    if pad:
        # pad to a whole number of blocks; padded rows are fully masked /
        # zero-biased / cyclically biased (finite — uniform or valid
        # softmax — and sliced off)
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
        if not cyclic:
            m = jnp.pad(m, ((0, pad),) + ((0, 0),) * (m.ndim - 1))
    # NOTE: drop_rate > 0 requires a real TPU — interpret mode has no
    # lowering for the TPU PRNG primitives (and the TPU-interpret emulator
    # returns all-zero bits, i.e. silently drops everything). The grid
    # invariant is covered structurally on CPU and behaviorally on TPU in
    # tests/test_fused_attention.py.
    out = _build(n_heads, float(drop_rate), bool(interpret), full,
                 bool(bias_grad and full),
                 NBf if full else 0, NBb if full else 0)(qkv, m, seed)
    return out[:B] if pad else out


# ---------------------------------------------------------------------------
# Projection-absorbing edition (Swin windowed attention).
#
# Why: at Swin's small channel widths (C=96/192) XLA emits the QKV /
# attention-output projections through transpose-reuse CONVOLUTION emitters
# with batch-minor output layouts, then pays a layout copy per dot to get
# back to the natural row-major activations (traced: 78 ms/step of
# convolution fusions + a large share of 150 ms/step of layout copies in
# the vision bench). This kernel absorbs both projections: weights ride in
# as grid-constant VMEM blocks, qkv/ctx/dqkv live only in registers, and
# the weight grads accumulate into VMEM-resident f32 buffers across the
# sequential grid. The analogous absorption LOST on the BERT path (see
# PARITY.md dead ends) where XLA's big-M dots already ran at 94+ TFLOPS;
# here the XLA competition is the conv emitter, not a good dot.
#
# The wrapper pads T (49 -> 56) to the sublane tile so the in-kernel
# (NB, T, C) -> (NB*T, C) flattening is free; padded key columns get -1e9
# bias, padded query rows are sliced off and contribute exactly zero to
# every gradient (their dout rows are zero-padded by the VJP).
# ---------------------------------------------------------------------------


def _p_proj(x2, w_ref, b_ref):
    y = jax.lax.dot_general(x2, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + b_ref[...].astype(jnp.float32)).astype(x2.dtype)


def _p_attention(qkv, mask_ref, nh, dh, want=False):
    """Forward attention on an in-register (NB, T, 3H) qkv with the
    per-head additive bias from mask_ref (cyclic (P, nh, T, T)). Returns
    ctx in compute dtype (+ per-head probs when want)."""
    NB, T, H3 = qkv.shape
    H = H3 // 3
    scale = 1.0 / math.sqrt(dh)
    ctx_groups, saved = [], []
    for h0, gh in _head_groups(nh, dh):
        base = h0 * dh
        W = gh * dh
        qg = qkv[:, :, base:base + W]
        kg = qkv[:, :, H + base:H + base + W]
        vg = qkv[:, :, 2 * H + base:2 * H + base + W]
        ctx_acc = None
        per_j = []
        for j in range(gh):
            sel = _lane_sel(j, dh, W, qg.dtype) if gh > 1 else None
            qj = qg * sel if gh > 1 else qg
            scores = jax.lax.dot_general(
                qj, kg, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            scores = _add_bias(scores, mask_ref, h0 + j)
            probs = jax.nn.softmax(scores, axis=-1)
            probs_c = probs.astype(qkv.dtype)
            vj = vg * sel if gh > 1 else vg
            ctx = jax.lax.dot_general(
                probs_c, vj, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ctx_acc = ctx if ctx_acc is None else ctx_acc + ctx
            if want:
                per_j.append(probs)
        ctx_groups.append(ctx_acc.astype(qkv.dtype))
        if want:
            saved.append(per_j)
    ctx = (jnp.concatenate(ctx_groups, axis=-1)
           if len(ctx_groups) > 1 else ctx_groups[0])
    return (ctx, saved) if want else ctx


def _pfwd_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                 out_ref, *, nh, dh):
    NB, T, H = x_ref.shape
    x2 = x_ref[...].reshape(NB * T, H)
    qkv = _p_proj(x2, wqkv_ref, bqkv_ref).reshape(NB, T, 3 * H)
    ctx = _p_attention(qkv, mask_ref, nh, dh)
    out_ref[...] = _p_proj(ctx.reshape(NB * T, H), wo_ref,
                           bo_ref).reshape(NB, T, H).astype(out_ref.dtype)


def _attn_grads(qkv, saved, dctx, nh, dh, write_dbias):
    """dqkv (NB, T, 3H) of the biased-softmax attention from the forward's
    saved per-head probs. write_dbias(h, dscores) receives each head's f32
    (NB, T, T) score cotangent — the caller owns the bias-gradient layout
    (full rows / cyclic fold / band slice)."""
    NB, T, H3 = qkv.shape
    H = H3 // 3
    scale = 1.0 / math.sqrt(dh)
    dq_parts, dk_parts, dv_parts = [], [], []
    for gi, (h0, gh) in enumerate(_head_groups(nh, dh)):
        base = h0 * dh
        W = gh * dh
        qg = qkv[:, :, base:base + W]
        kg = qkv[:, :, H + base:H + base + W]
        vg = qkv[:, :, 2 * H + base:2 * H + base + W]
        dctxg = dctx[:, :, base:base + W]
        dq_acc = dk_acc = dv_acc = None
        for j in range(gh):
            probs = saved[gi][j]
            probs_c = probs.astype(qkv.dtype)
            sel = _lane_sel(j, dh, W, qg.dtype) if gh > 1 else None
            qj = qg * sel if gh > 1 else qg
            dctxj = dctxg * sel if gh > 1 else dctxg
            dv = jax.lax.dot_general(
                probs_c, dctxj, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dprobs = jax.lax.dot_general(
                dctxj, vg, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                                keepdims=True))
            write_dbias(h0 + j, dscores)
            dscores = (dscores * scale).astype(qkv.dtype)
            kj = kg * sel if gh > 1 else kg
            dq = jax.lax.dot_general(
                dscores, kj, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dscores, qj, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if dq_acc is None:
                dq_acc, dk_acc, dv_acc = dq, dk, dv
            else:
                dq_acc, dk_acc, dv_acc = (dq_acc + dq, dk_acc + dk,
                                          dv_acc + dv)
        dt = qkv.dtype
        dq_parts.append(dq_acc.astype(dt))
        dk_parts.append(dk_acc.astype(dt))
        dv_parts.append(dv_acc.astype(dt))

    def cat(parts):
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    return jnp.concatenate([cat(dq_parts), cat(dk_parts), cat(dv_parts)],
                           axis=-1)


def _pbwd_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, dout_ref,
                 dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                 *dbias_ref, nh, dh, bias_rows):
    NB, T, H = x_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        if bias_rows:
            dbias_ref[0][...] = jnp.zeros_like(dbias_ref[0])
    if bias_rows and bias_rows > NB:
        row0 = (pl.program_id(0) % (bias_rows // NB)) * NB

    x2 = x_ref[...].reshape(NB * T, H)
    qkv = _p_proj(x2, wqkv_ref, bqkv_ref).reshape(NB, T, 3 * H)
    ctx, saved = _p_attention(qkv, mask_ref, nh, dh, want=True)

    dout2 = dout_ref[...].reshape(NB * T, H)
    dwo_ref[...] += jax.lax.dot_general(
        ctx.reshape(NB * T, H), dout2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbo_ref[...] += jnp.sum(dout2, axis=0,
                            dtype=jnp.float32).reshape(dbo_ref.shape)
    dctx = jax.lax.dot_general(
        dout2, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(qkv.dtype)
    dctx = dctx.reshape(NB, T, H)

    def write_dbias(h, dscores):
        if bias_rows == -1:
            dbias_ref[0][:, h] = dscores
        elif bias_rows > NB:
            dbias_ref[0][pl.ds(row0, NB), h] += dscores
        elif bias_rows == 1:
            dbias_ref[0][0, h] += jnp.sum(dscores, axis=0)
        elif bias_rows > 0:
            folded = dscores.reshape(NB // bias_rows, bias_rows, T, T)
            dbias_ref[0][:, h] += jnp.sum(folded, axis=0)

    dqkv = _attn_grads(qkv, saved, dctx, nh, dh, write_dbias)
    dqkv2 = dqkv.reshape(NB * T, 3 * H)
    dwqkv_ref[...] += jax.lax.dot_general(
        x2, dqkv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv2, axis=0,
                              dtype=jnp.float32).reshape(dbqkv_ref.shape)
    dx_ref[...] = jax.lax.dot_general(
        dqkv2, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(NB, T, H).astype(
            dx_ref.dtype)


def _pick_block_proj(T: int, C: int, nh: int, rows: int,
                     itemsize: int, bias_grad: bool):
    """Row-block sizes for the projection-absorbing kernel (fwd, bwd)."""
    Tl = -(-T // 128) * 128
    resident = (4 * C * C * itemsize + 4 * C * C * 4
                + rows * nh * T * Tl * (itemsize + (4 if bias_grad else 0)))

    def pick(bwd):
        for nb in (64, 32, 16, 8):
            io = 2 * (2 if bwd else 1) * nb * T * C * itemsize * 2
            qkv = 4 * nb * T * 3 * C * itemsize + nb * T * 3 * C * 4
            tmp = (8 if bwd else 4) * nb * T * Tl * 4 + 4 * nb * T * C * 4
            if io + qkv + tmp + resident <= 24 * 2 ** 20:
                return nb
        return 4
    return pick(False), pick(True)


@functools.lru_cache(maxsize=None)
def _build_proj(nh: int, interpret: bool, bias_grad: bool, NBf: int,
                NBb: int):
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def bias_spec(nb, T, rows):
        if rows <= nb:
            return pl.BlockSpec((rows, nh, T, T), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        nbb = rows // nb
        return pl.BlockSpec((nb, nh, T, T), lambda i: (i % nbb, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(x, mask, wqkv, bqkv, wo, bo):
        B, T, C = x.shape
        dh = C // nh
        return pl.pallas_call(
            functools.partial(_pfwd_kernel, nh=nh, dh=dh),
            grid=(B // NBf,),
            in_specs=[
                pl.BlockSpec((NBf, T, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                bias_spec(NBf, T, mask.shape[0]),
                const_spec(wqkv.shape), const_spec(bqkv.shape),
                const_spec(wo.shape), const_spec(bo.shape),
            ],
            out_specs=pl.BlockSpec((NBf, T, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
            compiler_params=params,
            interpret=interpret,
        )(x, mask, wqkv, bqkv, wo, bo)

    def bwd_call(x, mask, wqkv, bqkv, wo, dout):
        B, T, C = x.shape
        dh = C // nh
        rows = mask.shape[0]
        bias_rows = 0 if not bias_grad else (-1 if rows == B else rows)
        blk = pl.BlockSpec((NBb, T, C), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        out_specs = [blk, const_spec(wqkv.shape), const_spec((1, 3 * C)),
                     const_spec(wo.shape), const_spec((1, C))]
        out_shape = [jax.ShapeDtypeStruct((B, T, C), x.dtype),
                     jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
                     jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                     jax.ShapeDtypeStruct(wo.shape, jnp.float32),
                     jax.ShapeDtypeStruct((1, C), jnp.float32)]
        if bias_rows == -1:
            out_specs.append(pl.BlockSpec((NBb, nh, T, T),
                                          lambda i: (i, 0, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((B, nh, T, T), jnp.float32))
        elif bias_rows > 0:
            out_specs.append(pl.BlockSpec((rows, nh, T, T),
                                          lambda i: (0, 0, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((rows, nh, T, T), jnp.float32))
        return pl.pallas_call(
            functools.partial(_pbwd_kernel, nh=nh, dh=dh,
                              bias_rows=bias_rows),
            grid=(B // NBb,),
            in_specs=[
                blk,
                bias_spec(NBb, T, rows),
                const_spec(wqkv.shape), const_spec(bqkv.shape),
                const_spec(wo.shape),
                blk,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, mask, wqkv, bqkv, wo, dout)

    @jax.custom_vjp
    def mha(x, mask, wqkv, bqkv, wo, bo):
        return fwd_call(x, mask, wqkv, bqkv, wo, bo)

    def mha_fwd(x, mask, wqkv, bqkv, wo, bo):
        return fwd_call(x, mask, wqkv, bqkv, wo, bo), (x, mask, wqkv, bqkv,
                                                       wo)

    def mha_bwd(res, dout):
        x, mask, wqkv, bqkv, wo = res
        outs = bwd_call(x, mask, wqkv, bqkv, wo, dout)
        dx, dwqkv, dbqkv, dwo, dbo = outs[:5]
        dmask = outs[5].astype(mask.dtype) if bias_grad else None
        return (dx, dmask, dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(-1).astype(bqkv.dtype),
                dwo.astype(wo.dtype), dbo.reshape(-1).astype(wo.dtype))

    mha.defvjp(mha_fwd, mha_bwd)
    return mha


def fused_mha_proj(x: jnp.ndarray, bias: jnp.ndarray,
                   wqkv: jnp.ndarray, bqkv: jnp.ndarray,
                   wo: jnp.ndarray, bo: jnp.ndarray, *, n_heads: int,
                   bias_grad: bool = True,
                   interpret: bool = None) -> jnp.ndarray:
    """(B, T, C) windows -> (B, T, C): QKV projection + biased MHA +
    output projection in one kernel (Swin windowed attention).

    bias: (P, nh, T, T) f32 additive score bias, cyclic over B (row r gets
    bias[r % P]); differentiable when bias_grad (the rel-pos table).
    wqkv (C, 3C), bqkv (3C,), wo (C, C), bo (C,) in the compute dtype.
    Attention-prob dropout is not supported here (Swin's
    attention_probs_dropout_prob is 0 in every reference config).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, C = x.shape
    padT = (-T) % 8
    m = bias.astype(x.dtype)
    if padT:
        # padded key columns: -1e9 (softmax zero); padded query rows are
        # sliced off and their zero dout contributes nothing to grads
        m = jnp.pad(m, ((0, 0), (0, 0), (0, padT), (0, padT)),
                    constant_values=NEG)
        x = jnp.pad(x, ((0, 0), (0, padT), (0, 0)))
    Tp = T + padT
    NBf, NBb = _pick_block_proj(Tp, C, n_heads, m.shape[0],
                                x.dtype.itemsize, bool(bias_grad))
    P = m.shape[0]

    def fits(nb):
        return (P <= nb and nb % P == 0) or (P > nb and P % nb == 0)

    padB = (-B) % max(NBf, NBb)
    cyclic = P != B
    if cyclic and not (fits(NBf) and fits(NBb)):
        m = jnp.take(m, jnp.arange(B) % P, axis=0)
        cyclic = False
    if padB:
        x = jnp.pad(x, ((0, padB), (0, 0), (0, 0)))
        if not cyclic:
            m = jnp.pad(m, ((0, padB), (0, 0), (0, 0), (0, 0)))
    out = _build_proj(n_heads, bool(interpret), bool(bias_grad),
                      NBf, NBb)(x, m, wqkv, bqkv.reshape(1, -1), wo,
                                bo.reshape(1, -1))
    dbg = out[:B, :T] if (padB or padT) else out
    return dbg


# ---------------------------------------------------------------------------
# Band edition (Swin windowed attention WITHOUT window partition).
#
# Why: the projection-absorbing kernel still receives windows formed by
# XLA's 6D reshape+transpose (window_partition / window_reverse), and those
# transposes are materialized HBM copies of every attention activation in
# forward, backward, AND the chunked remat's recompute — 40.9 GB/step of
# the vision bench's 55.6 GB copy traffic (optimized-HLO audit, PARITY.md).
# This edition consumes the feature map in its NATURAL (N, H, W, C) layout:
# each grid step DMAs a band of window rows (ni images x br*w rows x W),
# projects QKV on the raster-order rows, forms windows with an in-VMEM
# sublane permute (bytes never leave VMEM), runs the same biased MHA, and
# writes the context back in (N, H, W, C). The residual stream then keeps
# ONE layout end to end — the window transposes, their remat recomputes,
# and the layout-mismatch copies they induce around LayerNorm all vanish.
#
# The cyclic shift (jnp.roll) stays in XLA: BlockSpec index maps cannot
# wrap, and rolls are 1.3 of the 55.6 GB. Shifted blocks pass the rolled
# map and the (nW, nh, T, T) shift+rel-pos bias; band b's windows read bias
# rows [b*nwc, (b+1)*nwc) — a contiguous block slice.
# ---------------------------------------------------------------------------


def _win_form(a2, ni_br, w, nwc, Cx):
    """(rows, Cx) raster rows -> (NW, w*w, Cx) windows (in-VMEM permute)."""
    a = a2.reshape(ni_br, w, nwc, w, Cx)
    if nwc > 1:
        a = a.transpose(0, 2, 1, 3, 4)
    return a.reshape(ni_br * nwc, w * w, Cx)


def _win_unform(a, ni_br, w, nwc, Cx):
    """(NW, w*w, Cx) windows -> (rows, Cx) raster rows."""
    a = a.reshape(ni_br, nwc, w, w, Cx)
    if nwc > 1:
        a = a.transpose(0, 2, 1, 3, 4)
    return a.reshape(ni_br * w * nwc * w, Cx)


def _bfwd_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                 out_ref, *, nh, dh, w, nwc):
    ni, bh, Wp, C = x_ref.shape
    ni_br = ni * (bh // w)
    x2 = x_ref[...].reshape(ni * bh * Wp, C)
    qkv2 = _p_proj(x2, wqkv_ref, bqkv_ref)
    qkv = _win_form(qkv2, ni_br, w, nwc, 3 * C)
    ctx = _p_attention(qkv, mask_ref, nh, dh)
    ctx2 = _win_unform(ctx, ni_br, w, nwc, C)
    out2 = _p_proj(ctx2, wo_ref, bo_ref)
    out_ref[...] = out2.reshape(x_ref.shape).astype(out_ref.dtype)


def _bbwd_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, dout_ref,
                 dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                 *dbias_ref, nh, dh, w, nwc, br, bias_mode):
    ni, bh, Wp, C = x_ref.shape
    ni_br = ni * br
    rows = ni * bh * Wp

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        if bias_mode:
            dbias_ref[0][...] = jnp.zeros_like(dbias_ref[0])
    if bias_mode == "band":
        # band_blocks = bands_total // br; grid is (img_blocks*band_blocks,)
        # band-major-minor: band block index = program_id % band_blocks
        nrows = dbias_ref[0].shape[0]           # nW
        band_blocks = nrows // (br * nwc)
        row0 = (pl.program_id(0) % band_blocks) * br * nwc

    x2 = x_ref[...].reshape(rows, C)
    qkv = _p_proj(x2, wqkv_ref, bqkv_ref)
    qkv = _win_form(qkv, ni_br, w, nwc, 3 * C)
    ctx, saved = _p_attention(qkv, mask_ref, nh, dh, want=True)
    ctx2 = _win_unform(ctx, ni_br, w, nwc, C)

    dout2 = dout_ref[...].reshape(rows, C)
    dwo_ref[...] += jax.lax.dot_general(
        ctx2, dout2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbo_ref[...] += jnp.sum(dout2, axis=0,
                            dtype=jnp.float32).reshape(dbo_ref.shape)
    dctx2 = jax.lax.dot_general(
        dout2, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(qkv.dtype)
    dctx = _win_form(dctx2, ni_br, w, nwc, C)

    T = w * w
    NW = ni_br * nwc
    pw = br * nwc                               # bias rows per band block

    def write_dbias(h, dscores):
        if bias_mode == "const":
            dbias_ref[0][0, h] += jnp.sum(dscores, axis=0)
        elif bias_mode == "band":
            folded = jnp.sum(dscores.reshape(NW // pw, pw, T, T), axis=0)
            dbias_ref[0][pl.ds(row0, pw), h] += folded

    dqkv = _attn_grads(qkv, saved, dctx, nh, dh, write_dbias)
    dqkv2 = _win_unform(dqkv, ni_br, w, nwc, 3 * C)
    dwqkv_ref[...] += jax.lax.dot_general(
        x2, dqkv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv2, axis=0,
                              dtype=jnp.float32).reshape(dbqkv_ref.shape)
    dx_ref[...] = jax.lax.dot_general(
        dqkv2, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(x_ref.shape).astype(
            dx_ref.dtype)


def _pick_band(N: int, bands_total: int, w: int, Wp: int, C: int, nh: int,
               P: int, itemsize: int, bias_grad: bool):
    """(ni, br) for the band kernel: ni images x br window-rows per grid
    step. Constraints: divisibility, raster rows a sublane multiple (the
    in-kernel (ni, bh, Wp, C) -> (rows, C) collapse must be a retile-free
    view), and the backward's VMEM footprint (saved per-head probs dominate
    at large nh). Prefers the largest window count <= 32 that fits; returns
    None when no candidate exists (caller falls back to the window-layout
    kernel)."""
    nwc = Wp // w
    T = w * w
    T8 = -(-T // 8) * 8
    Tl = -(-T // 128) * 128
    Cl = -(-C // 128) * 128
    W8 = -(-Wp // 8) * 8
    resident = 4 * C * Cl * itemsize + 4 * C * Cl * 4
    if bias_grad:
        resident += P * nh * T8 * Tl * 4        # dbias accumulator
    if P > 1:
        pass                                    # bias blocks counted per-cand
    best = None
    for ni in range(1, N + 1):
        if N % ni:
            continue
        for br in range(1, bands_total + 1):
            if bands_total % br:
                continue
            rows = ni * br * w * Wp
            if rows % 8:
                continue
            NW = ni * br * nwc
            if NW > 32:
                continue
            io = 2 * 2 * ni * (br * w) * W8 * Cl * itemsize   # x + out/dout
            io += 2 * ni * (br * w) * W8 * Cl * itemsize      # dx out
            qkvb = 2 * NW * T8 * 3 * Cl * (itemsize + 4)      # qkv + f32 stage
            probs = (nh + 6) * NW * T8 * Tl * 4               # saved + temps
            bias = (min(P, br * nwc) * nh * T8 * Tl * itemsize * 2)
            # budget 30 MB of the 64 MB vmem_limit: the original 20 MB cap
            # left stage 0 at NW=16 (352 sequential grid steps/chunk) and
            # the bwd kernel at ~24 TFLOPS; measured scoped_memory_configs
            # in the optimized HLO confirm the full 64 MB is granted
            if io + qkvb + probs + bias + resident > 30 * 2 ** 20:
                continue
            if best is None or NW > best[2] or (NW == best[2]
                                                and ni < best[0]):
                best = (ni, br, NW)
    return None if best is None else best[:2]


@functools.lru_cache(maxsize=None)
def _build_band(nh: int, interpret: bool, bias_grad: bool, ni: int, br: int,
                w: int, nwc: int):
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)
    T = w * w

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def fwd_call(x, mask, wqkv, bqkv, wo, bo):
        N, Hp, Wp, C = x.shape
        dh = C // nh
        band_blocks = Hp // (br * w)
        grid = (N // ni) * band_blocks
        blk = pl.BlockSpec((ni, br * w, Wp, C),
                           lambda i: (i // band_blocks, i % band_blocks,
                                      0, 0),
                           memory_space=pltpu.VMEM)
        P = mask.shape[0]
        if P == 1:
            mspec = const_spec(mask.shape)
        else:
            mspec = pl.BlockSpec((br * nwc, nh, T, T),
                                 lambda i: (i % band_blocks, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_bfwd_kernel, nh=nh, dh=dh, w=w, nwc=nwc),
            grid=(grid,),
            in_specs=[blk, mspec, const_spec(wqkv.shape),
                      const_spec(bqkv.shape), const_spec(wo.shape),
                      const_spec(bo.shape)],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=params,
            interpret=interpret,
        )(x, mask, wqkv, bqkv, wo, bo)

    def bwd_call(x, mask, wqkv, bqkv, wo, dout):
        N, Hp, Wp, C = x.shape
        dh = C // nh
        band_blocks = Hp // (br * w)
        grid = (N // ni) * band_blocks
        blk = pl.BlockSpec((ni, br * w, Wp, C),
                           lambda i: (i // band_blocks, i % band_blocks,
                                      0, 0),
                           memory_space=pltpu.VMEM)
        P = mask.shape[0]
        if P == 1:
            mspec = const_spec(mask.shape)
            bias_mode = "const" if bias_grad else ""
        else:
            mspec = pl.BlockSpec((br * nwc, nh, T, T),
                                 lambda i: (i % band_blocks, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
            bias_mode = "band" if bias_grad else ""
        out_specs = [blk, const_spec(wqkv.shape), const_spec((1, 3 * C)),
                     const_spec(wo.shape), const_spec((1, C))]
        out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype),
                     jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
                     jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                     jax.ShapeDtypeStruct(wo.shape, jnp.float32),
                     jax.ShapeDtypeStruct((1, C), jnp.float32)]
        if bias_mode:
            out_specs.append(const_spec(mask.shape))
            out_shape.append(
                jax.ShapeDtypeStruct(mask.shape, jnp.float32))
        return pl.pallas_call(
            functools.partial(_bbwd_kernel, nh=nh, dh=dh, w=w, nwc=nwc,
                              br=br, bias_mode=bias_mode),
            grid=(grid,),
            in_specs=[blk, mspec, const_spec(wqkv.shape),
                      const_spec(bqkv.shape), const_spec(wo.shape), blk],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, mask, wqkv, bqkv, wo, dout)

    @jax.custom_vjp
    def mha(x, mask, wqkv, bqkv, wo, bo):
        return fwd_call(x, mask, wqkv, bqkv, wo, bo)

    def mha_fwd(x, mask, wqkv, bqkv, wo, bo):
        return fwd_call(x, mask, wqkv, bqkv, wo, bo), (x, mask, wqkv, bqkv,
                                                       wo)

    def mha_bwd(res, dout):
        x, mask, wqkv, bqkv, wo = res
        outs = bwd_call(x, mask, wqkv, bqkv, wo, dout)
        dx, dwqkv, dbqkv, dwo, dbo = outs[:5]
        dmask = outs[5].astype(mask.dtype) if bias_grad else None
        return (dx, dmask, dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(-1).astype(bqkv.dtype),
                dwo.astype(wo.dtype), dbo.reshape(-1).astype(wo.dtype))

    mha.defvjp(mha_fwd, mha_bwd)
    return mha


def _pad_window_bias(bias, w, wp):
    """(P, nh, w², w²) -> (P, nh, wp², wp²) for windows padded from (w, w)
    to (wp, wp). Live (q, k) pairs keep their bias; dead-key columns get
    NEG (softmax-zero); dead-query rows keep the gathered values (their
    probs are garbage on pad rows the caller slices off — and their
    dscores are exactly 0 in backward because their dout is 0). Built from
    differentiable gathers, so the rel-pos table's gradient flows through
    a scatter-add outside the kernel."""
    idx = jnp.arange(wp * wp)
    yi, xi = idx // wp, idx % wp
    live = (yi < w) & (xi < w)
    q49 = jnp.where(live, yi * w + xi, 0)
    out = bias[:, :, q49[:, None], q49[None, :]]
    return jnp.where(live[None, None, None, :], out, NEG)


def fused_mha_proj_band(x: jnp.ndarray, bias: jnp.ndarray,
                        wqkv: jnp.ndarray, bqkv: jnp.ndarray,
                        wo: jnp.ndarray, bo: jnp.ndarray, *, n_heads: int,
                        window: int, bias_grad: bool = True,
                        interpret: bool = None):
    """(N, H, W, C) feature map -> (N, H, W, C): QKV projection + biased
    windowed MHA + output projection in one kernel, windows formed INSIDE
    the kernel (no window_partition / window_reverse transposes in HBM).

    Mosaic only supports in-kernel shape casts whose second-to-last dim
    stays a sublane (8) multiple, so w=7 windows are padded to 8x8 on the
    way in: the pad/slice are XLA *fusable* memory ops (they ride the
    neighboring LayerNorm/residual loop fusions), unlike the partition
    transposes they replace, which are materialized HBM copies. Dead
    tokens carry NEG key bias (exact softmax zero) and their query rows
    are sliced off with zero cotangents — bit-equivalent math to the
    window-layout kernel.

    bias: (P, nh, w², w²) f32 additive score bias with P == 1 (plain
    windows: the rel-pos table) or P == nW (shifted: rel-pos + shift mask,
    window-raster order); differentiable when bias_grad. Caller applies the
    cyclic roll for shifted blocks. Returns None when no (ni, br) band
    blocking satisfies the divisibility/VMEM constraints — the caller
    should fall back to the window-layout `fused_mha_proj`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, Hp, Wp, C = x.shape
    w = window
    if Hp % w or Wp % w:
        return None
    nwc = Wp // w
    bands_total = Hp // w
    nW = nwc * bands_total
    P = bias.shape[0]
    if P not in (1, nW):
        return None
    wp = -(-w // 8) * 8
    pick = _pick_band(N, bands_total, wp, nwc * wp, C, n_heads, P,
                      x.dtype.itemsize, bool(bias_grad))
    if pick is None:
        return None
    ni, br = pick
    if wp != w:
        pw = wp - w
        x6 = x.reshape(N, bands_total, w, nwc, w, C)
        x6 = jnp.pad(x6, ((0, 0), (0, 0), (0, pw), (0, 0), (0, pw), (0, 0)))
        x = x6.reshape(N, bands_total * wp, nwc * wp, C)
        bias = _pad_window_bias(bias, w, wp)
    m = bias.astype(x.dtype)
    out = _build_band(n_heads, bool(interpret), bool(bias_grad), ni, br,
                      wp, nwc)(x, m, wqkv, bqkv.reshape(1, -1), wo,
                               bo.reshape(1, -1))
    if wp != w:
        out = out.reshape(N, bands_total, wp, nwc, wp, C)[:, :, :w, :, :w]
        out = out.reshape(N, Hp, Wp, C)
    return out
