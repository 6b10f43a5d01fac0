"""Fused (LayerNorm ->) Dense -> GELU -> Dense Pallas kernel.

Why: at Swin's small channel widths the XLA MLP dots lower through
transpose-reuse convolution emitters in the {1,2,0}-transposed layouts XLA
assigns to the small-C residual stream — measured ~12 TFLOPS at stage-0
geometry and ~26 TFLOPS even for clean 2D dots at C=96 (tools/dot3d_probe.py,
PARITY.md "band-layout closure"), plus relayout copies at every Pallas-kernel
boundary and a full HBM round trip for the 4C-wide GELU intermediate. This
kernel runs the whole MLP sub-block on row blocks with the intermediate
VMEM-resident: HBM sees x in and y out, nothing else.

Math parity with the XLA composition (models/swin.py SwinBlock MLP,
reference HF SwinIntermediate/SwinOutput; models/bert.py BertLayer FFN):
optional LayerNorm with flax semantics (f32 stats, fast variance
var = E[x^2] - E[x]^2, scale/bias in f32, result cast to compute dtype),
dot1 with f32 accumulation, exact (erf) GELU in f32, dot2 with f32
accumulation. In bf16 regimes the kernel keeps h/GELU in f32 where the XLA
path rounds the Dense output to bf16 first — a deviation bounded by bf16
resolution (same note as the attention kernel's bias add); f32 runs are
exact and that's what the parity tests pin.

Backward is flash-style (nothing saved but x and the params): each grid
step recomputes LN/h/GELU for its row block, then
  dg = dy . W2^T,  dh = dg * gelu'(h),  dxn = dh . W1^T,
  dW2 += g^T.dy, dW1 += xn^T.dh, db accumulated in f32,
  LN backward dx = rstd*(dxhat - mean(dxhat) - xhat*mean(dxhat*xhat))
with the weight/bias/LN-param gradients accumulated into VMEM-resident f32
buffers across the sequential grid (constant-index-map outputs, zeroed at
program_id 0 — the same pattern as attention.py's projection kernels).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """Mosaic has no erf lowering; Abramowitz-Stegun 7.1.26 in f32 —
    verified 5.3e-7 max abs error vs scipy over [-10, 10] (2.6e-7 on the
    GELU it feeds), below every parity tolerance in the repo and the same
    order as XLA's own rational erf. Interpret mode runs this too, so the
    CPU tests validate the shipped math."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-a * a))


def _ln_f32(x, g_ref, b_ref, eps):
    """flax nn.LayerNorm semantics: f32 stats, fast variance. Returns
    (xhat, rstd, xn_f32)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    xn = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32)
    return xhat, rstd, xn


def _gelu_f32(h):
    return h * 0.5 * (1.0 + _erf(h * _INV_SQRT2))


def _dgelu_f32(h):
    phi = jnp.exp(-0.5 * h * h) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + _erf(h * _INV_SQRT2))
    return cdf + h * phi


def _act_f32(h, act):
    if act == "relu":
        return jnp.maximum(h, 0.0)
    if act == "quick_gelu":            # CLIP: x * sigmoid(1.702 x)
        return h * jax.nn.sigmoid(1.702 * h)
    return _gelu_f32(h)


def _dact_f32(h, act):
    if act == "relu":
        return (h > 0.0).astype(jnp.float32)
    if act == "quick_gelu":
        s = jax.nn.sigmoid(1.702 * h)
        return s + h * 1.702 * s * (1.0 - s)
    return _dgelu_f32(h)


def _dot(a, b, ca, cb):
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(*refs, eps, ln, save_h, act, res=False, unit=False):
    if save_h:
        *refs, h_ref = refs
    s_ref = None
    if res and not unit:
        # residual epilogue: out = x + s * mlp(ln(x)) with s a per-row
        # scale (the DropPath keep-mask/keep, Swin pre-LN tails); unit=True
        # drops the scale operand entirely (out = x + mlp(ln(x)) — the
        # CLIP/MAE/OPT pre-LN fold)
        x_ref, s_ref, *refs = refs
        refs = [x_ref] + refs
    if ln:
        x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref = refs
        x = x_ref[...].astype(jnp.float32)
        _, _, xn = _ln_f32(x, g_ref, b_ref, eps)
        xn_c = xn.astype(x_ref.dtype)
    else:
        x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref = refs
        xn_c = x_ref[...]
    h = _dot(xn_c, w1_ref[...], 1, 0) + b1_ref[...].astype(jnp.float32)
    if save_h:
        h_ref[...] = h.astype(h_ref.dtype)
    g = _act_f32(h, act).astype(x_ref.dtype)
    y = _dot(g, w2_ref[...], 1, 0) + b2_ref[...].astype(jnp.float32)
    if res:
        y = x_ref[...].astype(jnp.float32) + (y if unit else s_ref[...] * y)
    out_ref[...] = y.astype(out_ref.dtype)


def _bwd_kernel(*refs, eps, ln, save_h, act, res=False, unit=False):
    h_ref = None
    s_ref = None
    if res and not unit:
        x_ref, s_ref, *rest = refs
        refs = (x_ref,) + tuple(rest)
    if save_h:
        # h rides between dout and the outputs in the input list
        if ln:
            (x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, h_ref, dout_ref,
             dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
             db2_ref) = refs
        else:
            (x_ref, w1_ref, b1_ref, w2_ref, h_ref, dout_ref,
             dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = refs
    elif ln:
        (x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dout_ref,
         dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = refs
    else:
        (x_ref, w1_ref, b1_ref, w2_ref, dout_ref,
         dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        if ln:
            dg_ref[...] = jnp.zeros_like(dg_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

    # --- recompute forward for this row block ---
    if ln:
        x = x_ref[...].astype(jnp.float32)
        xhat, rstd, xn = _ln_f32(x, g_ref, b_ref, eps)
        xn_c = xn.astype(x_ref.dtype)
    else:
        xn_c = x_ref[...]
    if save_h:
        h = h_ref[...].astype(jnp.float32)
    else:
        h = _dot(xn_c, w1_ref[...], 1, 0) + b1_ref[...].astype(jnp.float32)
    g = _act_f32(h, act).astype(x_ref.dtype)

    # --- backward ---
    dy = dout_ref[...]
    if res and not unit:
        # out = x + s*y: the MLP chain sees s*dout; the residual branch
        # adds the raw dout to dx at the end (unit: dy IS dout)
        dy = (dout_ref[...].astype(jnp.float32)
              * s_ref[...]).astype(dout_ref.dtype)
    dw2_ref[...] += _dot(g, dy, 0, 0)
    db2_ref[...] += jnp.sum(dy, axis=0,
                            dtype=jnp.float32).reshape(db2_ref.shape)
    dg = _dot(dy, w2_ref[...], 1, 1)                   # (BM, F) f32
    dh = (dg * _dact_f32(h, act)).astype(x_ref.dtype)
    dw1_ref[...] += _dot(xn_c, dh, 0, 0)
    db1_ref[...] += jnp.sum(dh, axis=0,
                            dtype=jnp.float32).reshape(db1_ref.shape)
    dxn = _dot(dh, w1_ref[...], 1, 1)                  # (BM, C) f32
    if ln:
        dg_ref[...] += jnp.sum(dxn * xhat, axis=0,
                               dtype=jnp.float32).reshape(dg_ref.shape)
        db_ref[...] += jnp.sum(dxn, axis=0,
                               dtype=jnp.float32).reshape(db_ref.shape)
        dxhat = dxn * g_ref[...].astype(jnp.float32)
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = rstd * (dxhat - m1 - xhat * m2)
        if res:
            dx = dx + dout_ref[...].astype(jnp.float32)
        dx_ref[...] = dx.astype(dx_ref.dtype)
    else:
        if res:
            dxn = dxn + dout_ref[...].astype(jnp.float32)
        dx_ref[...] = dxn.astype(dx_ref.dtype)


def _pick_block_mlp(C: int, F: int, itemsize: int, ln: bool, save_h: bool):
    """Largest row block (fwd, bwd) under the VMEM budget. Per-block f32
    temporaries dominate (~3 F-wide live in fwd, ~5 in bwd); the resident
    side is the bf16 weights plus (bwd) the f32 dW accumulators. Returns
    None when even the smallest block cannot fit (caller falls back to the
    XLA composition)."""
    Cl = -(-C // 128) * 128
    Fl = -(-F // 128) * 128
    res_w = 2 * C * Fl * itemsize + 2 * Fl * 4        # w1/w2 + biases
    res_bwd = res_w + 2 * C * Fl * 4 + 2 * Fl * 4 + (4 * Cl * 4 if ln else 0)

    def pick(bwd):
        res = res_bwd if bwd else res_w
        nio = 3 if bwd else 2
        for bm in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
            io = 2 * nio * bm * Cl * itemsize          # double-buffered IO
            if save_h:
                io += 2 * bm * Fl * itemsize           # h out (fwd)/in (bwd)
            tmp = ((5 if bwd else 3) * bm * Fl * 4
                   + (5 if bwd else 3) * bm * Cl * 4)
            if tmp <= 12 * 2 ** 20 and res + io + tmp <= 40 * 2 ** 20:
                return bm
        return None
    f, b = pick(False), pick(True)
    return None if (f is None or b is None) else (f, b)


@functools.lru_cache(maxsize=None)
def _build(eps: float, ln: bool, interpret: bool, BMf: int, BMb: int,
           save_h: bool, act: str, res: bool = False, unit: bool = False):
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)
    assert not (res and save_h), "res edition keeps the recompute geometry"
    has_scale = res and not unit

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def _F(args):
        return (args[2] if ln else args[0]).shape[1]

    def _sblk(BM):
        return pl.BlockSpec((BM, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(x, *args):
        # res: args = (s, [gamma, beta,] w1, b1, w2, b2); res+unit drops s
        M, C = x.shape
        blk = pl.BlockSpec((BMf, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        head, consts = (([blk, _sblk(BMf)], args[1:]) if has_scale
                        else ([blk], args))
        out_specs = blk
        out_shape = jax.ShapeDtypeStruct((M, C), x.dtype)
        if save_h:
            blkF = pl.BlockSpec((BMf, _F(consts)), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
            out_specs = [blk, blkF]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((M, _F(consts)), x.dtype)]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, eps=eps, ln=ln, save_h=save_h,
                              act=act, res=res, unit=unit),
            grid=(M // BMf,),
            in_specs=head + [const_spec(a.shape) for a in consts],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, *args)

    def bwd_call(x, *args):
        # args = ([s,] [gamma, beta,] w1, b1, w2, [h,] dout)
        M, C = x.shape
        blk = pl.BlockSpec((BMb, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        head, consts = (([blk, _sblk(BMb)], args[1:]) if has_scale
                        else ([blk], args))
        F = _F(consts)
        blkF = pl.BlockSpec((BMb, F), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out_specs = [blk]
        out_shape = [jax.ShapeDtypeStruct((M, C), x.dtype)]
        if ln:
            out_specs += [const_spec((1, C))] * 2
            out_shape += [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2
        out_specs += [const_spec((C, F)), const_spec((1, F)),
                      const_spec((F, C)), const_spec((1, C))]
        out_shape += [jax.ShapeDtypeStruct((C, F), jnp.float32),
                      jax.ShapeDtypeStruct((1, F), jnp.float32),
                      jax.ShapeDtypeStruct((F, C), jnp.float32),
                      jax.ShapeDtypeStruct((1, C), jnp.float32)]
        n_const = len(consts) - (2 if save_h else 1)
        in_specs = (head + [const_spec(a.shape) for a in consts[:n_const]]
                    + ([blkF] if save_h else []) + [blk])
        return pl.pallas_call(
            functools.partial(_bwd_kernel, eps=eps, ln=ln, save_h=save_h,
                              act=act, res=res, unit=unit),
            grid=(M // BMb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, *args)

    def fwd_only_call(x, *args):
        # save_h edition's custom_vjp PRIMAL: when nothing differentiates
        # through the call (eval / catalog encode) skip the (M, F) h
        # residual write — same kernel body with save_h=False
        M, C = x.shape
        blk = pl.BlockSpec((BMf, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, eps=eps, ln=ln, save_h=False,
                              act=act),
            grid=(M // BMf,),
            in_specs=[blk] + [const_spec(a.shape) for a in args],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
            compiler_params=params,
            interpret=interpret,
        )(x, *args)

    @jax.custom_vjp
    def mlp(x, *args):
        return fwd_only_call(x, *args) if save_h else fwd_call(x, *args)

    def mlp_fwd(x, *args):
        if save_h:
            y, h = fwd_call(x, *args)
            return y, (x,) + args[:-1] + (h,)          # b2 not needed in bwd
        return fwd_call(x, *args), (x,) + args[:-1]

    def mlp_bwd(resids, dout):
        # resids = (x, [s,] [gamma, beta,] w1, b1, w2[, h])
        outs = bwd_call(*resids, dout)
        off = 1 if has_scale else 0
        if ln:
            dx, dgm, dbt, dw1, db1, dw2, db2 = outs
            gm, bt, w1, b1, w2 = resids[1 + off:6 + off]
            grads = (dx, dgm.astype(gm.dtype), dbt.astype(bt.dtype),
                     dw1.astype(w1.dtype), db1.astype(b1.dtype),
                     dw2.astype(w2.dtype), db2.astype(w2.dtype))
        else:
            dx, dw1, db1, dw2, db2 = outs
            w1, b1, w2 = resids[1 + off:4 + off]
            grads = (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
                     dw2.astype(w2.dtype), db2.astype(w2.dtype))
        if has_scale:
            # s is a DropPath keep-mask — a constant of the step, no grad
            grads = (grads[0], jnp.zeros_like(resids[1])) + grads[1:]
        return grads

    mlp.defvjp(mlp_fwd, mlp_bwd)
    return mlp


# --------------------------------------------------------------------------
# Post-epilogue edition: out = PostLN(x + dropout(dense2(act(dense1(x)))))
#
# BERT's post-LN FFN sub-block (models/bert.py BertLayer: fused_mlp -> fence
# -> Dropout -> LN(hidden + out)) leaves three XLA elementwise passes over
# (M, C) in forward (read out, read hidden, write y_pre; read y_pre, write
# ln_out) and their mirrors in backward — part of the measured ~35 ms/step
# elementwise HBM floor (BASELINE.md text_morec_uniform arithmetic). This
# edition runs the dropout-apply, the residual add, and the post-LN as an
# in-kernel epilogue: HBM sees x in and (ln_out, y_pre) out, nothing else.
# y_pre (the pre-LN sum) is saved as a VJP residual so backward recomputes
# only the LN statistics (VPU work) instead of the dot2 — the same
# save-vs-recompute tradeoff as save_h.
#
# Dropout uses the TPU kernel PRNG seeded (seed + program_id), regenerated
# in backward with the identical single draw per row block — the same
# flash-style contract as the attention kernel's in-kernel dropout
# (ops/pallas/attention.py). Draws differ from the XLA rbg path's (the
# reference's torch dropout draws differ too); eval / drop_rate=0 is exact.
# NOT the measured fused-add+LN dead end: that was a STANDALONE pallas_call
# paying its own block DMA for pure-bandwidth work — here the epilogue rides
# the MLP kernel's existing blocks and the only new traffic is y_pre.
# --------------------------------------------------------------------------


def _fwd_post_body(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g2_ref, bt2_ref, out_ref, ypre_ref, h_ref, *,
                   eps2, p, act):
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[...]
    h = _dot(x, w1_ref[...], 1, 0) + b1_ref[...].astype(jnp.float32)
    if h_ref is not None:
        h_ref[...] = h.astype(h_ref.dtype)
    g = _act_f32(h, act).astype(x.dtype)
    y = _dot(g, w2_ref[...], 1, 0) + b2_ref[...].astype(jnp.float32)
    if p > 0.0:
        bits = pltpu.prng_random_bits(y.shape)
        thresh = jnp.uint32(min(int(p * (2.0 ** 32)), 2 ** 32 - 1))
        keep = pltpu.bitcast(bits, jnp.uint32) >= thresh
        y = jnp.where(keep, y / (1.0 - p), jnp.zeros_like(y))
    ypre = y + x.astype(jnp.float32)
    # cast BEFORE the LN stats so forward and backward (which recomputes the
    # stats from the saved compute-dtype y_pre) see the same values; the
    # fwd-only edition keeps the cast so its output is bit-identical
    ypre_c = ypre.astype(x.dtype)
    if ypre_ref is not None:
        ypre_ref[...] = ypre_c
    _, _, out = _ln_f32(ypre_c.astype(jnp.float32), g2_ref, bt2_ref, eps2)
    out_ref[...] = out.astype(out_ref.dtype)


def _fwd_post_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     g2_ref, bt2_ref, out_ref, ypre_ref, h_ref, *,
                     eps2, p, act):
    _fwd_post_body(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g2_ref, bt2_ref, out_ref, ypre_ref, h_ref,
                   eps2=eps2, p=p, act=act)


def _fwd_post_only_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          g2_ref, bt2_ref, out_ref, *, eps2, p, act):
    """Forward-only edition: no VJP residual outputs. Used as the
    custom_vjp PRIMAL — when nothing differentiates through the call
    (eval / catalog encode) HBM sees only x in and ln_out out, instead of
    paying the (M, C) y_pre + (M, F) h residual writes for grads nobody
    takes."""
    _fwd_post_body(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g2_ref, bt2_ref, out_ref, None, None,
                   eps2=eps2, p=p, act=act)


def _bwd_post_kernel(seed_ref, x_ref, w1_ref, w2_ref, g2_ref, ypre_ref,
                     h_ref, dout_ref, dx_ref, dg2_ref, dbt2_ref,
                     dw1_ref, db1_ref, dw2_ref, db2_ref, *, eps2, p, act):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        dbt2_ref[...] = jnp.zeros_like(dbt2_ref)

    if p > 0.0:
        # same seed, same single y-shaped draw => same mask as forward
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits(dout_ref.shape)
        thresh = jnp.uint32(min(int(p * (2.0 ** 32)), 2 ** 32 - 1))
        keep = pltpu.bitcast(bits, jnp.uint32) >= thresh

    # post-LN backward from the saved pre-LN sum
    ypre = ypre_ref[...].astype(jnp.float32)
    mu = jnp.mean(ypre, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(ypre * ypre, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    rstd = jax.lax.rsqrt(var + eps2)
    xhat = (ypre - mu) * rstd
    dout = dout_ref[...].astype(jnp.float32)
    dg2_ref[...] += jnp.sum(dout * xhat, axis=0,
                            dtype=jnp.float32).reshape(dg2_ref.shape)
    dbt2_ref[...] += jnp.sum(dout, axis=0,
                             dtype=jnp.float32).reshape(dbt2_ref.shape)
    dxhat = dout * g2_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dyp = rstd * (dxhat - m1 - xhat * m2)          # d(y_pre), f32

    # dropout backward feeds the MLP chain; the residual branch is dyp itself
    dmlp = (jnp.where(keep, dyp / (1.0 - p), jnp.zeros_like(dyp))
            if p > 0.0 else dyp)
    dmlp_c = dmlp.astype(x_ref.dtype)
    h = h_ref[...].astype(jnp.float32)
    g = _act_f32(h, act).astype(x_ref.dtype)
    dw2_ref[...] += _dot(g, dmlp_c, 0, 0)
    db2_ref[...] += jnp.sum(dmlp, axis=0,
                            dtype=jnp.float32).reshape(db2_ref.shape)
    dg_ = _dot(dmlp_c, w2_ref[...], 1, 1)
    dh = (dg_ * _dact_f32(h, act)).astype(x_ref.dtype)
    dw1_ref[...] += _dot(x_ref[...], dh, 0, 0)
    db1_ref[...] += jnp.sum(dh, axis=0,
                            dtype=jnp.float32).reshape(db1_ref.shape)
    dx = _dot(dh, w1_ref[...], 1, 1) + dyp
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _align_blocks(pick, drop_rate: float):
    """The flash-style in-kernel dropout regenerates its mask in backward
    from (seed + program_id) with block-shaped draws — forward and backward
    row blocks MUST be equal whenever drop_rate > 0 or the regenerated mask
    differs from the applied one (the attention kernel's NBf==NBb invariant,
    PARITY r3 item 13). Eval / drop 0 keeps the independently-optimal picks."""
    if pick is None or drop_rate <= 0.0:
        return pick
    bm = min(pick)
    return (bm, bm)


def _pick_block_post(C: int, F: int, itemsize: int):
    """Row blocks for the post-epilogue edition: save_h geometry plus the
    y_pre stream and the (1, C) LN-grad accumulators."""
    Cl = -(-C // 128) * 128
    Fl = -(-F // 128) * 128
    res_w = 2 * C * Fl * itemsize + 2 * Fl * 4 + 2 * Cl * 4   # + gamma/beta
    res_bwd = res_w + 2 * C * Fl * 4 + 2 * Fl * 4 + 2 * Cl * 4

    def pick(bwd):
        res = res_bwd if bwd else res_w
        nio = 4 if bwd else 3          # x, ypre, out/dout (+dx in bwd)
        for bm in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
            io = 2 * nio * bm * Cl * itemsize
            io += 2 * bm * Fl * itemsize                      # h out/in
            tmp = ((5 if bwd else 3) * bm * Fl * 4
                   + (6 if bwd else 4) * bm * Cl * 4)
            if tmp <= 12 * 2 ** 20 and res + io + tmp <= 40 * 2 ** 20:
                return bm
        return None
    f, b = pick(False), pick(True)
    return None if (f is None or b is None) else (f, b)


@functools.lru_cache(maxsize=None)
def _build_post(eps2: float, p: float, interpret: bool, BMf: int, BMb: int,
                act: str):
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def fwd_call(seed, x, w1, b1, w2, b2, g2, bt2):
        M, C = x.shape
        F = w1.shape[1]
        blk = lambda bm: pl.BlockSpec((bm, C), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
        blkF = pl.BlockSpec((BMf, F), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_fwd_post_kernel, eps2=eps2, p=p, act=act),
            grid=(M // BMf,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk(BMf)]
            + [const_spec(a.shape) for a in (w1, b1, w2, b2, g2, bt2)],
            out_specs=[blk(BMf), blk(BMf), blkF],
            out_shape=[jax.ShapeDtypeStruct((M, C), x.dtype),
                       jax.ShapeDtypeStruct((M, C), x.dtype),
                       jax.ShapeDtypeStruct((M, F), x.dtype)],
            compiler_params=params,
            interpret=interpret,
        )(seed, x, w1, b1, w2, b2, g2, bt2)

    def fwd_only_call(seed, x, w1, b1, w2, b2, g2, bt2):
        M, C = x.shape
        blk = pl.BlockSpec((BMf, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_fwd_post_only_kernel, eps2=eps2, p=p,
                              act=act),
            grid=(M // BMf,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk]
            + [const_spec(a.shape) for a in (w1, b1, w2, b2, g2, bt2)],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
            compiler_params=params,
            interpret=interpret,
        )(seed, x, w1, b1, w2, b2, g2, bt2)

    def bwd_call(seed, x, w1, w2, g2, ypre, h, dout):
        M, C = x.shape
        F = w1.shape[1]
        blk = pl.BlockSpec((BMb, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        blkF = pl.BlockSpec((BMb, F), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_bwd_post_kernel, eps2=eps2, p=p, act=act),
            grid=(M // BMb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk]
            + [const_spec(a.shape) for a in (w1, w2, g2)]
            + [blk, blkF, blk],
            out_specs=[blk, const_spec((1, C)), const_spec((1, C)),
                       const_spec((C, F)), const_spec((1, F)),
                       const_spec((F, C)), const_spec((1, C))],
            out_shape=[jax.ShapeDtypeStruct((M, C), x.dtype),
                       jax.ShapeDtypeStruct((1, C), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32),
                       jax.ShapeDtypeStruct((C, F), jnp.float32),
                       jax.ShapeDtypeStruct((1, F), jnp.float32),
                       jax.ShapeDtypeStruct((F, C), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32)],
            compiler_params=params,
            interpret=interpret,
        )(seed, x, w1, w2, g2, ypre, h, dout)

    @jax.custom_vjp
    def mlp(seed, x, w1, b1, w2, b2, g2, bt2):
        # primal = fwd-only kernel: runs when nothing differentiates
        # through the call (eval); training traces mlp_fwd instead
        return fwd_only_call(seed, x, w1, b1, w2, b2, g2, bt2)

    def mlp_fwd(seed, x, w1, b1, w2, b2, g2, bt2):
        out, ypre, h = fwd_call(seed, x, w1, b1, w2, b2, g2, bt2)
        return out, (seed, x, w1, w2, g2, ypre, h)

    def mlp_bwd(res, dout):
        seed, x, w1, w2, g2, ypre, h = res
        dx, dg2, dbt2, dw1, db1, dw2, db2 = bwd_call(
            seed, x, w1, w2, g2, ypre, h, dout)
        return (None, dx, dw1.astype(w1.dtype), db1.astype(w1.dtype),
                dw2.astype(w2.dtype), db2.astype(w2.dtype),
                dg2.astype(g2.dtype), dbt2.astype(g2.dtype))

    mlp.defvjp(mlp_fwd, mlp_bwd)
    return mlp


def fused_mlp_resln(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                    w2: jnp.ndarray, b2: jnp.ndarray, *,
                    ln2: tuple, eps2: float, drop_rate: float = 0.0,
                    seed=None, act: str = "gelu",
                    interpret: bool = None) -> jnp.ndarray:
    """(..., C) -> (..., C): PostLN(x + dropout(dense2(act(dense1(x))))).

    BERT's post-LN FFN sub-block in one kernel (models/bert.py BertLayer);
    ln2 = (scale, bias) of the POST LayerNorm, eps2 its epsilon. drop_rate
    uses the in-kernel TPU PRNG (seed: (1,) int32) — pass 0.0 when
    deterministic. Returns None when no row blocking fits VMEM (caller
    falls back)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = x.shape[-1]
    F = w1.shape[1]
    pick = _align_blocks(_pick_block_post(C, F, x.dtype.itemsize), drop_rate)
    if pick is None:
        return None
    if drop_rate > 0.0 and interpret:
        # pltpu.prng_* has no interpret lowering on CPU — only the exact
        # (eval / drop 0) epilogue is testable off-TPU
        return None
    BMf, BMb = pick
    shape = x.shape
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    pad = (-M) % max(BMf, BMb)
    if pad:
        # padded x rows are zeros but their OUTPUT rows are not (b1/b2 make
        # y_pre nonzero): correctness rests on the VJP zero-padding dout, so
        # every padded row's grad contribution is 0, and on slicing the
        # primal back to M rows below
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    if seed is None:
        if drop_rate != 0.0:
            raise ValueError(
                "fused_mlp_resln: drop_rate > 0 requires a seed (a (1,) "
                "int32); seed=None would reuse the identical mask every "
                "call")
        seed = jnp.zeros((1,), jnp.int32)
    assert act in ("gelu", "relu", "quick_gelu"), act
    out = _build_post(float(eps2), float(drop_rate), bool(interpret),
                      BMf, BMb, act)(
        seed, x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
        ln2[0].reshape(1, -1), ln2[1].reshape(1, -1))
    if pad:
        out = out[:M]
    return out.reshape(shape)


# --------------------------------------------------------------------------
# Projection epilogue edition: out = PostLN(res + dropout(x @ W + b))
#
# BERT's post-attention sub-block tail (models/bert.py BertLayer:
# attention_output Dense -> fence -> Dropout -> LN(hidden + out)) — the same
# three XLA elementwise passes as the FFN tail, riding a single projection.
# Same save-y_pre / regenerate-mask contract as fused_mlp_resln. NOT the r2
# fully-fused-attention dead end: the projection keeps its own kernel with
# big-M row blocks; only its tail moves in.
# --------------------------------------------------------------------------


def _fwd_proj_body(seed_ref, x_ref, res_ref, w_ref, b_ref, g2_ref, bt2_ref,
                   out_ref, ypre_ref, *, eps2, p):
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    y = _dot(x_ref[...], w_ref[...], 1, 0) + b_ref[...].astype(jnp.float32)
    if p > 0.0:
        bits = pltpu.prng_random_bits(y.shape)
        thresh = jnp.uint32(min(int(p * (2.0 ** 32)), 2 ** 32 - 1))
        keep = pltpu.bitcast(bits, jnp.uint32) >= thresh
        y = jnp.where(keep, y / (1.0 - p), jnp.zeros_like(y))
    ypre = y + res_ref[...].astype(jnp.float32)
    ypre_c = ypre.astype(x_ref.dtype)
    if ypre_ref is not None:
        ypre_ref[...] = ypre_c
    _, _, out = _ln_f32(ypre_c.astype(jnp.float32), g2_ref, bt2_ref, eps2)
    out_ref[...] = out.astype(out_ref.dtype)


def _fwd_proj_kernel(seed_ref, x_ref, res_ref, w_ref, b_ref, g2_ref, bt2_ref,
                     out_ref, ypre_ref, *, eps2, p):
    _fwd_proj_body(seed_ref, x_ref, res_ref, w_ref, b_ref, g2_ref, bt2_ref,
                   out_ref, ypre_ref, eps2=eps2, p=p)


def _fwd_proj_only_kernel(seed_ref, x_ref, res_ref, w_ref, b_ref, g2_ref,
                          bt2_ref, out_ref, *, eps2, p):
    """Forward-only edition (custom_vjp primal): skips the (M, C) y_pre
    residual write when nothing differentiates through the call."""
    _fwd_proj_body(seed_ref, x_ref, res_ref, w_ref, b_ref, g2_ref, bt2_ref,
                   out_ref, None, eps2=eps2, p=p)


def _bwd_proj_kernel(seed_ref, x_ref, w_ref, g2_ref, ypre_ref, dout_ref,
                     dx_ref, dres_ref, dg2_ref, dbt2_ref, dw_ref, db_ref, *,
                     eps2, p):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        dbt2_ref[...] = jnp.zeros_like(dbt2_ref)

    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits(dout_ref.shape)
        thresh = jnp.uint32(min(int(p * (2.0 ** 32)), 2 ** 32 - 1))
        keep = pltpu.bitcast(bits, jnp.uint32) >= thresh

    ypre = ypre_ref[...].astype(jnp.float32)
    mu = jnp.mean(ypre, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(ypre * ypre, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    rstd = jax.lax.rsqrt(var + eps2)
    xhat = (ypre - mu) * rstd
    dout = dout_ref[...].astype(jnp.float32)
    dg2_ref[...] += jnp.sum(dout * xhat, axis=0,
                            dtype=jnp.float32).reshape(dg2_ref.shape)
    dbt2_ref[...] += jnp.sum(dout, axis=0,
                             dtype=jnp.float32).reshape(dbt2_ref.shape)
    dxhat = dout * g2_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dyp = rstd * (dxhat - m1 - xhat * m2)
    dres_ref[...] = dyp.astype(dres_ref.dtype)

    dproj = (jnp.where(keep, dyp / (1.0 - p), jnp.zeros_like(dyp))
             if p > 0.0 else dyp)
    dproj_c = dproj.astype(x_ref.dtype)
    dw_ref[...] += _dot(x_ref[...], dproj_c, 0, 0)
    db_ref[...] += jnp.sum(dproj, axis=0,
                           dtype=jnp.float32).reshape(db_ref.shape)
    dx_ref[...] = _dot(dproj_c, w_ref[...], 1, 1).astype(dx_ref.dtype)


def _pick_block_proj(C: int, itemsize: int):
    Cl = -(-C // 128) * 128
    res_w = C * Cl * itemsize + Cl * 4 + 2 * Cl * 4
    res_bwd = res_w + C * Cl * 4 + Cl * 4 + 2 * Cl * 4

    def pick(bwd):
        res = res_bwd if bwd else res_w
        nio = 5 if bwd else 4
        for bm in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
            io = 2 * nio * bm * Cl * itemsize
            tmp = (6 if bwd else 4) * bm * Cl * 4
            if tmp <= 12 * 2 ** 20 and res + io + tmp <= 40 * 2 ** 20:
                return bm
        return None
    f, b = pick(False), pick(True)
    return None if (f is None or b is None) else (f, b)


@functools.lru_cache(maxsize=None)
def _build_proj(eps2: float, p: float, interpret: bool, BMf: int, BMb: int):
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def fwd_call(seed, x, res, w, b, g2, bt2):
        M, C = x.shape
        blk = pl.BlockSpec((BMf, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_fwd_proj_kernel, eps2=eps2, p=p),
            grid=(M // BMf,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk]
            + [const_spec(a.shape) for a in (w, b, g2, bt2)],
            out_specs=[blk, blk],
            out_shape=[jax.ShapeDtypeStruct((M, C), x.dtype)] * 2,
            compiler_params=params,
            interpret=interpret,
        )(seed, x, res, w, b, g2, bt2)

    def fwd_only_call(seed, x, res, w, b, g2, bt2):
        M, C = x.shape
        blk = pl.BlockSpec((BMf, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_fwd_proj_only_kernel, eps2=eps2, p=p),
            grid=(M // BMf,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk]
            + [const_spec(a.shape) for a in (w, b, g2, bt2)],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
            compiler_params=params,
            interpret=interpret,
        )(seed, x, res, w, b, g2, bt2)

    def bwd_call(seed, x, w, g2, ypre, dout):
        M, C = x.shape
        blk = pl.BlockSpec((BMb, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_bwd_proj_kernel, eps2=eps2, p=p),
            grid=(M // BMb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk]
            + [const_spec(a.shape) for a in (w, g2)] + [blk, blk],
            out_specs=[blk, blk, const_spec((1, C)), const_spec((1, C)),
                       const_spec((C, C)), const_spec((1, C))],
            out_shape=[jax.ShapeDtypeStruct((M, C), x.dtype),
                       jax.ShapeDtypeStruct((M, C), x.dtype),
                       jax.ShapeDtypeStruct((1, C), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32),
                       jax.ShapeDtypeStruct((C, C), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32)],
            compiler_params=params,
            interpret=interpret,
        )(seed, x, w, g2, ypre, dout)

    @jax.custom_vjp
    def proj(seed, x, res, w, b, g2, bt2):
        # primal = fwd-only kernel (eval); training traces proj_fwd
        return fwd_only_call(seed, x, res, w, b, g2, bt2)

    def proj_fwd(seed, x, res, w, b, g2, bt2):
        out, ypre = fwd_call(seed, x, res, w, b, g2, bt2)
        return out, (seed, x, w, g2, ypre)

    def proj_bwd(resid, dout):
        seed, x, w, g2, ypre = resid
        dx, dres, dg2, dbt2, dw, db = bwd_call(seed, x, w, g2, ypre, dout)
        return (None, dx, dres, dw.astype(w.dtype), db.astype(w.dtype),
                dg2.astype(g2.dtype), dbt2.astype(g2.dtype))

    proj.defvjp(proj_fwd, proj_bwd)
    return proj


def fused_proj_resln(x: jnp.ndarray, res: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray, *, ln2: tuple, eps2: float,
                     drop_rate: float = 0.0, seed=None,
                     interpret: bool = None) -> jnp.ndarray:
    """(..., C) -> (..., C): PostLN(res + dropout(x @ w + b)).

    BERT's post-attention projection sub-block in one kernel
    (models/bert.py BertLayer attention tail). Returns None when no row
    blocking fits VMEM or (drop_rate>0, interpret) — caller falls back."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = x.shape[-1]
    pick = _align_blocks(_pick_block_proj(C, x.dtype.itemsize), drop_rate)
    if pick is None:
        return None
    if drop_rate > 0.0 and interpret:
        return None
    BMf, BMb = pick
    shape = x.shape
    x2 = x.reshape(-1, C)
    r2 = res.reshape(-1, C)
    M = x2.shape[0]
    pad = (-M) % max(BMf, BMb)
    if pad:
        # padded x/res rows are zeros but their OUTPUT rows are not (the
        # bias b makes y_pre nonzero): correctness rests on the VJP
        # zero-padding dout and on slicing the primal back to M rows below
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        r2 = jnp.pad(r2, ((0, pad), (0, 0)))
    if seed is None:
        if drop_rate != 0.0:
            raise ValueError(
                "fused_proj_resln: drop_rate > 0 requires a seed (a (1,) "
                "int32); seed=None would reuse the identical mask every "
                "call")
        seed = jnp.zeros((1,), jnp.int32)
    out = _build_proj(float(eps2), float(drop_rate), bool(interpret),
                      BMf, BMb)(
        seed, x2, r2, w, b.reshape(1, -1),
        ln2[0].reshape(1, -1), ln2[1].reshape(1, -1))
    if pad:
        out = out[:M]
    return out.reshape(shape)


def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray, *,
              ln: tuple = None, eps: float = 1e-5, save_h: bool = False,
              act: str = "gelu", interpret: bool = None) -> jnp.ndarray:
    """(..., C) -> (..., C): dense2(act(dense1(maybe_ln(x)))).

    act: "gelu" (exact, via the in-kernel erf), "relu" (OPT FFN), or
    "quick_gelu" (CLIP: x*sigmoid(1.702x)).

    ln: None, or (scale, bias) — LayerNorm(eps) applied inside the kernel
    first (Swin's pre-LN MLP; BERT's post-LN FFN passes ln=None). The
    residual add / DropPath / hidden dropout stay with the caller.
    w1 (C, F), b1 (F,), w2 (F, C), b2 (C,) in the compute dtype.

    save_h=True emits the pre-GELU intermediate as a VJP residual instead
    of recomputing dot1 in backward — at big-M geometries (BERT FFN) the
    recompute dot costs more than the (M, F) round trip it avoids, and
    under remat it brings the dot1 count back to the XLA path's 2 per step.

    Returns None when no row blocking fits the VMEM budget — the caller
    must fall back to the XLA composition.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = x.shape[-1]
    F = w1.shape[1]
    pick = _pick_block_mlp(C, F, x.dtype.itemsize, ln is not None,
                           bool(save_h))
    if pick is None:
        return None
    BMf, BMb = pick
    shape = x.shape
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    pad = (-M) % max(BMf, BMb)
    if pad:
        # padded rows are pure zeros: LN of a zero row is finite (bias
        # only), and their dout rows are zero-padded by the VJP, so every
        # accumulated gradient contribution is exactly 0
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    tail = (w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    args = ((ln[0].reshape(1, -1), ln[1].reshape(1, -1)) + tail
            if ln is not None else tail)
    assert act in ("gelu", "relu", "quick_gelu"), act
    out = _build(float(eps), ln is not None, bool(interpret),
                 BMf, BMb, bool(save_h), act)(x2, *args)
    if pad:
        out = out[:M]
    return out.reshape(shape)


def fused_mlp_res_supported(C: int, F: int, itemsize: int) -> bool:
    """True when fused_mlp_res has a viable row blocking at this geometry —
    callers that DRAW a DropPath mask for the epilogue should check this
    FIRST, or a declined kernel wastes an rng draw and shifts the whole
    downstream 'dropout' stream (vs the module fallback path)."""
    return _pick_block_mlp(C, F, itemsize, True, False) is not None


def fused_mlp_res(x: jnp.ndarray, scale: Optional[jnp.ndarray],
                  w1: jnp.ndarray,
                  b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray, *,
                  ln: tuple, eps: float = 1e-5, act: str = "gelu",
                  interpret: bool = None) -> jnp.ndarray:
    """(..., C) -> (..., C): x + scale * dense2(act(dense1(LN(x)))).

    The pre-LN residual tail as an in-kernel epilogue (Swin's
    `x + DropPath(mlp(LN(x)))`, models/swin.py SwinBlock) — the separate
    XLA elementwise pass that read x and the MLP output and wrote the sum
    disappears; HBM sees x (and the tiny per-row scale) in and the summed
    output out. scale is a per-ROW factor broadcast over C: the DropPath
    keep-mask divided by the keep probability (all-ones when inactive);
    it is treated as a constant of the step (zero cotangent);
    scale=None drops the scale operand entirely (pure x + mlp(LN(x)) — the
    CLIP/MAE/OPT pre-LN fold).

    Returns None when no row blocking fits (caller falls back to the XLA
    composition).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = x.shape[-1]
    F = w1.shape[1]
    pick = _pick_block_mlp(C, F, x.dtype.itemsize, True, False)
    if pick is None:
        return None
    BMf, BMb = pick
    shape = x.shape
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    unit = scale is None
    pad = (-M) % max(BMf, BMb)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    consts = (ln[0].reshape(1, -1), ln[1].reshape(1, -1),
              w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    assert act in ("gelu", "relu", "quick_gelu"), act
    builder = _build(float(eps), True, bool(interpret), BMf, BMb, False,
                     act, res=True, unit=unit)
    if unit:
        out = builder(x2, *consts)
    else:
        s2 = jnp.broadcast_to(scale.astype(jnp.float32).reshape(-1, 1),
                              (M, 1))
        if pad:
            s2 = jnp.pad(s2, ((0, pad), (0, 0)))
        out = builder(x2, s2, *consts)
    if pad:
        out = out[:M]
    return out.reshape(shape)
