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


def _fwd_kernel(*refs, eps, ln, save_h, act):
    if save_h:
        *refs, h_ref = refs
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
    out_ref[...] = y.astype(out_ref.dtype)


def _bwd_kernel(*refs, eps, ln, save_h, act):
    h_ref = None
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
        dx_ref[...] = dx.astype(dx_ref.dtype)
    else:
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
           save_h: bool, act: str):
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def _F(args):
        return (args[2] if ln else args[0]).shape[1]

    def fwd_call(x, *args):
        M, C = x.shape
        blk = pl.BlockSpec((BMf, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        out_specs = blk
        out_shape = jax.ShapeDtypeStruct((M, C), x.dtype)
        if save_h:
            blkF = pl.BlockSpec((BMf, _F(args)), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
            out_specs = [blk, blkF]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((M, _F(args)), x.dtype)]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, eps=eps, ln=ln, save_h=save_h,
                              act=act),
            grid=(M // BMf,),
            in_specs=[blk] + [const_spec(a.shape) for a in args],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, *args)

    def bwd_call(x, *args):
        # args = ([gamma, beta,] w1, b1, w2, [h,] dout)
        M, C = x.shape
        F = _F(args)
        blk = pl.BlockSpec((BMb, C), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
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
        n_const = len(args) - (2 if save_h else 1)
        in_specs = ([blk] + [const_spec(a.shape) for a in args[:n_const]]
                    + ([blkF] if save_h else []) + [blk])
        return pl.pallas_call(
            functools.partial(_bwd_kernel, eps=eps, ln=ln, save_h=save_h,
                              act=act),
            grid=(M // BMb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, *args)

    @jax.custom_vjp
    def mlp(x, *args):
        out = fwd_call(x, *args)
        return out[0] if save_h else out

    def mlp_fwd(x, *args):
        if save_h:
            y, h = fwd_call(x, *args)
            return y, (x,) + args[:-1] + (h,)          # b2 not needed in bwd
        return fwd_call(x, *args), (x,) + args[:-1]

    def mlp_bwd(res, dout):
        # res = (x, [gamma, beta,] w1, b1, w2[, h])
        outs = bwd_call(*res, dout)
        if ln:
            dx, dgm, dbt, dw1, db1, dw2, db2 = outs
            x, gm, bt, w1, b1, w2 = res[:6]
            return (dx, dgm.astype(gm.dtype), dbt.astype(bt.dtype),
                    dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dw2.astype(w2.dtype), db2.astype(w2.dtype))
        dx, dw1, db1, dw2, db2 = outs
        x, w1, b1, w2 = res[:4]
        return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(w2.dtype))

    mlp.defvjp(mlp_fwd, mlp_bwd)
    return mlp


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
