"""Fused dropout + residual-add + LayerNorm Pallas kernel (custom VJP).

The post-LN transformer pattern `LN(resid + dropout(x))` appears twice per
BERT layer (reference model/modules.py:78-96 residual structure; HF BERT
attention/output blocks). Composed in XLA it costs, per site, a threefry
mask generation + a masked-scale pass + an add pass + LN stats/normalize
passes (and their backward mirrors), each a full HBM round-trip over the
(B*S*T, H) token stream — none of which may fuse into the adjacent matmuls
without hitting v5e's transpose-reuse emitters (the `_fence` rationale in
models/bert.py). This kernel does the whole thing in one read of (x, resid)
and one write of y; backward regenerates the dropout mask from the TPU PRNG
(flash-style — nothing stored but the inputs) and emits dx, dresid, dscale,
dbias in one pass. The pallas_call boundary doubles as the fusion fence.

Numerics match the flax composition: dropout scales kept lanes by 1/(1-p)
in the input dtype; the residual add is in the input dtype; LN statistics
and normalization run in f32 (flax LayerNorm promotes to f32), scale/bias
applied in f32, result cast back. use_fast_variance semantics
(mean-of-squares minus squared-mean). Dropout draws come from the TPU PRNG
(seeded from the flax dropout key), so bits differ from threefry's but the
Bernoulli semantics and per-seed determinism are identical — same contract
as ops/pallas/attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep(shape, p):
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(min(int(p * (2.0 ** 32)), 2 ** 32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _stats(s32, eps):
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    var = jnp.mean(s32 * s32, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    return mu, rstd


def _fwd_kernel(seed_ref, x_ref, r_ref, scale_ref, bias_ref, out_ref, *,
                p, eps):
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        x = jnp.where(_keep(x_ref.shape, p),
                      x_ref[:] / (1.0 - p), jnp.zeros_like(x_ref))
    else:
        x = x_ref[:]
    s32 = (r_ref[:] + x).astype(jnp.float32)
    mu, rstd = _stats(s32, eps)
    # flax LayerNorm op order: y = (x - mean) * (rstd * scale) + bias
    mul = rstd * scale_ref[:].astype(jnp.float32)
    y = (s32 - mu) * mul + bias_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, r_ref, scale_ref, dout_ref,
                dx_ref, dr_ref, dscale_ref, dbias_ref, *, p, eps):
    if p > 0.0:
        # same seed, same generation order as forward => identical mask
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _keep(x_ref.shape, p)
        x = jnp.where(keep, x_ref[:] / (1.0 - p), jnp.zeros_like(x_ref))
    else:
        x = x_ref[:]
    s32 = (r_ref[:] + x).astype(jnp.float32)
    mu, rstd = _stats(s32, eps)
    norm = (s32 - mu) * rstd
    dout = dout_ref[:].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dscale_ref[:] += jnp.sum(dout * norm, axis=0, keepdims=True)
    dbias_ref[:] += jnp.sum(dout, axis=0, keepdims=True)

    dnorm = dout * scale_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dnorm, axis=-1, keepdims=True)
    m2 = jnp.mean(dnorm * norm, axis=-1, keepdims=True)
    ds = rstd * (dnorm - m1 - norm * m2)
    dr_ref[:] = ds.astype(dr_ref.dtype)
    if p > 0.0:
        dx = jnp.where(keep, ds.astype(dx_ref.dtype) / (1.0 - p),
                       jnp.zeros_like(dx_ref))
    else:
        dx = ds.astype(dx_ref.dtype)
    dx_ref[:] = dx


@functools.lru_cache(maxsize=None)
def _build(p: float, eps: float, interpret: bool):
    RB = 512   # token rows per block: 3 x (RB, H) bf16 blocks well under VMEM

    def fwd_call(x, r, scale, bias, seed):
        R, H = x.shape
        return pl.pallas_call(
            functools.partial(_fwd_kernel, p=p, eps=eps),
            grid=(R // RB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((RB, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), x.dtype),
            interpret=interpret,
        )(seed, x, r, scale, bias)

    def bwd_call(x, r, scale, seed, dout):
        R, H = x.shape
        dx, dr, dscale, dbias = pl.pallas_call(
            functools.partial(_bwd_kernel, p=p, eps=eps),
            grid=(R // RB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((RB, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((RB, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                # revisited block: accumulated across the whole grid
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((R, H), x.dtype),
                jax.ShapeDtypeStruct((R, H), r.dtype),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
            ],
            interpret=interpret,
        )(seed, x, r, scale, dout)
        return dx, dr, dscale[0], dbias[0]

    @jax.custom_vjp
    def dal(x, r, scale, bias, seed):
        return fwd_call(x, r, scale, bias, seed)

    def dal_fwd(x, r, scale, bias, seed):
        return fwd_call(x, r, scale, bias, seed), (x, r, scale, seed)

    def dal_bwd(res, dout):
        x, r, scale, seed = res
        dx, dr, dscale, dbias = bwd_call(x, r, scale, seed, dout)
        return (dx, dr, dscale.astype(scale.dtype),
                dbias.astype(scale.dtype), None)

    dal.defvjp(dal_fwd, dal_bwd)
    return dal


def fused_drop_add_ln(x: jnp.ndarray, resid: jnp.ndarray,
                      scale: jnp.ndarray, bias: jnp.ndarray, *,
                      drop_rate: float = 0.0, eps: float = 1e-12,
                      dropout_rng=None, interpret: bool = None) -> jnp.ndarray:
    """LN(resid + dropout(x)) over the last axis. x/resid: (..., H);
    scale/bias: (H,). drop_rate > 0 needs dropout_rng."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if drop_rate > 0.0 and dropout_rng is not None:
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
        drop_rate = 0.0
    shape = x.shape
    H = shape[-1]
    R = x.size // H
    x2 = x.reshape(R, H)
    r2 = resid.reshape(R, H)
    RB = 512
    pad = (-R) % RB
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        r2 = jnp.pad(r2, ((0, pad), (0, 0)))
    out = _build(float(drop_rate), float(eps), bool(interpret))(
        x2, r2, scale.reshape(1, H), bias.reshape(1, H), seed)
    if pad:
        out = out[:R]
    return out.reshape(shape)
