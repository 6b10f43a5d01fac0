"""Diagnostic fwd-only kernels to isolate fused_mha cost components:
  slice  — per-head lane slices only (copy q-slice to out)
  dots   — slices + the two dots (no softmax; scores used raw)
  nosm   — full pipeline but softmax replaced by *1.0 cast
  full   — the real forward
Usage: python tools/mha_diag.py"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import drain

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, T, H, NH = 2688, 30, 512, 8
DH = H // NH
NB = 16


def k_slice(qkv_ref, out_ref):
    for h in range(NH):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH]
        k = qkv_ref[:, :, H + h * DH:H + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * H + h * DH:2 * H + (h + 1) * DH]
        out_ref[:, :, h * DH:(h + 1) * DH] = q + k + v


def k_dots(qkv_ref, out_ref):
    scale = 1.0 / math.sqrt(DH)
    for h in range(NH):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH]
        k = qkv_ref[:, :, H + h * DH:H + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * H + h * DH:2 * H + (h + 1) * DH]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        ctx = jax.lax.dot_general(
            scores.astype(qkv_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * DH:(h + 1) * DH] = ctx.astype(out_ref.dtype)


def k_full(qkv_ref, out_ref, *, softmax):
    scale = 1.0 / math.sqrt(DH)
    for h in range(NH):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH]
        k = qkv_ref[:, :, H + h * DH:H + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * H + h * DH:2 * H + (h + 1) * DH]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if softmax:
            probs = jax.nn.softmax(scores, axis=-1).astype(qkv_ref.dtype)
        else:
            probs = (scores * 1.0).astype(qkv_ref.dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * DH:(h + 1) * DH] = ctx.astype(out_ref.dtype)


def run(name, kernel):
    call = pl.pallas_call(
        kernel,
        grid=(M // NB,),
        in_specs=[pl.BlockSpec((NB, T, 3 * H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NB, T, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, T, H), jnp.bfloat16),
    )

    @jax.jit
    def fn(x):
        o = call(x)
        return jnp.concatenate([o, x[:, :, H:]], axis=-1)

    x = jax.random.normal(jax.random.PRNGKey(0), (M, T, 3 * H), jnp.bfloat16)
    y = x
    for _ in range(3):
        y = fn(y)
    drain(y)
    t0 = time.perf_counter()
    for _ in range(30):
        y = fn(y)
    drain(y)
    print(f"{name:>8}: {(time.perf_counter()-t0)/30*1e3:7.3f} ms")


if __name__ == "__main__" and not os.environ.get("DIAG2") and not os.environ.get("DIAG3"):
    run("slice", k_slice)
    run("dots", k_dots)
    run("nosm", functools.partial(k_full, softmax=False))
    run("full", functools.partial(k_full, softmax=True))


def k_withmask(seed_ref, qkv_ref, mask_ref, out_ref):
    import idvs.morec_tpu.ops.pallas.attention as A
    scale = 1.0 / math.sqrt(DH)
    bias, gate = A._bias_and_gate(mask_ref[:], T)
    for h in range(NH):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH]
        k = qkv_ref[:, :, H + h * DH:H + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * H + h * DH:2 * H + (h + 1) * DH]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + bias[:, None, :] + gate[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(qkv_ref.dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * DH:(h + 1) * DH] = ctx.astype(out_ref.dtype)


def run2(name, kernel, with_seed):
    specs = [pl.BlockSpec((NB, T, 3 * H), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((NB, 1, T), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
    if with_seed:
        specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs
        kfn = kernel
    else:
        kfn = lambda qkv, m, o: kernel(None, qkv, m, o)
    call = pl.pallas_call(
        kfn,
        grid=(M // NB,),
        in_specs=specs,
        out_specs=pl.BlockSpec((NB, T, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, T, H), jnp.bfloat16),
    )
    mask = jnp.ones((M, 1, T), jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def fn(x):
        o = call(seed, x, mask) if with_seed else call(x, mask)
        return jnp.concatenate([o, x[:, :, H:]], axis=-1)

    x = jax.random.normal(jax.random.PRNGKey(0), (M, T, 3 * H), jnp.bfloat16)
    y = x
    for _ in range(3):
        y = fn(y)
    drain(y)
    t0 = time.perf_counter()
    for _ in range(30):
        y = fn(y)
    drain(y)
    print(f"{name:>12}: {(time.perf_counter()-t0)/30*1e3:7.3f} ms")


if os.environ.get("DIAG2") and not os.environ.get("DIAG3"):
    run2("mask", k_withmask, with_seed=False)
    run2("mask+seed", k_withmask, with_seed=True)


def k_gateonly(qkv_ref, mask_ref, out_ref):
    scale = 1.0 / math.sqrt(DH)
    rg = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0) // T
    cg = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) // T
    gate = jnp.where(rg == cg, 0.0, -1e9).astype(jnp.float32)
    for h in range(NH):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH]
        k = qkv_ref[:, :, H + h * DH:H + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * H + h * DH:2 * H + (h + 1) * DH]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + gate[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(qkv_ref.dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * DH:(h + 1) * DH] = ctx.astype(out_ref.dtype)


def k_biasonly(qkv_ref, mask_ref, out_ref):
    scale = 1.0 / math.sqrt(DH)
    bias = (1.0 - mask_ref[:].astype(jnp.float32)) * -1e9   # (NB, 1, T)
    for h in range(NH):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH]
        k = qkv_ref[:, :, H + h * DH:H + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * H + h * DH:2 * H + (h + 1) * DH]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + bias                               # bcast over dim1
        probs = jax.nn.softmax(scores, axis=-1).astype(qkv_ref.dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * DH:(h + 1) * DH] = ctx.astype(out_ref.dtype)


def k_biassq(qkv_ref, mask_ref, out_ref):
    scale = 1.0 / math.sqrt(DH)
    bias = (1.0 - mask_ref[:, 0, :].astype(jnp.float32)) * -1e9  # (NB, T)
    for h in range(NH):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH]
        k = qkv_ref[:, :, H + h * DH:H + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * H + h * DH:2 * H + (h + 1) * DH]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + bias[:, None, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(qkv_ref.dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * DH:(h + 1) * DH] = ctx.astype(out_ref.dtype)


if os.environ.get("DIAG3"):
    run2("gate-only", lambda s, q, m, o: k_gateonly(q, m, o), with_seed=False)
    run2("bias-bcast", lambda s, q, m, o: k_biasonly(q, m, o), with_seed=False)
    run2("bias-squeeze", lambda s, q, m, o: k_biassq(q, m, o), with_seed=False)
