"""Measure the fused-CE kernel's crossover vs XLA in its GATHERED regime.

The fused Pallas in-batch CE (ops/pallas/inbatch_ce.py) exists for
--gather_negatives on a mesh: with W chips the candidate set is the GLOBAL
batch (width W*B*S) and the XLA path materializes a (B*L, W*B*S) f32 logits
matrix (x2 with the softmax temporaries) in HBM, while the kernel keeps
tiles in VMEM. Only one chip is available here, but the kernel takes the
gathered candidates as explicit inputs, so the regime is emulated by
synthesizing candidate sets of width W*B*S and timing fwd+bwd at increasing
W — the measured crossover (and the W where XLA OOMs outright) is what
PARITY.md reports instead of a projection.

Run on the real TPU:  python tools/ce_crossover.py
Env: CE_B, CE_L, CE_D (default 256/20/512 = the IDRec reference geometry),
     CE_WS (comma list of widths, default 1,2,4,8,16).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from idvs.morec_tpu.ops.masking import MASK_VAL, label_columns
from idvs.morec_tpu.ops.pallas.inbatch_ce import _fused_ce
from tools._timing import drain


def xla_gathered_ce(user_vec, item_ids, log_mask,
                    cand_embs, cand_ids, cand_colmask, cand_logpop,
                    label_off):
    """The exact XLA composition ops/losses.py:inbatch_debiased_ce runs
    after its all_gathers, with the gathered candidate arrays explicit."""
    B, L, D = user_vec.shape
    f32 = jnp.float32
    WB, S, _ = cand_embs.shape
    flat_cand = cand_embs.reshape(WB * S, D)
    flat_user = user_vec.reshape(B * L, D)
    logits = jnp.dot(flat_user, flat_cand.T, preferred_element_type=f32)
    logits = logits - cand_logpop.reshape(-1)[None, :].astype(f32)
    colmask = cand_colmask.reshape(-1)
    logits = jnp.where(colmask[None, :] == 0, MASK_VAL, logits)
    flat_cand_ids = cand_ids.reshape(-1)
    reject = jnp.any(item_ids[:, :, None] == flat_cand_ids[None, None, :],
                     axis=1)
    lab = label_columns(B, L) + label_off
    lab_onehot = jax.nn.one_hot(lab, WB * S, dtype=bool)
    reject3 = jnp.logical_and(reject[:, None, :], jnp.logical_not(lab_onehot))
    logits = logits.reshape(B, L, WB * S)
    logits = jnp.where(reject3, MASK_VAL, logits)
    logits = logits.reshape(B * L, -1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.take_along_axis(logp, lab.reshape(-1)[:, None], axis=-1)[..., 0]
    w = (log_mask.reshape(-1) != 0).astype(f32)
    return -(tgt * w).sum() / jnp.maximum(w.sum(), 1.0)


def bench_one(W, B, L, D, item_num=100_000, iters=20, warmup=3):
    S = L + 1
    rng = np.random.default_rng(0)
    user_vec = jnp.asarray(rng.normal(0, 0.05, (B, L, D)), jnp.float32)
    item_ids = jnp.asarray(
        rng.integers(1, item_num, size=(B, S)), jnp.int32)
    log_mask = jnp.ones((B, L), jnp.float32)
    # synthetic gathered candidates: W shards' worth of batches
    cand_embs = jnp.asarray(rng.normal(0, 0.05, (W * B, S, D)), jnp.float32)
    cand_ids = jnp.asarray(
        rng.integers(1, item_num, size=(W * B, S)), jnp.int32)
    cand_colmask = jnp.ones((W * B, S), jnp.float32)
    cand_logpop = jnp.asarray(
        np.log(rng.uniform(1e-6, 1e-3, size=(W * B, S))), jnp.float32)
    # rows sit on shard 0 in the emulation
    label_off = jnp.zeros((), jnp.int32)

    def run(fn, tag):
        def loss(u, c):
            return fn(u, item_ids, log_mask, c, cand_ids, cand_colmask,
                      cand_logpop, label_off)

        step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        try:
            (l, (du, dc)) = step(user_vec, cand_embs)
            l.block_until_ready()
        except Exception as e:
            return None, f"{type(e).__name__}"
        for _ in range(warmup):
            (l, (du, dc)) = step(user_vec, cand_embs)
        drain(du)
        t0 = time.perf_counter()
        u = user_vec
        for _ in range(iters):
            (l, (du, dc)) = step(u, cand_embs)
            u = u + 0.0 * du   # data dependence: no overlap-hidden tail
        drain(u)
        dt = (time.perf_counter() - t0) / iters * 1000
        return dt, float(l)

    def pallas_fn(u, ids, lm, c, cids, ccm, clp, off):
        from idvs.morec_tpu.ops.pallas.inbatch_ce import _tiles
        bm, bn = _tiles(B * L, W * B * S, 128, 512)
        return _fused_ce(u, c, ids, lm, cids, ccm, clp, off, L, bm, bn, False)

    t_xla, l_xla = run(xla_gathered_ce, "xla")
    t_pal, l_pal = run(pallas_fn, "pallas")
    if isinstance(l_xla, float) and isinstance(l_pal, float):
        assert abs(l_xla - l_pal) < 1e-3 * max(1.0, abs(l_xla)), (l_xla, l_pal)
    return t_xla, t_pal, l_xla, l_pal


def main():
    B = int(os.environ.get("CE_B", 256))
    L = int(os.environ.get("CE_L", 20))
    D = int(os.environ.get("CE_D", 512))
    ws = [int(w) for w in os.environ.get("CE_WS", "1,2,4,8,16").split(",")]
    print(f"# gathered-CE crossover, B={B} L={L} D={D} "
          f"(rows M={B*L}, width N=W*{B*(L+1)}) on {jax.devices()[0].platform}")
    print(f"{'W':>3} {'width':>8} {'xla ms':>9} {'pallas ms':>10} {'winner':>8}")
    for W in ws:
        t_xla, t_pal, lx, lp = bench_one(W, B, L, D)
        sx = f"{t_xla:9.2f}" if t_xla is not None else f"{lx:>9}"
        sp = f"{t_pal:10.2f}" if t_pal is not None else f"{lp:>10}"
        win = ("pallas" if (t_xla is None or
                            (t_pal is not None and t_pal < t_xla))
               else "xla")
        print(f"{W:>3} {W*B*(L+1):>8} {sx} {sp} {win:>8}")


if __name__ == "__main__":
    main()
