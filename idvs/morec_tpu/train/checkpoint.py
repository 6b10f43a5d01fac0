"""Checkpoint save/restore with reference-compatible semantics.

Reference (data_utils/utils.py:107-114, run.py:130-145):
- file `epoch-{N}.pt` inside `checkpoint_<label>/cpt_<hparams>/`
- payload: model params, optimizer state, RNG streams, scaler state
- saved only on a new best valid Hit@10 (run.py:265-267)
- resume: epoch parsed from the filename, RNG restored

TPU edition: one msgpack file `epoch-{N}.ckpt` holding
{params, opt_state, dropout_rng (the JAX PRNG key = the rng_state slot),
 step, epoch, extra}. No host sampler state is stored: batchers are
purely (seed, epoch)-keyed, so resuming at epoch N regenerates the exact
data order deterministically. bf16 has no GradScaler; the 'scaler_state'
slot is kept as an empty dict for format compatibility.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp


def _needs_gather(x) -> bool:
    """True for arrays a single process cannot device_get — e.g. the
    --zero1_table AdamW moments stored sharded across a multi-process pod
    (train/state.py shard_table_opt_state). Fully-REPLICATED multi-host
    arrays read from the local replica without any collective."""
    return (isinstance(x, jax.Array) and not x.is_fully_addressable
            and not getattr(x, "is_fully_replicated", False))


_REPL_GATHER_CACHE: dict = {}


def _replicate_collective(x: jax.Array) -> jax.Array:
    """All-gather a sharded array to full replication over its own mesh (a
    GSPMD collective — every process of the mesh must call this). The
    jitted identity is cached per mesh so repeated saves don't re-trace
    per leaf."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = x.sharding.mesh
    key = id(mesh)
    fn = _REPL_GATHER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda a: a,
                     out_shardings=NamedSharding(mesh, PartitionSpec()))
        _REPL_GATHER_CACHE[key] = fn
    return fn(x)


def host_copy(tree):
    """device_get that survives cross-process-sharded leaves.

    On a multi-process pod, sharded leaves are first all-gathered (a
    collective: EVERY process must reach this call, even though only the
    coordinator writes the file). Single-process sharded arrays are fully
    addressable and take the plain device_get path."""
    return jax.tree.map(
        lambda x: jax.device_get(
            _replicate_collective(x) if _needs_gather(x) else x), tree)


def save_checkpoint(model_dir: str, epoch: int, state, extra: Optional[Dict] = None,
                    log=None) -> str:
    """Write epoch-{N}.ckpt. Call from ALL processes: the sharded-state
    gather inside is collective; only process 0 writes the file
    (rank-0-only save semantics, reference run.py:265-267)."""
    path = os.path.join(model_dir, f"epoch-{epoch}.ckpt")
    payload = {
        "params": flax.serialization.to_state_dict(host_copy(state.params)),
        "opt_state": flax.serialization.to_state_dict(host_copy(state.opt_state)),
        "dropout_rng": jax.device_get(state.dropout_rng),
        "step": jax.device_get(state.step),
        "epoch": epoch,
        "scaler_state": {},
        "extra": extra or {},
    }
    if jax.process_index() != 0:
        return path   # participated in the gather; rank 0 owns the write
    os.makedirs(model_dir, exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    if log:
        log.info(f"Model saved to {path}")
    return path


def load_checkpoint(path: str, state):
    """Restore into an existing (template) TrainState; returns (state, payload).

    Call from ALL processes on a pod: the template host copy gathers
    sharded leaves collectively (the --zero1_table moments — the same
    contract as save_checkpoint)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    template = {
        "params": host_copy(state.params),
        "opt_state": host_copy(state.opt_state),
    }
    restored = flax.serialization.from_state_dict(
        template,
        {"params": payload["params"], "opt_state": payload["opt_state"]})
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        dropout_rng=jnp.asarray(payload["dropout_rng"]),
        step=jnp.asarray(payload["step"]))
    return new_state, payload


def epoch_from_name(ckpt_name: str) -> int:
    # reference run.py:137: int(re.split(r'[._-]', name)[1])
    return int(re.split(r"[._-]", os.path.basename(ckpt_name))[1])


def get_checkpoint(directory: str, ckpt_name: str) -> Optional[str]:
    path = os.path.join(directory, ckpt_name)
    if os.path.exists(path):
        return path
    # reference command lines name checkpoints 'epoch-N.pt'
    # (test_*.py launchers); our files are the msgpack 'epoch-N.ckpt' twin
    if ckpt_name.endswith(".pt"):
        alt = os.path.join(directory, ckpt_name[:-3] + ".ckpt")
        if os.path.exists(alt):
            return alt
    return None


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.exists(directory) or not os.listdir(directory):
        return None
    cands = {}
    for x in os.listdir(directory):
        m = re.match(r"epoch-(\d+)\.ckpt$", x)
        if m:
            cands[int(m.group(1))] = x
    if not cands:
        return None
    return os.path.join(directory, cands[max(cands)])
