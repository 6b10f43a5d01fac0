"""Device mesh + sharding helpers (single-process and multi-host).

The reference's parallelism is single-node data parallelism over NCCL
(torch.distributed.launch, one process per GPU; inbatch_sasrec_e2e_text/run.py:321,
train_bert_base.py:40-41). TPU-native equivalent: one process PER HOST, a
jax.sharding.Mesh over all chips with a 'data' axis, batches sharded over it,
parameters replicated; gradient psum rides ICI inside the shard_mapped step.
Models here are small (<= BERT-large), so no parameter sharding is needed for
parity — the mesh is built 1-axis but the step code only names the 'data'
axis, leaving room for a model axis later.

Multi-host (--distributed): jax.distributed.initialize() wires the processes
together (SURVEY §2b row 1 — the reference's torch.distributed.launch
equivalent); every process computes the SAME (seed, epoch)-keyed global
permutation, slices its own contiguous row range (host_rows), and assembles
the global sharded batch with jax.make_array_from_process_local_data.
Logging/checkpointing stay on process 0 (the reference's rank-0 gating,
run.py:265-267).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(cfg) -> None:
    """jax.distributed.initialize() behind the --distributed flag.

    With no explicit coordinator/process flags, JAX auto-detects the cluster
    (TPU pod metadata). Explicit values support manual launches.
    """
    if not getattr(cfg, "distributed", False):
        return
    kwargs = {}
    if cfg.coordinator_address:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes > 0:
        kwargs["num_processes"] = cfg.num_processes
    if cfg.process_id >= 0:
        kwargs["process_id"] = cfg.process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def host_rows(global_n: int, process_index: Optional[int] = None,
              process_count: Optional[int] = None) -> slice:
    """This process's contiguous row range of a global batch.

    The 'data' mesh axis enumerates jax.devices() (process-major order), so
    process p owns rows [p*per, (p+1)*per) of a (global_n, ...) batch whose
    leading axis is sharded P('data'). global_n must divide evenly — batchers
    only emit static full batches.
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    assert global_n % pc == 0, (global_n, pc)
    per = global_n // pc
    return slice(pi * per, (pi + 1) * per)


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place host numpy batch arrays sharded along their leading axis.

    Multi-host: every process passes the identical GLOBAL array (same
    (seed, epoch) permutation); only the local row slice is shipped to the
    local devices."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        local = x[host_rows(x.shape[0])]
        return jax.make_array_from_process_local_data(sharding, local, x.shape)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), np.shape(x)), tree)


def is_coordinator() -> bool:
    """Process-0 gate for logging/checkpointing (reference rank-0 gating)."""
    return jax.process_index() == 0
