"""Device mesh + sharding helpers.

The reference's parallelism is single-node data parallelism over NCCL
(torch.distributed.launch, one process per GPU; inbatch_sasrec_e2e_text/run.py:321,
train_bert_base.py:40-41). TPU-native equivalent: ONE process, a
jax.sharding.Mesh over all chips with a 'data' axis, batches sharded over it,
parameters replicated; gradient psum rides ICI inside the shard_mapped step.
Models here are small (<= BERT-large), so no parameter sharding is needed for
parity — the mesh is built 1-axis but the step code only names the 'data'
axis, leaving room for a model axis later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place host numpy batch arrays sharded along their leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
