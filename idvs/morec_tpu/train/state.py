"""Train state + optimizer assembly.

Reference semantics reproduced (inbatch_sasrec_e2e_text/run.py:150-191):
- two AdamW parameter groups: modality-encoder params at
  (fine_tune_lr, fine_tune_l2_weight), everything else at (lr, l2_weight)
- frozen params (HF encoder index < freeze_paras_before, plus pooler) get NO
  updates — torch uses requires_grad=False + DDP find_unused_parameters; here
  it's an optax.multi_transform partition with set_to_zero, which also stops
  AdamW weight-decay on frozen leaves (torch never decays grad-less params)
- plain single-group AdamW for IDRec (run.py:191)
- torch AdamW defaults: b1=0.9 b2=0.999 eps=1e-8, decoupled weight decay
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

ENCODER_LABEL = "encoder"
RECSYS_LABEL = "recsys"
FROZEN_LABEL = "frozen"


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    dropout_rng: jax.Array


def param_labels(params,
                 is_encoder_path: Callable[[tuple], bool],
                 frozen_paths: Optional[set] = None) -> Any:
    """Label every leaf encoder/recsys/frozen by its key path.

    is_encoder_path: predicate on the tuple of str keys from the root.
    frozen_paths: set of path-tuples to freeze (encoder freeze mask).
    """
    frozen_paths = frozen_paths or set()

    def label(path, _leaf):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        if keys in frozen_paths:
            return FROZEN_LABEL
        return ENCODER_LABEL if is_encoder_path(keys) else RECSYS_LABEL

    return jax.tree_util.tree_map_with_path(label, params)


def default_encoder_predicate(keys: tuple) -> bool:
    """The reference splits on 'bert_model' in the param name (run.py:153-158):
    ONLY the pretrained LM/CV net itself is in the fine-tune group; the
    projection fc over it counts as recsys. Our modal towers nest the
    pretrained net under <'encoder', ..., 'net'>.

    The vision variants additionally route the REPLACED heads to the recsys
    group even though they live inside image_net (inbatch_sasrec_e2e_vision/
    run.py:125-129: `'fc' in name or 'classifier' in name -> recsys_params`)
    — our ResNet keeps the replaced fc inside 'net' (resnet.py out_dim), so
    exclude those exact module names here. (Swin/MAE replaced heads already
    live outside 'net'; HF-internal FFN denses are 'fc1'/'fc2', not 'fc'.)"""
    return ("encoder" in keys and "net" in keys
            and "fc" not in keys and "classifier" not in keys)


def make_optimizer(cfg, labels=None) -> optax.GradientTransformation:
    adamw = lambda lr, wd: optax.adamw(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    if labels is None:
        # IDRec: one group (run.py:191)
        return adamw(cfg.lr, cfg.l2_weight)
    return optax.multi_transform(
        {
            ENCODER_LABEL: adamw(cfg.fine_tune_lr, cfg.fine_tune_l2_weight),
            RECSYS_LABEL: adamw(cfg.lr, cfg.l2_weight),
            FROZEN_LABEL: optax.set_to_zero(),
        },
        labels)


def count_params(params) -> Dict[str, int]:
    total = sum(x.size for x in jax.tree.leaves(params))
    return {"total": int(total)}


# --------------------------------------------------------------- ZeRO-1 table
# The dense AdamW pass over the (item_num+1, D) embedding table is the
# measured IDRec floor (~2.1 ms/step at 100k x 512 on one v5e chip: read
# g,m,v,p + write m,v,p = 7 HBM passes, PARITY.md "IDRec bound"). On a mesh
# the math is row-separable, so the moments are stored SHARDED P('data') and
# GSPMD partitions the update: each chip reads/writes only its row block and
# the updated params are all-gathered once — bit-identical elementwise math,
# n_chips x less moment traffic and memory (ZeRO stage 1, applied to the one
# tensor that dominates; the reference's torch AdamW is fully replicated,
# inbatch_sasrec_e2e_text/run.py:191).

ZERO1_MIN_ROWS = 4096   # don't bother sharding tiny tables


def _zero1_spec(path, leaf, n_shards):
    """PartitionSpec for an embedding-table moment leaf, or None.

    Stored jax.Arrays need even shard sizes, so shard rows when the row
    count divides the mesh, else columns (embedding_dim is a power-of-two
    multiple in every reference config; the flagship IDRec table is
    100001 x 512 — column-sharded on an 8-chip mesh)."""
    keys = {getattr(p, "key", getattr(p, "idx", None)) for p in path}
    if not (hasattr(leaf, "ndim") and leaf.ndim == 2
            and leaf.shape[0] >= ZERO1_MIN_ROWS
            and ({"id_embedding", "user_embedding"} & keys)):
        return None
    from jax.sharding import PartitionSpec as P

    if leaf.shape[0] % n_shards == 0:
        return P("data", None)
    if leaf.shape[1] % n_shards == 0:
        return P(None, "data")
    return None


def shard_table_opt_state(opt_state, mesh):
    """Place the embedding-table moment leaves of an optax state sharded
    over the mesh (rows when divisible, else columns). Everything else stays
    replicated. No-op on 1-device meshes."""
    from jax.sharding import NamedSharding

    W = int(mesh.devices.size)
    if W <= 1:
        return opt_state

    def place(path, leaf):
        spec = _zero1_spec(path, leaf, W)
        if spec is not None:
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return leaf

    return jax.tree_util.tree_map_with_path(place, opt_state)


def constrain_params_replicated(params, mesh):
    """Force the updated table params back to full replication — this is the
    ZeRO-1 all-gather, placed explicitly at the end of the step so the next
    step's forward (and the shard_map entry) sees replicated params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    W = int(mesh.devices.size)
    full = NamedSharding(mesh, P())

    def constrain(path, leaf):
        if _zero1_spec(path, leaf, W) is not None:
            return jax.lax.with_sharding_constraint(leaf, full)
        return leaf

    return jax.tree_util.tree_map_with_path(constrain, params)


def constrain_table_opt_state(opt_state, mesh):
    """In-jit sharding constraints keeping the table moments sharded across
    steps (XLA would otherwise be free to re-replicate them)."""
    from jax.sharding import NamedSharding

    W = int(mesh.devices.size)

    def constrain(path, leaf):
        spec = _zero1_spec(path, leaf, W)
        if spec is not None:
            return jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, spec))
        return leaf

    return jax.tree_util.tree_map_with_path(constrain, opt_state)
