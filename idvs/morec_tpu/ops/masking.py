"""Mask construction, fully vectorized and jit-safe (static shapes).

Replaces two reference hot spots:
- causal attention mask         (inbatch_sasrec_e2e_text/model/encoders.py:23-28)
- O(B^2 L^2) Python rejection-mask double loop in the in-batch CE loss
                                (inbatch_sasrec_e2e_text/model/model.py:55-63)
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9
MASK_VAL = -1e4  # the reference masks logits to -1e4, not -inf (model.py:52,63)


def causal_additive_mask(log_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) 0/1 validity mask -> (B, 1, L, L) additive mask in {0, -1e9}.

    mask[b, 0, q, k] = 0 iff k <= q AND log_mask[b, k] != 0, else -1e9
    — exactly tril(expand(log_mask != 0)) of the reference
    (encoders.py:24-27). Note the reference keys validity on the KEY position
    only; query-row validity is handled by the loss's row selection.
    """
    B, L = log_mask.shape
    key_valid = (log_mask != 0)[:, None, None, :]          # (B, 1, 1, L)
    tri = jnp.tril(jnp.ones((L, L), dtype=bool))[None, None]  # (1, 1, L, L)
    keep = jnp.logical_and(key_valid, tri)
    return jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)


def inbatch_rejection_mask(item_ids: jnp.ndarray) -> jnp.ndarray:
    """Same-user rejection mask for in-batch CE, O(B^2 L) device-side.

    item_ids: (B, S) with S = L+1, the padded per-user item ids.
    Returns reject (B, B*S) bool: reject[i, c] = True iff the item id of
    flattened column c appears ANYWHERE in user i's id list (including the
    0-padding ids — faithful to the reference, model.py:55-60, where
    reject_list is the full padded row).

    The diagonal label exemption (model.py:61-62) is applied separately in
    the loss, since it depends on the row index j.
    """
    B, S = item_ids.shape
    flat = item_ids.reshape(-1)                             # (B*S,)
    # (B, S, 1) vs (1, 1, B*S) -> any over own-seq axis
    eq = item_ids[:, :, None] == flat[None, None, :]
    return jnp.any(eq, axis=1)                              # (B, B*S)


def label_columns(B: int, L: int) -> jnp.ndarray:
    """CE label column index for row (i, j): i*(L+1) + j + 1 (model.py:46-47)."""
    return (jnp.arange(B) * (L + 1))[:, None] + jnp.arange(1, L + 1)[None, :]
