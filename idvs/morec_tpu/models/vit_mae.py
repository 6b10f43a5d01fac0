"""Flax ViT-MAE encoder — weight-compatible with HF ViTMAEModel checkpoints
(the reference's MAE tower, inbatch_sasrec_e2e_vision/model/encoders.py:7-21:
CLS of the last hidden state -> Linear -> GELU).

HF ViTMAE applies random patch masking (mask_ratio, default 0.75) in EVERY
forward — the reference keeps that behavior, so we implement the same
shuffle-by-noise masking; `noise` can be injected for determinism (tests) and
is otherwise drawn from the 'masking' rng collection. Position embeddings are
the fixed 2D sin-cos table (stored in checkpoints; regenerated here when no
checkpoint is grafted).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTMAEConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    mask_ratio: float = 0.75

    @classmethod
    def from_hf(cls, hf):
        return cls(image_size=hf.image_size, patch_size=hf.patch_size,
                   num_channels=hf.num_channels, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   layer_norm_eps=hf.layer_norm_eps,
                   hidden_dropout_prob=hf.hidden_dropout_prob,
                   attention_probs_dropout_prob=hf.attention_probs_dropout_prob,
                   mask_ratio=hf.mask_ratio)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def sincos_pos_embed(hidden: int, grid: int) -> np.ndarray:
    """2D sin-cos position embedding, (1, 1+grid^2, hidden), CLS row zero —
    the same table HF ViTMAE builds and stores."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    g = np.arange(grid, dtype=np.float32)
    gy, gx = np.meshgrid(g, g, indexing="ij")  # HF: grid[0]=x varies fastest
    emb = np.concatenate([_1d(hidden // 2, gx), _1d(hidden // 2, gy)], axis=1)
    emb = np.concatenate([np.zeros((1, hidden)), emb], axis=0)
    return emb[None].astype(np.float32)


class ViTLayer(nn.Module):
    cfg: ViTMAEConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        B, T, H = x.shape
        nh, dh = c.num_attention_heads, H // c.num_attention_heads
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm_before")(x)
        q = nn.Dense(H, name="query")(h).reshape(B, T, nh, dh)
        k = nn.Dense(H, name="key")(h).reshape(B, T, nh, dh)
        v = nn.Dense(H, name="value")(h).reshape(B, T, nh, dh)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) / (dh ** 0.5)
        p = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        p = nn.Dropout(c.attention_probs_dropout_prob,
                       deterministic=deterministic)(p)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, H)
        out = nn.Dense(H, name="attention_output")(out)
        out = nn.Dropout(c.hidden_dropout_prob, deterministic=deterministic)(out)
        x = x + out
        from .layers import pre_ln_mlp
        if deterministic:
            # eval/catalog-encode: the residual add rides the kernel
            # epilogue (measured +6-8%, PARITY r5); training keeps
            # fused_mlp(save_h) + XLA add
            return pre_ln_mlp(x, c.intermediate_size,
                              ln_name="layernorm_after",
                              fc1_name="intermediate", fc2_name="output",
                              eps=c.layer_norm_eps, residual=True)
        h = pre_ln_mlp(x, c.intermediate_size, ln_name="layernorm_after",
                       fc1_name="intermediate", fc2_name="output",
                       eps=c.layer_norm_eps)
        h = nn.Dropout(c.hidden_dropout_prob, deterministic=deterministic)(h)
        return x + h


class ViTMAEModel(nn.Module):
    """images NHWC -> last hidden state (B, 1+len_keep, H). CLS at index 0."""
    cfg: ViTMAEConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, noise=None):
        c = self.cfg
        B = x.shape[0]
        patches = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                          (c.patch_size, c.patch_size), padding=0,
                          name="patch_projection")(x)
        L = patches.shape[1] * patches.shape[2]
        patches = patches.reshape(B, L, c.hidden_size)

        pos = self.param("position_embeddings",
                         lambda _k, _s: jnp.asarray(
                             sincos_pos_embed(c.hidden_size,
                                              c.image_size // c.patch_size)),
                         (1, 1 + c.num_patches, c.hidden_size))
        patches = patches + pos[:, 1:]

        # random masking by argsorted noise (HF random_masking)
        len_keep = int(L * (1 - c.mask_ratio))
        if c.mask_ratio > 0.0:
            if noise is None:
                noise = jax.random.uniform(self.make_rng("masking"), (B, L))
            ids_shuffle = jnp.argsort(noise, axis=1)
            ids_keep = ids_shuffle[:, :len_keep]
            patches = jnp.take_along_axis(
                patches, ids_keep[:, :, None], axis=1)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, c.hidden_size))
        cls = cls + pos[:, :1]
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.hidden_size)),
                             patches], axis=1)
        for i in range(c.num_hidden_layers):
            h = ViTLayer(c, name=f"layer_{i}")(h, deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm")(h)


# --------------------------------------------------------------- conversion
def vit_mae_torch_param_order(cfg: ViTMAEConfig
                              ) -> List[Tuple[str, Optional[tuple]]]:
    order: List[Tuple[str, Optional[tuple]]] = [
        ("embeddings.cls_token", ("cls_token",)),
        ("embeddings.position_embeddings", ("position_embeddings",)),
        ("embeddings.patch_embeddings.projection.weight",
         ("patch_projection", "kernel")),
        ("embeddings.patch_embeddings.projection.bias",
         ("patch_projection", "bias")),
    ]
    for i in range(cfg.num_hidden_layers):
        t = f"encoder.layer.{i}."
        f = f"layer_{i}"
        order += [
            (t + "attention.attention.query.weight", (f, "query", "kernel")),
            (t + "attention.attention.query.bias", (f, "query", "bias")),
            (t + "attention.attention.key.weight", (f, "key", "kernel")),
            (t + "attention.attention.key.bias", (f, "key", "bias")),
            (t + "attention.attention.value.weight", (f, "value", "kernel")),
            (t + "attention.attention.value.bias", (f, "value", "bias")),
            (t + "attention.output.dense.weight",
             (f, "attention_output", "kernel")),
            (t + "attention.output.dense.bias", (f, "attention_output", "bias")),
            (t + "intermediate.dense.weight", (f, "intermediate", "kernel")),
            (t + "intermediate.dense.bias", (f, "intermediate", "bias")),
            (t + "output.dense.weight", (f, "output", "kernel")),
            (t + "output.dense.bias", (f, "output", "bias")),
            (t + "layernorm_before.weight", (f, "layernorm_before", "scale")),
            (t + "layernorm_before.bias", (f, "layernorm_before", "bias")),
            (t + "layernorm_after.weight", (f, "layernorm_after", "scale")),
            (t + "layernorm_after.bias", (f, "layernorm_after", "bias")),
        ]
    order += [("layernorm.weight", ("layernorm", "scale")),
              ("layernorm.bias", ("layernorm", "bias"))]
    return order


def convert_vit_mae_state_dict(sd: Dict[str, np.ndarray],
                               cfg: ViTMAEConfig) -> Dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.startswith("vit.") for k in sd):
        sd = {k[4:] if k.startswith("vit.") else k: v for k, v in sd.items()}
    out: Dict = {}

    def put(path, v):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(v, np.float32)

    for tname, fpath in vit_mae_torch_param_order(cfg):
        if fpath is None or tname not in sd:
            if fpath is None:
                continue
            raise KeyError(f"missing checkpoint tensor: {tname}")
        v = sd[tname]
        if fpath[-1] == "kernel":
            v = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v.T
        put(fpath, np.ascontiguousarray(v))
    return out


def vit_mae_frozen_paths(cfg: ViTMAEConfig, freeze_before: int,
                         prefix: Tuple[str, ...] = ()) -> set:
    frozen = set()
    for idx, (_t, fpath) in enumerate(vit_mae_torch_param_order(cfg)):
        if idx < freeze_before and fpath is not None:
            frozen.add(prefix + fpath)
    return frozen
