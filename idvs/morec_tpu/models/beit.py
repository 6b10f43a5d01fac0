"""Flax BEiT encoder — weight-compatible with HF BeitModel checkpoints
(the reference imports BeitForImageClassification and dispatches 'beit'
through its Vit_Encoder wrapper, inbatch_sasrec_e2e_vision/run.py:6,
model/model.py:24-29: classifier replaced by Linear(embedding_dim)).

Implements the fine-tuned-checkpoint geometry: patch embed + CLS (no absolute
positions), pre-LN blocks with per-layer relative position bias and
LayerScale (lambda_1/lambda_2), mean-pooled LayerNorm head (BeitPooler with
use_mean_pooling=True).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BeitConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    use_relative_position_bias: bool = True
    layer_scale_init_value: float = 0.1
    use_mean_pooling: bool = True

    @classmethod
    def from_hf(cls, hf):
        return cls(image_size=hf.image_size, patch_size=hf.patch_size,
                   num_channels=hf.num_channels, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   layer_norm_eps=hf.layer_norm_eps,
                   use_relative_position_bias=hf.use_relative_position_bias,
                   layer_scale_init_value=hf.layer_scale_init_value,
                   use_mean_pooling=hf.use_mean_pooling)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def _beit_rel_pos_index(grid: int) -> np.ndarray:
    """(1+g^2, 1+g^2) index into the ((2g-1)^2+3, nH) bias table —
    HF BeitRelativePositionBias semantics (3 extra slots for cls<->token)."""
    n = grid * grid
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += grid - 1
    rel[..., 1] += grid - 1
    rel[..., 0] *= 2 * grid - 1
    idx = np.zeros((n + 1, n + 1), dtype=np.int64)
    idx[1:, 1:] = rel.sum(-1)
    num_rel = (2 * grid - 1) ** 2
    idx[0, 0:] = num_rel      # cls -> token
    idx[0:, 0] = num_rel + 1  # token -> cls
    idx[0, 0] = num_rel + 2   # cls -> cls
    return idx


class BeitLayer(nn.Module):
    cfg: BeitConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        B, T, H = x.shape
        nh, dh = c.num_attention_heads, H // c.num_attention_heads
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm_before")(x)
        # HF BeitSelfAttention: query/value biased, key bias-less
        q = nn.Dense(H, name="query")(h).reshape(B, T, nh, dh)
        k = nn.Dense(H, use_bias=False, name="key")(h).reshape(B, T, nh, dh)
        v = nn.Dense(H, name="value")(h).reshape(B, T, nh, dh)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) / (dh ** 0.5)
        if c.use_relative_position_bias:
            num_rel = (2 * c.grid - 1) ** 2 + 3
            table = self.param("relative_position_bias_table",
                               nn.initializers.zeros, (num_rel, nh))
            idx = jnp.asarray(_beit_rel_pos_index(c.grid).reshape(-1))
            bias = table[idx].reshape(T, T, nh).transpose(2, 0, 1)
            attn = attn + bias[None]
        p = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, H)
        out = nn.Dense(H, name="attention_output")(out)
        lam1 = self.param("lambda_1",
                          nn.initializers.constant(c.layer_scale_init_value),
                          (H,))
        x = x + lam1 * out
        from .layers import pre_ln_mlp
        h = pre_ln_mlp(x, c.intermediate_size, ln_name="layernorm_after",
                       fc1_name="intermediate", fc2_name="output",
                       eps=c.layer_norm_eps)
        lam2 = self.param("lambda_2",
                          nn.initializers.constant(c.layer_scale_init_value),
                          (H,))
        return x + lam2 * h


class BeitModel(nn.Module):
    """images NHWC -> pooled (B, H): mean of patch tokens -> LayerNorm
    (BeitPooler, use_mean_pooling=True)."""
    cfg: BeitConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        B = x.shape[0]
        patches = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                          (c.patch_size, c.patch_size), padding=0,
                          name="patch_projection")(x)
        patches = patches.reshape(B, -1, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.hidden_size))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.hidden_size)), patches], axis=1)
        for i in range(c.num_hidden_layers):
            h = BeitLayer(c, name=f"layer_{i}")(h, deterministic)
        # pooler: LN over mean of PATCH tokens (cls excluded)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="pooler_ln")(
            h[:, 1:].mean(axis=1))


def beit_torch_param_order(cfg: BeitConfig) -> List[Tuple[str, Optional[tuple]]]:
    order: List[Tuple[str, Optional[tuple]]] = [
        ("embeddings.cls_token", ("cls_token",)),
        ("embeddings.patch_embeddings.projection.weight",
         ("patch_projection", "kernel")),
        ("embeddings.patch_embeddings.projection.bias",
         ("patch_projection", "bias")),
    ]
    for i in range(cfg.num_hidden_layers):
        t = f"encoder.layer.{i}."
        f = f"layer_{i}"
        order += [
            (t + "lambda_1", (f, "lambda_1")),
            (t + "lambda_2", (f, "lambda_2")),
            (t + "attention.attention.query.weight", (f, "query", "kernel")),
            (t + "attention.attention.query.bias", (f, "query", "bias")),
            (t + "attention.attention.key.weight", (f, "key", "kernel")),
            (t + "attention.attention.value.weight", (f, "value", "kernel")),
            (t + "attention.attention.value.bias", (f, "value", "bias")),
            (t + "attention.attention.relative_position_bias.relative_position_bias_table",
             (f, "relative_position_bias_table")),
            (t + "attention.output.dense.weight", (f, "attention_output", "kernel")),
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
    order += [("pooler.layernorm.weight", ("pooler_ln", "scale")),
              ("pooler.layernorm.bias", ("pooler_ln", "bias"))]
    return order


def convert_beit_state_dict(sd: Dict[str, np.ndarray], cfg: BeitConfig) -> Dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.startswith("beit.") for k in sd):
        sd = {k[5:] if k.startswith("beit.") else k: v for k, v in sd.items()}
    out: Dict = {}

    def put(path, v):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(v, np.float32)

    for tname, fpath in beit_torch_param_order(cfg):
        if fpath is None:
            continue
        v = sd[tname]
        if fpath[-1] == "kernel":
            v = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v.T
        if fpath[-1] == "cls_token":
            pass
        put(fpath, np.ascontiguousarray(v))
    return out


def beit_frozen_paths(cfg: BeitConfig, freeze_before: int,
                      prefix: Tuple[str, ...] = ()) -> set:
    frozen = set()
    for idx, (_t, fpath) in enumerate(beit_torch_param_order(cfg)):
        if idx < freeze_before and fpath is not None:
            frozen.add(prefix + fpath)
    return frozen
