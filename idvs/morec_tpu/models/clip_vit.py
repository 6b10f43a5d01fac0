"""Flax CLIP vision encoder — weight-compatible with HF CLIPVisionModel
checkpoints (imported by the reference, inbatch_sasrec_e2e_vision/run.py:6;
exposed here as a first-class vision tower: pooled CLS output -> Linear ->
GELU like the other ViT-family towers).

Geometry: class embedding + bias-less patch conv + learned positions,
pre-LayerNorm ("pre_layrnorm" — sic, HF keeps the typo), pre-LN encoder
blocks with quick-GELU MLPs, post-LayerNorm over CLS as the pooled output.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf):
        return cls(image_size=hf.image_size, patch_size=hf.patch_size,
                   num_channels=hf.num_channels, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   layer_norm_eps=hf.layer_norm_eps)

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        B, T, H = x.shape
        nh, dh = c.num_attention_heads, H // c.num_attention_heads
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        q = nn.Dense(H, name="q_proj")(h) * (dh ** -0.5)
        k = nn.Dense(H, name="k_proj")(h)
        v = nn.Dense(H, name="v_proj")(h)
        q = q.reshape(B, T, nh, dh); k = k.reshape(B, T, nh, dh)
        v = v.reshape(B, T, nh, dh)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        p = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, H)
        out = nn.Dense(H, name="out_proj")(out)
        x = x + out
        from .layers import pre_ln_mlp
        # nothing sits between the MLP and the residual add in CLIP; the
        # add rides the kernel as an epilogue on the measured
        # (deterministic) path, training keeps fused_mlp + XLA add
        # (layers.py residual docstring)
        h = pre_ln_mlp(x, c.intermediate_size, ln_name="layer_norm2",
                       fc1_name="fc1", fc2_name="fc2",
                       eps=c.layer_norm_eps, act="quick_gelu",
                       residual=deterministic)
        return h if deterministic else x + h


class CLIPVisionModel(nn.Module):
    """images NHWC -> pooled (B, H) = post-LN CLS."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        B = x.shape[0]
        patches = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                          (c.patch_size, c.patch_size), padding=0,
                          use_bias=False, name="patch_projection")(x)
        patches = patches.reshape(B, -1, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, c.hidden_size)),
             patches], axis=1)
        pos = nn.Embed(c.num_positions, c.hidden_size,
                       name="position_embedding")
        h = h + pos(jnp.arange(h.shape[1]))[None]
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layrnorm")(h)
        for i in range(c.num_hidden_layers):
            h = CLIPLayer(c, name=f"layer_{i}")(h, deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="post_layernorm")(h[:, 0])


def clip_torch_param_order(cfg: CLIPVisionConfig
                           ) -> List[Tuple[str, Optional[tuple]]]:
    P = "vision_model."
    order: List[Tuple[str, Optional[tuple]]] = [
        (P + "embeddings.class_embedding", ("class_embedding",)),
        (P + "embeddings.patch_embedding.weight", ("patch_projection", "kernel")),
        (P + "embeddings.position_embedding.weight",
         ("position_embedding", "embedding")),
        (P + "pre_layrnorm.weight", ("pre_layrnorm", "scale")),
        (P + "pre_layrnorm.bias", ("pre_layrnorm", "bias")),
    ]
    for i in range(cfg.num_hidden_layers):
        t = P + f"encoder.layers.{i}."
        f = f"layer_{i}"
        order += [
            (t + "self_attn.k_proj.weight", (f, "k_proj", "kernel")),
            (t + "self_attn.k_proj.bias", (f, "k_proj", "bias")),
            (t + "self_attn.v_proj.weight", (f, "v_proj", "kernel")),
            (t + "self_attn.v_proj.bias", (f, "v_proj", "bias")),
            (t + "self_attn.q_proj.weight", (f, "q_proj", "kernel")),
            (t + "self_attn.q_proj.bias", (f, "q_proj", "bias")),
            (t + "self_attn.out_proj.weight", (f, "out_proj", "kernel")),
            (t + "self_attn.out_proj.bias", (f, "out_proj", "bias")),
            (t + "layer_norm1.weight", (f, "layer_norm1", "scale")),
            (t + "layer_norm1.bias", (f, "layer_norm1", "bias")),
            (t + "mlp.fc1.weight", (f, "fc1", "kernel")),
            (t + "mlp.fc1.bias", (f, "fc1", "bias")),
            (t + "mlp.fc2.weight", (f, "fc2", "kernel")),
            (t + "mlp.fc2.bias", (f, "fc2", "bias")),
            (t + "layer_norm2.weight", (f, "layer_norm2", "scale")),
            (t + "layer_norm2.bias", (f, "layer_norm2", "bias")),
        ]
    order += [(P + "post_layernorm.weight", ("post_layernorm", "scale")),
              (P + "post_layernorm.bias", ("post_layernorm", "bias"))]
    return order


def convert_clip_state_dict(sd: Dict[str, np.ndarray],
                            cfg: CLIPVisionConfig) -> Dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out: Dict = {}

    def put(path, v):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(v, np.float32)

    for tname, fpath in clip_torch_param_order(cfg):
        if fpath is None:
            continue
        v = sd[tname]
        if fpath[-1] == "kernel":
            v = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v.T
        put(fpath, np.ascontiguousarray(v))
    return out


def clip_frozen_paths(cfg: CLIPVisionConfig, freeze_before: int,
                      prefix: Tuple[str, ...] = ()) -> set:
    frozen = set()
    for idx, (_t, fpath) in enumerate(clip_torch_param_order(cfg)):
        if idx < freeze_before and fpath is not None:
            frozen.add(prefix + fpath)
    return frozen
