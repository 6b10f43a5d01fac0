"""Flax OPT decoder — weight-compatible with HF OPTModel checkpoints
(the reference's OPT text tower, inbatch_sasrec_e2e_text/run.py:41-47, pooled
by masked mean via Text_Encoder_mean, model/encoders.py:31-50).

Implements the 125m-class geometry (do_layer_norm_before=True, no
word_embed_proj): embeddings + learned positions (offset 2, cumsum-of-mask
positions), pre-LN decoder blocks with ReLU FFN, final LayerNorm. Causal +
padding additive mask.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 2048
    dropout: float = 0.1
    attention_dropout: float = 0.0
    pad_token_id: int = 1
    position_offset: int = 2

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   ffn_dim=hf.ffn_dim,
                   max_position_embeddings=hf.max_position_embeddings,
                   dropout=hf.dropout, attention_dropout=hf.attention_dropout,
                   pad_token_id=hf.pad_token_id)


class OPTAttention(nn.Module):
    cfg: OPTConfig

    @nn.compact
    def __call__(self, hidden, att_bias, deterministic: bool = True):
        c = self.cfg
        B, T, H = hidden.shape
        nh, dh = c.num_attention_heads, H // c.num_attention_heads
        # HF scales the query before the matmul
        q = nn.Dense(H, name="q_proj")(hidden) * (dh ** -0.5)
        k = nn.Dense(H, name="k_proj")(hidden)
        v = nn.Dense(H, name="v_proj")(hidden)
        q = q.reshape(B, T, nh, dh); k = k.reshape(B, T, nh, dh)
        v = v.reshape(B, T, nh, dh)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + att_bias
        p = jax.nn.softmax(attn, axis=-1).astype(hidden.dtype)
        p = nn.Dropout(c.attention_dropout, deterministic=deterministic)(p)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, H)
        return nn.Dense(H, name="out_proj")(out)


class OPTLayer(nn.Module):
    cfg: OPTConfig

    @nn.compact
    def __call__(self, hidden, att_bias, deterministic: bool = True):
        c = self.cfg
        residual = hidden
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(hidden)  # pre-LN
        h = OPTAttention(c, name="self_attn")(h, att_bias, deterministic)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        hidden = residual + h
        residual = hidden
        # pre-LN ReLU FFN via the shared pre_ln_mlp helper (fused Pallas
        # edition on TPU, LN absorbed; same param tree via
        # LNParams/ProjParams). On the deterministic path the residual add
        # rides the kernel epilogue (layers.py residual docstring — honors
        # IDVS_NO_PRELN_RES like the other pre-LN towers).
        from .layers import pre_ln_mlp
        if deterministic:
            return pre_ln_mlp(hidden, c.ffn_dim,
                              ln_name="final_layer_norm", fc1_name="fc1",
                              fc2_name="fc2", eps=1e-5, act="relu",
                              residual=True)
        h = pre_ln_mlp(hidden, c.ffn_dim, ln_name="final_layer_norm",
                       fc1_name="fc1", fc2_name="fc2", eps=1e-5,
                       act="relu")
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        return residual + h


class OPTModel(nn.Module):
    cfg: OPTConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        B, T = input_ids.shape
        from .bert import pick_embed
        WordEmbed = pick_embed(c.vocab_size, c.hidden_size)
        word = WordEmbed(c.vocab_size, c.hidden_size, name="embed_tokens")
        # OPT positions are data-dependent (cumsum of the mask) — no
        # broadcast reformulation; the table is small so the XLA scatter
        # backward stays
        pos = nn.Embed(c.max_position_embeddings + c.position_offset,
                       c.hidden_size, name="embed_positions")
        mask = attention_mask.astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask - 1  # HF OPT positions
        positions = jnp.maximum(positions, 0) + c.position_offset
        h = word(input_ids) + pos(positions)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)

        pad_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        causal = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e9)
        att_bias = pad_bias + causal[None, None]
        for i in range(c.num_hidden_layers):
            h = OPTLayer(c, name=f"layer_{i}")(h, att_bias, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(h)


def opt_torch_param_order(num_layers: int) -> List[Tuple[str, Optional[Tuple[str, ...]]]]:
    """torch OPTModel.named_parameters() order -> flax paths.

    OPTDecoder module order: embed_tokens, embed_positions, final_layer_norm,
    then layers[i]: self_attn(k,v,q,out), self_attn_layer_norm, fc1, fc2,
    final_layer_norm."""
    order: List[Tuple[str, Optional[Tuple[str, ...]]]] = [
        ("decoder.embed_tokens.weight", ("embed_tokens", "embedding")),
        ("decoder.embed_positions.weight", ("embed_positions", "embedding")),
        ("decoder.final_layer_norm.weight", ("final_layer_norm", "scale")),
        ("decoder.final_layer_norm.bias", ("final_layer_norm", "bias")),
    ]
    for i in range(num_layers):
        L = f"layer_{i}"
        t = f"decoder.layers.{i}."
        order += [
            (t + "self_attn.k_proj.weight", (L, "self_attn", "k_proj", "kernel")),
            (t + "self_attn.k_proj.bias",   (L, "self_attn", "k_proj", "bias")),
            (t + "self_attn.v_proj.weight", (L, "self_attn", "v_proj", "kernel")),
            (t + "self_attn.v_proj.bias",   (L, "self_attn", "v_proj", "bias")),
            (t + "self_attn.q_proj.weight", (L, "self_attn", "q_proj", "kernel")),
            (t + "self_attn.q_proj.bias",   (L, "self_attn", "q_proj", "bias")),
            (t + "self_attn.out_proj.weight", (L, "self_attn", "out_proj", "kernel")),
            (t + "self_attn.out_proj.bias",   (L, "self_attn", "out_proj", "bias")),
            (t + "self_attn_layer_norm.weight", (L, "self_attn_layer_norm", "scale")),
            (t + "self_attn_layer_norm.bias",   (L, "self_attn_layer_norm", "bias")),
            (t + "fc1.weight", (L, "fc1", "kernel")),
            (t + "fc1.bias",   (L, "fc1", "bias")),
            (t + "fc2.weight", (L, "fc2", "kernel")),
            (t + "fc2.bias",   (L, "fc2", "bias")),
            (t + "final_layer_norm.weight", (L, "final_layer_norm", "scale")),
            (t + "final_layer_norm.bias",   (L, "final_layer_norm", "bias")),
        ]
    return order


def convert_opt_state_dict(state_dict: Dict[str, np.ndarray],
                           num_layers: int) -> Dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {}

    def put(path, value):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    for torch_name, flax_path in opt_torch_param_order(num_layers):
        if flax_path is None:
            continue
        if torch_name not in sd:
            alt = "model." + torch_name
            if alt in sd:
                torch_name = alt
            else:
                raise KeyError(f"missing checkpoint tensor: {torch_name}")
        v = sd[torch_name]
        if flax_path[-1] == "kernel":
            v = np.ascontiguousarray(np.asarray(v).T)
        put(flax_path, np.asarray(v, np.float32))
    return out


def opt_frozen_paths(num_layers: int, freeze_before: int,
                     prefix: Tuple[str, ...] = ()) -> Set[Tuple[str, ...]]:
    frozen = set()
    for idx, (_n, flax_path) in enumerate(opt_torch_param_order(num_layers)):
        if flax_path is None:
            continue
        if idx < freeze_before:
            frozen.add(prefix + flax_path)
    return frozen
