"""Flax DeBERTa (v1) encoder — weight-compatible with HF DebertaModel
checkpoints. The reference imports DebertaTokenizer/DebertaModel in every
text variant (inbatch_sasrec_e2e_text/run.py:8) but its bert_model_load
dispatch can never select them; supported here as an extension, completing
the reference's import list.

Implements the deberta-base geometry exactly (HF modeling_deberta.py):

- embeddings: word table only (position_biased_input=False in every v1
  checkpoint; token_type table only if type_vocab_size>0; embed_proj only
  if embedding_size != hidden_size), LayerNorm, then the embedding rows of
  PADDED tokens are zeroed (`embeddings * mask` — DebertaEmbeddings), then
  dropout.
- disentangled self-attention per layer: one bias-free in_proj -> q,k,v
  with learned q_bias/v_bias added; scale = sqrt(dh * (1+|pos_att_type|));
  score(i,j) = (q_i/scale)·k_j                              (c2c)
             + (q_i/scale)·pos_k[D(i,j)]                     (c2p)
             + k_j·(pos_q/scale)[D(i,j)]                     (p2c)
  with D(i,j) = clamp(i-j+span, 0, 2*span-1) indexing the shared relative-
  position table slice rel_emb[max_rel-span : max_rel+span] (span = T for
  T < max_relative_positions; both gathers reduce to the SAME bucket
  matrix in the square self-attention case — verified against the HF
  gather/transpose formulation). pos_k = pos_proj(rel) (no bias), pos_q =
  pos_q_proj(rel) (with bias); rel rows get hidden-dropout per layer.
- pairwise mask m_i*m_j, masked to finfo.min; post-LN residual blocks with
  exact-GELU FFN (BERT-shaped — the fused Pallas FFN applies on TPU).

All relative-position index matrices are trace-time numpy constants
(static T), so the jitted program is pure dense matmuls + one
take_along_axis per bias term.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import ProjParams


@dataclasses.dataclass(frozen=True)
class DebertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    max_relative_positions: int = -1     # -1 -> max_position_embeddings
    type_vocab_size: int = 0
    layer_norm_eps: float = 1e-7
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pos_att_type: Tuple[str, ...] = ("c2p", "p2c")
    pad_token_id: int = 0
    # None = auto: fused Pallas FFN on TPU (the FFN block is BERT-shaped)
    fused_ffn: bool = None

    @classmethod
    def from_hf(cls, hf) -> "DebertaConfig":
        assert getattr(hf, "embedding_size", hf.hidden_size) == hf.hidden_size
        assert not getattr(hf, "position_biased_input", False), \
            "position_biased_input deberta variants not ported (no v1 " \
            "checkpoint uses it)"
        assert not getattr(hf, "talking_head", False)
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   max_position_embeddings=hf.max_position_embeddings,
                   max_relative_positions=getattr(
                       hf, "max_relative_positions", -1),
                   type_vocab_size=hf.type_vocab_size,
                   layer_norm_eps=hf.layer_norm_eps,
                   hidden_dropout_prob=hf.hidden_dropout_prob,
                   attention_probs_dropout_prob=hf.attention_probs_dropout_prob,
                   pos_att_type=tuple(hf.pos_att_type or ()),
                   pad_token_id=getattr(hf, "pad_token_id", 0) or 0)

    @property
    def max_rel(self) -> int:
        return (self.max_relative_positions
                if self.max_relative_positions > 0
                else self.max_position_embeddings)


class DisentangledSelfAttention(nn.Module):
    cfg: DebertaConfig

    @nn.compact
    def __call__(self, hidden, pair_mask, rel_emb, deterministic=True):
        c = self.cfg
        B, T, H = hidden.shape
        nh = c.num_attention_heads
        dh = H // nh
        f32 = jnp.float32
        w_in = self.param("in_proj", nn.initializers.normal(0.02),
                          (H, 3 * H)).astype(hidden.dtype)
        q_bias = self.param("q_bias", nn.initializers.zeros_init(), (H,))
        v_bias = self.param("v_bias", nn.initializers.zeros_init(), (H,))
        qkv = jnp.dot(hidden, w_in)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias.astype(q.dtype)
        v = v + v_bias.astype(v.dtype)

        scale_factor = 1 + len(c.pos_att_type)
        scale = float(np.sqrt(dh * scale_factor))
        qh = (q / scale).reshape(B, T, nh, dh)
        kh = k.reshape(B, T, nh, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=f32)

        if rel_emb is not None and c.pos_att_type:
            span = min(T, c.max_rel)
            rel = rel_emb[c.max_rel - span:c.max_rel + span]   # (2*span, H)
            # per-layer hidden-dropout on the shared table rows (HF
            # pos_dropout, independent draw per layer)
            rel = nn.Dropout(c.hidden_dropout_prob,
                             deterministic=deterministic)(rel)
            # D(i,j) = clamp(i-j+span, 0, 2*span-1): the c2p gather index,
            # and (after HF's gather-then-transpose) the p2c one too
            d = np.arange(T)[:, None] - np.arange(T)[None, :]
            D = jnp.asarray(np.clip(d + span, 0, 2 * span - 1))   # (T, T)
            if "c2p" in c.pos_att_type:
                w_pos = self.param("pos_proj", nn.initializers.normal(0.02),
                                   (H, H)).astype(hidden.dtype)
                pos_k = jnp.dot(rel, w_pos).reshape(2 * span, nh, dh)
                c2p = jnp.einsum("bqhd,phd->bhqp", qh, pos_k,
                                 preferred_element_type=f32)
                scores = scores + jnp.take_along_axis(
                    c2p, D[None, None], axis=-1)
            if "p2c" in c.pos_att_type:
                w_posq, b_posq = ProjParams(
                    H, H, name="pos_q_proj",
                    kernel_init=nn.initializers.normal(0.02))()
                pos_q = (jnp.dot(rel, w_posq.astype(rel.dtype))
                         + b_posq.astype(rel.dtype)) / scale
                pos_q = pos_q.reshape(2 * span, nh, dh)
                p2c = jnp.einsum("bkhd,phd->bhkp", kh, pos_q,
                                 preferred_element_type=f32)
                # p2c(i,j) = k_j . pos_q[D(i,j)]: gather D row-wise on the
                # key axis == HF's gather(p2c_pos) + transpose(-1,-2)
                scores = scores + jnp.take_along_axis(
                    p2c, D.T[None, None], axis=-1).transpose(0, 1, 3, 2)

        scores = jnp.where(pair_mask[:, None], scores,
                           jnp.finfo(f32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(hidden.dtype)
        probs = nn.Dropout(c.attention_probs_dropout_prob,
                           deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs,
                         v.reshape(B, T, nh, dh))
        return ctx.reshape(B, T, H)


class DebertaLayer(nn.Module):
    cfg: DebertaConfig

    @nn.compact
    def __call__(self, hidden, pair_mask, rel_emb, deterministic=True):
        c = self.cfg
        attn = DisentangledSelfAttention(c, name="attention_self")(
            hidden, pair_mask, rel_emb, deterministic)
        attn = nn.Dense(c.hidden_size, name="attention_output")(attn)
        attn = nn.Dropout(c.hidden_dropout_prob,
                          deterministic=deterministic)(attn)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="attention_ln")(hidden + attn)
        # BERT-shaped exact-GELU FFN -> the fused Pallas kernel on TPU
        from .layers import ProjParams as PP
        ki, bi = PP(c.hidden_size, c.intermediate_size,
                    name="intermediate")()
        ko, bo = PP(c.intermediate_size, c.hidden_size, name="output")()
        from .layers import fused_tail_gates
        use_fmlp, _ = fused_tail_gates(c.fused_ffn)
        out = None
        if use_fmlp:
            from ..ops.pallas.mlp import fused_mlp
            out = fused_mlp(hidden, ki.astype(hidden.dtype),
                            bi.astype(hidden.dtype),
                            ko.astype(hidden.dtype),
                            bo.astype(hidden.dtype), save_h=True,
                            interpret=jax.default_backend() != "tpu")
        if out is None:
            inter = jnp.dot(hidden, ki.astype(hidden.dtype)) \
                + bi.astype(hidden.dtype)
            inter = nn.gelu(inter, approximate=False)
            out = jnp.dot(inter, ko.astype(inter.dtype)) \
                + bo.astype(inter.dtype)
        out = nn.Dropout(c.hidden_dropout_prob,
                         deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="output_ln")(hidden + out)


class DebertaModel(nn.Module):
    """input_ids + attention_mask -> last hidden state (B, T, H)."""
    cfg: DebertaConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        c = self.cfg
        B, T = input_ids.shape
        from .bert import pick_embed
        WordEmbed = pick_embed(c.vocab_size, c.hidden_size)
        h = WordEmbed(c.vocab_size, c.hidden_size,
                      name="word_embeddings")(input_ids)
        if c.type_vocab_size:
            # reference passes token_type_ids=0 (single segment): one row
            # broadcast; backward is a reduce instead of a (B*T)-row scatter
            h = h + nn.Embed(c.type_vocab_size, c.hidden_size,
                             name="token_type_embeddings")(
                jnp.zeros((1,), jnp.int32))[:, None, :]
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(h)
        mask = attention_mask.astype(h.dtype)
        h = h * mask[:, :, None]            # DebertaEmbeddings zeroes pads
        h = nn.Dropout(c.hidden_dropout_prob,
                       deterministic=deterministic)(h)

        pair_mask = (mask[:, :, None] * mask[:, None, :]) > 0   # (B, T, T)
        rel = (self.param("rel_embeddings", nn.initializers.normal(0.02),
                          (2 * c.max_rel, c.hidden_size))
               if c.pos_att_type else None)
        for i in range(c.num_hidden_layers):
            h = DebertaLayer(c, name=f"layer_{i}")(h, pair_mask, rel,
                                                   deterministic)
        return h


# --------------------------------------------------------------- conversion
def deberta_torch_param_order(num_layers: int
                              ) -> List[Tuple[str, Tuple[str, ...]]]:
    """[(torch_name, flax_path)] in DebertaModel.named_parameters() order
    (measured: embeddings 3, per layer 16 with q_bias/v_bias FIRST —
    direct Parameters precede submodules — and rel_embeddings LAST)."""
    order: List[Tuple[str, Optional[Tuple[str, ...]]]] = [
        ("embeddings.word_embeddings.weight",
         ("word_embeddings", "embedding")),
        ("embeddings.LayerNorm.weight", ("embeddings_ln", "scale")),
        ("embeddings.LayerNorm.bias", ("embeddings_ln", "bias")),
    ]
    for i in range(num_layers):
        L = f"layer_{i}"
        t = f"encoder.layer.{i}."
        order += [
            (t + "attention.self.q_bias", (L, "attention_self", "q_bias")),
            (t + "attention.self.v_bias", (L, "attention_self", "v_bias")),
            (t + "attention.self.in_proj.weight",
             (L, "attention_self", "in_proj")),
            (t + "attention.self.pos_proj.weight",
             (L, "attention_self", "pos_proj")),
            (t + "attention.self.pos_q_proj.weight",
             (L, "attention_self", "pos_q_proj", "kernel")),
            (t + "attention.self.pos_q_proj.bias",
             (L, "attention_self", "pos_q_proj", "bias")),
            (t + "attention.output.dense.weight",
             (L, "attention_output", "kernel")),
            (t + "attention.output.dense.bias",
             (L, "attention_output", "bias")),
            (t + "attention.output.LayerNorm.weight",
             (L, "attention_ln", "scale")),
            (t + "attention.output.LayerNorm.bias",
             (L, "attention_ln", "bias")),
            (t + "intermediate.dense.weight", (L, "intermediate", "kernel")),
            (t + "intermediate.dense.bias", (L, "intermediate", "bias")),
            (t + "output.dense.weight", (L, "output", "kernel")),
            (t + "output.dense.bias", (L, "output", "bias")),
            (t + "output.LayerNorm.weight", (L, "output_ln", "scale")),
            (t + "output.LayerNorm.bias", (L, "output_ln", "bias")),
        ]
    order += [("encoder.rel_embeddings.weight", ("rel_embeddings",))]
    return order


def convert_deberta_state_dict(state_dict: Dict[str, np.ndarray],
                               num_layers: int, num_heads: int) -> Dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {}

    def put(path, v):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(v, np.float32)

    for torch_name, flax_path in deberta_torch_param_order(num_layers):
        if torch_name not in sd:
            if "deberta." + torch_name in sd:
                torch_name = "deberta." + torch_name
            else:
                raise KeyError(f"missing checkpoint tensor: {torch_name}")
        v = sd[torch_name]
        if flax_path[-1] == "in_proj":
            # HF chunks AFTER the head transpose, so the in_proj output is
            # per-head interleaved ([q|k|v] x dh columns for each head);
            # repack the rows to the block [Q|K|V] layout the module splits
            H3, H = v.shape
            dh = H // num_heads
            v = v.reshape(num_heads, 3, dh, H)           # [head][qkv][dh]
            v = v.transpose(1, 0, 2, 3).reshape(H3, H)   # [qkv][head][dh]
        # torch Linear weights are (out, in) -> flax (in, out)
        if flax_path[-1] in ("kernel", "in_proj", "pos_proj"):
            v = np.ascontiguousarray(np.asarray(v).T)
        put(flax_path, v)
    return out


def deberta_frozen_paths(num_layers: int, freeze_before: int,
                         prefix: Tuple[str, ...] = ()) -> Set[Tuple[str, ...]]:
    frozen = set()
    for idx, (_n, flax_path) in enumerate(
            deberta_torch_param_order(num_layers)):
        if idx < freeze_before:
            frozen.add(prefix + flax_path)
    return frozen
