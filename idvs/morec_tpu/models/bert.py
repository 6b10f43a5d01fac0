"""Flax BERT/RoBERTa encoder — own implementation, weight-compatible with the
HuggingFace checkpoints the reference loads (inbatch_sasrec_e2e_text/
run.py:29-72 loads BertModel/RobertaModel from pytorch_model.bin; we convert
the same file into this module's param tree, models/convert_text.py).

Only the pieces the reference uses are implemented: the base encoder's last
hidden state (reference pools CLS / masked-mean itself, model/encoders.py:
41-50,63-70; the HF pooler head is loaded but frozen and unused, so it is
not ported).

TPU notes: everything is static-shape; attention mask is additive bf16/f32;
the (B*(L+1), num_words) batch of catalog rows is the MXU hot path, so the
matmuls stay [B*S, T, H] x [H, H'] with no dynamic control flow.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pad_token_id: int = 0
    position_offset: int = 0   # RoBERTa: pad_token_id + 1 = 2
    is_roberta: bool = False

    @classmethod
    def from_hf(cls, hf_cfg) -> "BertConfig":
        is_roberta = hf_cfg.model_type == "roberta"
        return cls(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            num_attention_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            type_vocab_size=hf_cfg.type_vocab_size,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            hidden_dropout_prob=hf_cfg.hidden_dropout_prob,
            attention_probs_dropout_prob=hf_cfg.attention_probs_dropout_prob,
            pad_token_id=hf_cfg.pad_token_id,
            position_offset=(hf_cfg.pad_token_id + 1) if is_roberta else 0,
            is_roberta=is_roberta,
        )


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, att_bias, deterministic: bool = True):
        c = self.cfg
        B, T, H = hidden.shape
        nh = c.num_attention_heads
        dh = H // nh
        q = nn.Dense(H, name="query")(hidden).reshape(B, T, nh, dh)
        k = nn.Dense(H, name="key")(hidden).reshape(B, T, nh, dh)
        v = nn.Dense(H, name="value")(hidden).reshape(B, T, nh, dh)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) / (dh ** 0.5)
        attn = attn + att_bias
        p = jax.nn.softmax(attn, axis=-1).astype(hidden.dtype)
        p = nn.Dropout(c.attention_probs_dropout_prob,
                       deterministic=deterministic)(p)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, H)
        return out


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, att_bias, deterministic: bool = True):
        c = self.cfg
        attn_out = BertSelfAttention(c, name="attention_self")(
            hidden, att_bias, deterministic)
        attn_out = nn.Dense(c.hidden_size, name="attention_output")(attn_out)
        attn_out = nn.Dropout(c.hidden_dropout_prob,
                              deterministic=deterministic)(attn_out)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="attention_ln")(hidden + attn_out)
        inter = nn.Dense(c.intermediate_size, name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, name="output")(inter)
        out = nn.Dropout(c.hidden_dropout_prob, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="output_ln")(hidden + out)


class BertModel(nn.Module):
    """input_ids + attention_mask -> last hidden state (B, T, H)."""
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        B, T = input_ids.shape
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings")
        tok = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings")
        if c.is_roberta:
            # HF RoBERTa: position ids follow the cumulative non-pad count,
            # offset by pad_token_id+1
            mask = (input_ids != c.pad_token_id).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + c.pad_token_id
        else:
            position_ids = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        h = (word(input_ids) + pos(position_ids)
             + tok(jnp.zeros_like(input_ids)))
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(h)
        h = nn.Dropout(c.hidden_dropout_prob, deterministic=deterministic)(h)

        # additive mask (B, 1, 1, T): 0 keep, big-negative drop (HF uses
        # (1-mask)*min_dtype; -1e9 is equivalent under softmax)
        att_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        for i in range(c.num_hidden_layers):
            h = BertLayer(c, name=f"layer_{i}")(h, att_bias, deterministic)
        return h
