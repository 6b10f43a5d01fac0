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

from .layers import ProjParams


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
    # DistilBERT (HF DistilBertModel): same post-LN block as BERT with no
    # token-type embeddings (type_vocab_size=0 skips the table entirely);
    # param names differ only on the torch side (convert_text.py maps
    # q_lin/k_lin/... onto the same flax tree)

    # None = auto: use the fused Pallas attention kernel on TPU backends
    # (ops/pallas/attention.py), the plain XLA composition elsewhere. The
    # kernel keeps Q/K/V in natural (B, T, 3H) layout — no head-transpose
    # copies and no transposed-layout contagion into the residual stream.
    fused_attention: bool = None
    # None = auto: fused Pallas FFN (dense->GELU->dense in one kernel, the
    # 4H-wide intermediate VMEM-resident, ops/pallas/mlp.py) on TPU; the
    # XLA composition elsewhere. True forces the kernel (interpret mode on
    # CPU — tests).
    fused_ffn: bool = None
    # None = auto: run the word-embedding backward scatter-add as the Pallas
    # VMEM-resident kernel (ops/pallas/embed_scatter.py) on TPU — measured
    # 5.1 ms vs XLA's serialized scatter at the bench geometry. True forces
    # it (interpret mode on CPU — tests). Forward gather is unchanged.
    fused_embed_backward: bool = None

    @classmethod
    def from_hf(cls, hf_cfg) -> "BertConfig":
        if hf_cfg.model_type == "distilbert":
            return cls(vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.dim,
                       num_hidden_layers=hf_cfg.n_layers,
                       num_attention_heads=hf_cfg.n_heads,
                       intermediate_size=hf_cfg.hidden_dim,
                       max_position_embeddings=hf_cfg.max_position_embeddings,
                       type_vocab_size=0, layer_norm_eps=1e-12,
                       hidden_dropout_prob=hf_cfg.dropout,
                       attention_probs_dropout_prob=hf_cfg.attention_dropout,
                       pad_token_id=hf_cfg.pad_token_id)
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
    def __call__(self, hidden, attention_mask, deterministic: bool = True):
        c = self.cfg
        B, T, H = hidden.shape
        nh = c.num_attention_heads
        dh = H // nh
        # fused QKV: one (H, 3H) matmul; weight concat is 3*H*H elements,
        # negligible next to the (B*T, H, 3H) projection it feeds
        kq, bq = ProjParams(H, H, name="query")()
        kk, bk = ProjParams(H, H, name="key")()
        kv, bv = ProjParams(H, H, name="value")()
        w = jnp.concatenate([kq, kk, kv], axis=1).astype(hidden.dtype)
        b = jnp.concatenate([bq, bk, bv]).astype(hidden.dtype)
        qkv = _fence(jnp.dot(hidden, w) + b)

        if _os.environ.get("IDVS_NO_ATTN"):
            # perf-experiment escape hatch: identity "attention" (keeps the
            # QKV/out projections so matmul structure is unchanged)
            return qkv[:, :, :H]
        use_fused = c.fused_attention
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        p_drop = c.attention_probs_dropout_prob
        if use_fused:
            from ..ops.pallas.attention import fused_mha
            rng = (self.make_rng("dropout")
                   if (not deterministic and p_drop > 0.0) else None)
            return fused_mha(qkv, attention_mask, n_heads=nh,
                             drop_rate=(0.0 if deterministic else p_drop),
                             dropout_rng=rng)

        # additive mask: 0 keep, big-negative drop (HF uses (1-mask)*min_dtype;
        # -1e9 is equivalent under softmax)
        att_bias = ((1.0 - attention_mask.astype(jnp.float32))
                    [:, None, None, :] * -1e9)
        q, k, v = [t.reshape(B, T, nh, dh)
                   for t in jnp.split(qkv, 3, axis=-1)]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) / (dh ** 0.5)
        attn = attn + att_bias
        p = jax.nn.softmax(attn, axis=-1).astype(hidden.dtype)
        p = nn.Dropout(c.attention_probs_dropout_prob,
                       deterministic=deterministic)(p)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, H)
        return out


# Fusion fences (numerical identity). XLA eagerly fuses LayerNorm statistics,
# dropout-mask regeneration, and GELU recompute into the adjacent matmuls as
# prologues/epilogues; on v5e that forces transpose-reuse convolution emitters
# that run the K=B*S*T dW contractions and the FFN fwd dots at 23-45 TFLOPS
# instead of ~120-130 (measured, BERT-small geometry — see PARITY.md). A
# barrier on a matmul's output (and on each LN's input) keeps the dots pure;
# the split elementwise passes cost ~0.25 ms of HBM bandwidth each, a 3-5x
# win on the dots they free. Barriers transpose to barriers, so the backward
# dW/dx dots are fenced at the same cuts.
# (IDVS_NO_FENCE=1 disables them — perf-experiment escape hatch only;
# checked at trace time.)
import os as _os


def _fence(x):
    if _os.environ.get("IDVS_NO_FENCE"):
        return x
    return jax.lax.optimization_barrier(x)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic: bool = True):
        c = self.cfg
        attn_out = BertSelfAttention(c, name="attention_self")(
            hidden, attention_mask, deterministic)
        # Post-attention sub-block: projection + dropout + residual + LN.
        # On TPU the whole tail runs as one kernel (fused_proj_resln) —
        # same epilogue rationale as the FFN tail below. Params identical
        # to nn.Dense(attention_output) + nn.LayerNorm(attention_ln).
        from .layers import LNParams, fused_tail_gates, layer_norm
        kp, bp = ProjParams(c.hidden_size, c.hidden_size,
                            name="attention_output")()
        gm1, bt1 = LNParams(c.hidden_size, name="attention_ln")()
        use_fmlp, use_post = fused_tail_gates(c.fused_ffn)
        hidden_new = None
        if use_post:
            from ..ops.pallas.mlp import fused_proj_resln
            p_drop = 0.0 if deterministic else c.hidden_dropout_prob
            seed = None
            if p_drop > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (1,),
                                          0, 2 ** 31 - 1, jnp.int32)
            hidden_new = fused_proj_resln(
                attn_out, hidden, kp.astype(attn_out.dtype),
                bp.astype(attn_out.dtype), ln2=(gm1, bt1),
                eps2=c.layer_norm_eps, drop_rate=p_drop, seed=seed,
                interpret=jax.default_backend() != "tpu")
        if hidden_new is None:
            attn_out = _fence(jnp.dot(attn_out, kp.astype(attn_out.dtype))
                              + bp.astype(attn_out.dtype))
            attn_out = nn.Dropout(c.hidden_dropout_prob,
                                  deterministic=deterministic)(attn_out)
            hidden_new = layer_norm(_fence(hidden + attn_out), gm1, bt1,
                                    c.layer_norm_eps)
        hidden = hidden_new
        # FFN: dense -> exact GELU -> dense. Fused Pallas edition keeps the
        # 4H-wide GELU intermediate VMEM-resident (the XLA composition
        # materializes h and gelu(h) to HBM — ~1 GB/layer of pure traffic at
        # the bench geometry); save_h=True because at big-M the dot1
        # recompute costs more than the (M, F) residual round trip.
        ki, bi = ProjParams(c.hidden_size, c.intermediate_size,
                            name="intermediate")()
        ko, bo = ProjParams(c.intermediate_size, c.hidden_size,
                            name="output")()
        # Post-epilogue edition: the whole FFN sub-block — dense->GELU->dense
        # PLUS dropout-apply, residual add, and the post-LN — in ONE kernel
        # (ops/pallas/mlp.py fused_mlp_resln). Removes the three XLA
        # elementwise passes over (M, H) this tail otherwise costs per
        # direction (part of the ~35 ms elementwise floor, BASELINE.md).
        # LN params come from LNParams so the tree equals nn.LayerNorm's.
        gm2, bt2 = LNParams(c.hidden_size, name="output_ln")()
        if use_post:
            from ..ops.pallas.mlp import fused_mlp_resln
            p_drop = 0.0 if deterministic else c.hidden_dropout_prob
            seed = None
            if p_drop > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (1,),
                                          0, 2 ** 31 - 1, jnp.int32)
            out2 = fused_mlp_resln(
                hidden, ki.astype(hidden.dtype), bi.astype(hidden.dtype),
                ko.astype(hidden.dtype), bo.astype(hidden.dtype),
                ln2=(gm2, bt2), eps2=c.layer_norm_eps, drop_rate=p_drop,
                seed=seed, interpret=jax.default_backend() != "tpu")
            if out2 is not None:
                return out2
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
        out = _fence(out)
        out = nn.Dropout(c.hidden_dropout_prob, deterministic=deterministic)(out)
        return layer_norm(_fence(hidden + out), gm2, bt2, c.layer_norm_eps)


class _ScatterEmbed(nn.Embed):
    """nn.Embed whose table-gradient scatter-add runs as the Pallas
    VMEM-resident kernel (ops/pallas/embed_scatter.py). Forward gather and
    param tree are identical to nn.Embed; only the backward schedule changes
    (accumulation is f32 — tighter than XLA's bf16 scatter under AMP)."""

    def __call__(self, inputs):
        from ..ops.pallas.embed_scatter import embed_gather
        return embed_gather(self.embedding, inputs,
                            interpret=jax.default_backend() != "tpu")


def pick_embed(vocab_size: int, hidden_size: int, override: bool = None):
    """nn.Embed or the Pallas-backward edition, per the standard gate
    (override; else TPU backend + IDVS_NO_PSCATTER escape hatch) and the
    kernel's VMEM stripe bound."""
    use = override
    if use is None:
        use = (jax.default_backend() == "tpu"
               and not _os.environ.get("IDVS_NO_PSCATTER"))
    if use:
        from ..ops.pallas.embed_scatter import kernel_supported
        use = kernel_supported(vocab_size, hidden_size)
    return _ScatterEmbed if use else nn.Embed


class BertModel(nn.Module):
    """input_ids + attention_mask -> last hidden state (B, T, H)."""
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        B, T = input_ids.shape
        WordEmbed = pick_embed(c.vocab_size, c.hidden_size,
                               c.fused_embed_backward)
        word = WordEmbed(c.vocab_size, c.hidden_size, name="word_embeddings")
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings")
        tok = (nn.Embed(c.type_vocab_size, c.hidden_size,
                        name="token_type_embeddings")
               if c.type_vocab_size else None)
        if c.is_roberta:
            # HF RoBERTa: position ids follow the cumulative non-pad count,
            # offset by pad_token_id+1
            mask = (input_ids != c.pad_token_id).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + c.pad_token_id
            pos_emb = pos(position_ids)
        else:
            # arange positions are row-constant: gather T rows once and let
            # the add broadcast. Value-identical forward; the backward becomes
            # a sum over B instead of a (B*T)-row duplicate-heavy scatter
            # (part of the measured 9.1 ms scatter floor, PARITY.md sgemb row)
            pos_emb = pos(jnp.arange(T, dtype=jnp.int32))[None]
        h = word(input_ids) + pos_emb
        if tok is not None:
            # reference always passes token_type_ids=0 (single segment):
            # one row broadcast, backward is one reduce
            h = h + tok(jnp.zeros((1,), jnp.int32))[:, None, :]
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(h)
        h = nn.Dropout(c.hidden_dropout_prob, deterministic=deterministic)(h)
        if _os.environ.get("IDVS_SG_EMB"):
            # perf-experiment escape hatch: cut the embedding-table backward
            # (isolates the vocab scatter-add cost in the ablation matrix)
            h = jax.lax.stop_gradient(h)

        for i in range(c.num_hidden_layers):
            h = BertLayer(c, name=f"layer_{i}")(h, attention_mask,
                                                deterministic)
        return h
