"""SASRec user encoder (Flax linen), semantics-exact to the reference's
from-scratch transformer (inbatch_sasrec_e2e_text/model/modules.py:5-96 and
model/encoders.py:7-28):

- learned positional embeddings added to item embeddings, then LayerNorm
  (eps 1e-6) and dropout
- post-LN residual blocks: MHA (no biases on Q/K/V/out projections, additive
  mask, dropout on attention probs and on the output) then a ReLU FFN with
  d_inner = 4*d_model (biased Dense) — each followed by residual + LayerNorm
- additive causal mask: key k visible to query q iff k <= q and key position
  is a real (non-padded) item

TPU notes: attention runs as plain XLA ops — at max_seq_len ~20 (the
reference's regime) the MXU-bound cost is the surrounding matmuls, which XLA
fuses well; profiling showed the SASRec tower is <15% of a MoRec step, so no
custom kernel is warranted here (the fused Pallas kernel lives in the
in-batch CE loss instead, ops/pallas/inbatch_ce.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ProjParams, xavier_normal, zeros_init
from ..ops.masking import causal_additive_mask

# fusion fence — keeps LN stats / dropout-mask bwd out of the dot emitters
# (numerical identity; rationale in models/bert.py)
_fence = jax.lax.optimization_barrier


class MultiHeadSelfAttention(nn.Module):
    d_model: int
    n_heads: int
    drop_rate: float
    # None = auto: fused Pallas attention on TPU (natural-layout kernel,
    # causal mask passed as a per-head additive bias), XLA elsewhere
    fused: bool = None

    @nn.compact
    def __call__(self, x, att_mask, deterministic: bool = True):
        B, L, D = x.shape
        H = self.n_heads
        dk = self.d_model // H
        # fused QKV (see layers.ProjParams): param tree unchanged, one matmul
        proj = lambda name: ProjParams(D, self.d_model, use_bias=False,
                                       kernel_init=xavier_normal, name=name)
        kq, _ = proj("w_Q")()
        kk, _ = proj("w_K")()
        kv, _ = proj("w_V")()
        w = jnp.concatenate([kq, kk, kv], axis=1).astype(x.dtype)
        qkv = _fence(jnp.dot(x, w))

        use_fused = self.fused
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        p_drop = 0.0 if deterministic else self.drop_rate
        if use_fused:
            from ..ops.pallas.attention import fused_mha
            bias = jnp.broadcast_to(att_mask.astype(jnp.float32),
                                    (B, H, L, L))    # (B,1,L,L) -> per-head
            rng = self.make_rng("dropout") if p_drop > 0.0 else None
            out = fused_mha(qkv, bias=bias, n_heads=H, drop_rate=p_drop,
                            dropout_rng=rng,
                            interpret=(None if self.fused is None else
                                       jax.default_backend() != "tpu"))
        else:
            q, k, v = [t.reshape(B, L, H, dk).transpose(0, 2, 1, 3)
                       for t in jnp.split(qkv, 3, axis=-1)]
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32) / (dk ** 0.5)
            attn = attn + att_mask  # additive {0, -1e9} (encoders.py:27)
            p = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            p = nn.Dropout(self.drop_rate, deterministic=deterministic)(p)
            out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, self.d_model)
        kf, _ = ProjParams(self.d_model, self.d_model, use_bias=False,
                           kernel_init=xavier_normal, name="fc")()
        return out, kf


class TransformerBlock(nn.Module):
    d_model: int
    n_heads: int
    drop_rate: float

    @nn.compact
    def __call__(self, x, att_mask, deterministic: bool = True):
        from .layers import LNParams, fused_tail_gates, layer_norm
        # post-LN residual MHA (modules.py:52-63). On TPU the output
        # projection + dropout + residual + LN run as one kernel
        # (ops/pallas/mlp.py fused_proj_resln — same epilogue rationale as
        # the BERT tails; the reference fc has no bias, so a zero bias is
        # passed). Params identical to the nn.Dense/nn.LayerNorm tree.
        ctx, kf = MultiHeadSelfAttention(self.d_model, self.n_heads,
                                         self.drop_rate,
                                         name="mha")(x, att_mask,
                                                     deterministic)
        gm_a, bt_a = LNParams(self.d_model, name="ln_attn")()
        gm_f, bt_f = LNParams(self.d_model, name="ln_ffn")()
        k1, b1 = ProjParams(self.d_model, 4 * self.d_model,
                            kernel_init=xavier_normal, name="w_1")()
        k2, b2 = ProjParams(4 * self.d_model, self.d_model,
                            kernel_init=xavier_normal, name="w_2")()
        _, use_post = fused_tail_gates()
        p_drop = 0.0 if deterministic else self.drop_rate

        def seed():
            return jax.random.randint(self.make_rng("dropout"), (1,),
                                      0, 2 ** 31 - 1, jnp.int32)

        # attention-projection tail; XLA fallback when the kernel declines
        x1 = None
        if use_post:
            from ..ops.pallas.mlp import fused_proj_resln
            x1 = fused_proj_resln(ctx, x, kf.astype(ctx.dtype),
                                  jnp.zeros((self.d_model,), ctx.dtype),
                                  ln2=(gm_a, bt_a), eps2=1e-6,
                                  drop_rate=p_drop,
                                  seed=seed() if p_drop > 0.0 else None)
        if x1 is None:
            h = _fence(jnp.dot(ctx, kf.astype(ctx.dtype)))
            h = nn.Dropout(self.drop_rate, deterministic=deterministic)(h)
            x1 = layer_norm(_fence(x + h), gm_a, bt_a, 1e-6)
        # ReLU FFN tail, d_inner = 4*d (modules.py:5-17, 86) — decided
        # independently of the projection tail: at large d_model only the
        # projection epilogue fits VMEM, and discarding its output to fall
        # back for the whole block would waste the kernel that worked
        x2 = None
        if use_post:
            from ..ops.pallas.mlp import fused_mlp_resln
            x2 = fused_mlp_resln(x1, k1.astype(x1.dtype),
                                 b1.astype(x1.dtype), k2.astype(x1.dtype),
                                 b2.astype(x1.dtype), ln2=(gm_f, bt_f),
                                 eps2=1e-6, drop_rate=p_drop,
                                 seed=seed() if p_drop > 0.0 else None,
                                 act="relu")
        if x2 is None:
            h = jnp.dot(x1, k1.astype(x1.dtype)) + b1.astype(x1.dtype)
            h = _fence(nn.relu(h))
            h = _fence(jnp.dot(h, k2.astype(h.dtype)) + b2.astype(h.dtype))
            h = nn.Dropout(self.drop_rate, deterministic=deterministic)(h)
            x2 = layer_norm(_fence(x1 + h), gm_f, bt_f, 1e-6)
        return x2


class SASRecEncoder(nn.Module):
    """User tower: input item embeddings -> per-position user states.

    Reference User_Encoder + TransformerEncoder (encoders.py:7-28,
    modules.py:78-96). n_position = max_seq_len; both train (L inputs) and
    eval (L inputs after the reference's repadding) index positions 0..L-1.
    """
    d_model: int
    n_heads: int
    n_layers: int
    max_seq_len: int
    drop_rate: float

    @nn.compact
    def __call__(self, input_embs, log_mask, deterministic: bool = True):
        B, L, D = input_embs.shape
        pos_emb = nn.Embed(self.max_seq_len, self.d_model,
                           embedding_init=xavier_normal, name="position_embedding")
        positions = jnp.arange(L)[None, :]
        x = input_embs + pos_emb(positions)
        x = nn.LayerNorm(epsilon=1e-6, name="ln_in")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        att_mask = causal_additive_mask(log_mask)  # (B, 1, L, L)
        for i in range(self.n_layers):
            x = TransformerBlock(self.d_model, self.n_heads, self.drop_rate,
                                 name=f"block_{i}")(x, att_mask, deterministic)
        return x
