"""Shared building blocks (Flax linen).

Initialization parity: the reference xavier-normal-inits every Linear /
Embedding weight and zeros biases (e.g. User_Encoder._init_weights,
inbatch_sasrec_e2e_text/model/encoders.py:15-21). torch's xavier_normal_ on a
(out, in) weight equals variance_scaling(1, 'fan_avg', 'normal') on the
transposed (in, out) kernel — symmetric in fan_in/fan_out, so the stds match.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_normal = nn.initializers.xavier_normal()
zeros_init = nn.initializers.zeros


def layer_norm(x, scale, bias, eps):
    """Functional nn.LayerNorm (bit-identical in f32: f32 stats, fast
    variance, scale/bias applied in f32, result cast back). Used by callers
    that own the LN params so a fused kernel can absorb the LN — the XLA
    fallback goes through here (pinned against flax in test_pallas_mlp)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def fused_tail_gates(override=None):
    """(use_fused_ffn, use_post_epilogue) — the ONE gate for the fused
    Pallas MLP/projection tails (models/bert.py, models/sasrec.py, and any
    future caller keep in sync by calling this).

    override: a config tri-state (e.g. BertConfig.fused_ffn). None = auto:
    TPU backend unless IDVS_NO_FMLP is set. An explicit True forces the
    fused path even off-TPU (interpret-mode tests). IDVS_NO_FMLP_POST
    additionally disables only the post-LN epilogue editions
    (fused_mlp_resln / fused_proj_resln), keeping plain fused_mlp."""
    import os
    use = override
    if use is None:
        use = (jax.default_backend() == "tpu"
               and not os.environ.get("IDVS_NO_FMLP"))
    use_post = bool(use) and not os.environ.get("IDVS_NO_FMLP_POST")
    return bool(use), use_post


def pre_ln_mlp(x, features, *, ln_name, fc1_name, fc2_name, eps,
               act="gelu", save_h=True, residual=False):
    """Pre-LN ViT-style MLP sub-block: LN -> dense(features) -> act ->
    dense(C). Creates params with the SAME tree as nn.LayerNorm(<ln_name>)
    + nn.Dense(<fc1>/<fc2>) (converters/freeze masks unchanged), runs the
    fused Pallas kernel on TPU (ops/pallas/mlp.py; IDVS_NO_FMLP restores
    XLA), the functional composition elsewhere. Must be called from inside
    a compact __call__ (submodules bind to the caller's scope).

    residual=True returns x + mlp(LN(x)) with the residual add fused as an
    in-kernel epilogue (fused_mlp_res unit edition — measured +10% on the
    Swin and ViT-MAE fwd-only catalog encodes, PARITY r5). ONLY for callers with nothing
    between the MLP and the add (no dropout / LayerScale), and — per the
    measure-before-keep discipline — callers pass it on their
    DETERMINISTIC (eval/catalog-encode) path only, where the win is
    measured; the training path keeps fused_mlp(save_h=True) + XLA add
    (the fold forces the bwd into recompute geometry, unmeasured for
    these towers). Otherwise residual=False and the add / dropout /
    LayerScale stay with the caller."""
    C = x.shape[-1]
    gm, bt = LNParams(C, name=ln_name)()
    k1, b1 = ProjParams(C, features, name=fc1_name)()
    k2, b2 = ProjParams(features, C, name=fc2_name)()
    import os as _os
    if fused_tail_gates()[0]:
        if residual and not _os.environ.get("IDVS_NO_PRELN_RES"):
            from ..ops.pallas.mlp import fused_mlp_res
            out = fused_mlp_res(x, None, k1.astype(x.dtype),
                                b1.astype(x.dtype), k2.astype(x.dtype),
                                b2.astype(x.dtype), ln=(gm, bt), eps=eps,
                                act=act)
            if out is not None:
                return out
        from ..ops.pallas.mlp import fused_mlp
        h = fused_mlp(x, k1.astype(x.dtype), b1.astype(x.dtype),
                      k2.astype(x.dtype), b2.astype(x.dtype),
                      ln=(gm, bt), eps=eps, act=act, save_h=save_h)
        if h is not None:
            return x + h if residual else h
    h = layer_norm(x, gm, bt, eps)
    h = jnp.dot(h, k1.astype(h.dtype)) + b1.astype(h.dtype)
    if act == "relu":
        h = jnp.maximum(h, 0)
    elif act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = nn.gelu(h, approximate=False)
    h = jnp.dot(h, k2.astype(h.dtype)) + b2.astype(h.dtype)
    return x + h if residual else h


class LNParams(nn.Module):
    """One LayerNorm's (scale, bias) WITHOUT applying it — the LN analogue
    of ProjParams: keeps the param tree identical to nn.LayerNorm
    (<name>/scale, <name>/bias) so converters/freeze masks are unchanged
    while the caller fuses the LN into a kernel."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones_init(),
                           (self.features,)),
                self.param("bias", zeros_init, (self.features,)))


class ProjParams(nn.Module):
    """One projection's (kernel, bias) WITHOUT applying it.

    Keeps the param tree identical to nn.Dense (<name>/kernel, <name>/bias)
    so weight converters are unchanged, while letting the caller fuse several
    projections (Q/K/V) into ONE matmul. On v5e a (M,512)x(512,1536) dot runs
    at ~94 TFLOPS vs ~48 for three 512x512 dots — N=512 underfills the MXU
    pipeline. bias is None when use_bias=False (matches Dense(use_bias=False)).
    """
    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = zeros_init

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features))
        b = (self.param("bias", self.bias_init, (self.features,))
             if self.use_bias else None)
        return k, b


class MLPLayers(nn.Module):
    """[Dropout -> Dense -> GELU] x len(layers)-1.

    Reference bce_text/main-end2end(DSSM)/model/encoders.py:6-18 (MLP_Layers)
    and the CAT fusion MLP (bce_text/id_plus_mo-end2end/model/encoders.py:17-39).
    """
    layers: Sequence[int]
    drop_rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for out_dim in self.layers[1:]:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
            x = nn.Dense(out_dim, kernel_init=xavier_normal, bias_init=zeros_init)(x)
            x = nn.gelu(x, approximate=False)
        return x


class FCLayers(nn.Module):
    """word_dim -> item_dim projection + GELU, then an MLP stack.

    Reference two-stage MLP_Layers with leading fc
    (bce_text/main-2stage(SASRec)/model/encoders.py:7-31).
    """
    word_embedding_dim: int
    item_embedding_dim: int
    dnn_layers: int
    drop_rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.item_embedding_dim, kernel_init=xavier_normal,
                     bias_init=zeros_init, name="fc")(x)
        x = nn.gelu(x, approximate=False)
        if self.dnn_layers > 0:
            x = MLPLayers([self.item_embedding_dim] * (self.dnn_layers + 1),
                          self.drop_rate, name="mlp")(x, deterministic)
        return x


class AddFusion(nn.Module):
    """ID (+) modality fusion (reference bce_text/id_plus_mo-end2end/model/encoders.py:8-13)."""

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True):
        return x + y


class CatFusion(nn.Module):
    """concat -> GELU MLP fusion (reference id_plus_mo-end2end/model/encoders.py:17-39).

    n_layers: depth of the post-concat MLP — 1 for item_tower 'modal_cat',
    3 for 'modal_cat_3' (reference bce_text/id_plus_mo-end2end/
    model/model.py:28-34: layers=[2D] + [D]*dnn_layer)."""
    embedding_dim: int
    drop_rate: float
    n_layers: int = 1

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True):
        cat = jnp.concatenate([x, y], axis=-1)
        dims = [2 * self.embedding_dim] + [self.embedding_dim] * self.n_layers
        return MLPLayers(dims, self.drop_rate, name="mlp")(cat, deterministic)
