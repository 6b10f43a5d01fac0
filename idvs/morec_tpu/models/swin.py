"""Flax Swin Transformer — weight-compatible with HF SwinModel checkpoints
(the reference's swin_tiny/swin_base towers, inbatch_sasrec_e2e_vision/
run.py:47-54: SwinForImageClassification with the classifier replaced by a
Linear to embedding_dim; the tower output is GELU(classifier(pooler))).

Implements the full HF geometry: patch embed (conv s4), pre-LN blocks with
windowed attention + relative position bias, shifted windows on odd blocks,
patch merging between stages, final LayerNorm + mean pooler. Stochastic depth
(drop_path) is applied in training like HF.

All window bookkeeping (relative position index, shift masks) is computed in
numpy at trace time — static shapes, no device-side gather surprises.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name as _ckpt_name


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    drop_path_rate: float = 0.1
    use_absolute_embeddings: bool = False

    @classmethod
    def from_hf(cls, hf):
        return cls(image_size=hf.image_size, patch_size=hf.patch_size,
                   num_channels=hf.num_channels, embed_dim=hf.embed_dim,
                   depths=tuple(hf.depths), num_heads=tuple(hf.num_heads),
                   window_size=hf.window_size, mlp_ratio=hf.mlp_ratio,
                   layer_norm_eps=hf.layer_norm_eps,
                   hidden_dropout_prob=hf.hidden_dropout_prob,
                   attention_probs_dropout_prob=hf.attention_probs_dropout_prob,
                   drop_path_rate=hf.drop_path_rate,
                   use_absolute_embeddings=hf.use_absolute_embeddings)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += w - 1
    rel[..., 1] += w - 1
    rel[..., 0] *= 2 * w - 1
    return rel.sum(-1)  # (w*w, w*w)


def _shift_mask(Hp: int, Wp: int, w: int, s: int) -> np.ndarray:
    """(nW, w*w, w*w) additive mask in {0, -100} for shifted windows."""
    img = np.zeros((Hp, Wp))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
        for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, w * w)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(wins, w, H, W):
    B = wins.shape[0] // (H // w * W // w)
    x = wins.reshape(B, H // w, W // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep,
                                    (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    n_heads: int
    resolution: Tuple[int, int]
    shift: bool
    drop_path: float
    # None = auto: fused Pallas windowed attention on TPU (rel-pos + shift
    # biases enter the kernel as a CYCLIC (nW, nh, w², w²) bias — windows
    # repeat with period nW, nothing is broadcast per-row), XLA elsewhere
    fused: bool = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import os as _os
        c = self.cfg
        H, W = self.resolution
        B, L, C = x.shape
        w = min(c.window_size, H, W)
        s = w // 2 if (self.shift and w < min(H, W)) else 0
        if _os.environ.get("IDVS_SWIN_NO_SHIFT"):
            s = 0   # perf-ablation escape hatch (tools/swin_matrix.py)
        shortcut = x
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm_before")(x)
        x = x.reshape(B, H, W, C)
        pad_h = (w - H % w) % w
        pad_w = (w - W % w) % w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        if s:
            x = jnp.roll(x, (-s, -s), axis=(1, 2))

        # --- windowed attention with relative position bias ---
        # fused QKV weights (one (C, 3C) matrix); ProjParams keeps the
        # q/k/v/attention_output param tree so the HF Swin converter and
        # freeze masks are unchanged. NOTE: unlike bert.py, swin carries NO
        # fusion fences — measured 171.1 (nofence) vs 177.0 ms (fenced) on
        # the 176-img chunk; the conv-emitter dots here produce batch-minor
        # layouts and each fence forced a relayout copy.
        nh, dh = self.n_heads, C // self.n_heads
        from .layers import ProjParams
        kq, bq = ProjParams(C, C, name="query")()
        kk, bk = ProjParams(C, C, name="key")()
        kv, bv = ProjParams(C, C, name="value")()
        ko, bo = ProjParams(C, C, name="attention_output")()
        wcat = jnp.concatenate([kq, kk, kv], axis=1).astype(x.dtype)
        bcat = jnp.concatenate([bq, bk, bv]).astype(x.dtype)
        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * w - 1) ** 2, nh))
        use_fused = self.fused
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        p_drop = (0.0 if deterministic else c.attention_probs_dropout_prob)
        interp = (None if self.fused is None else
                  jax.default_backend() != "tpu")

        def rel_bias():
            idx = jnp.asarray(_rel_pos_index(w).reshape(-1))
            bias = table[idx].reshape(w * w, w * w, nh)
            bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)
            if s:   # (nW, nh, w², w²) — cyclic over the window dim
                amask = jnp.asarray(_shift_mask(Hp, Wp, w, s))
                bias = bias + amask[:, None]
            return bias

        # Band edition first: windows form INSIDE the kernel from the
        # (B, Hp, Wp, C) map, so the window_partition/_window_reverse 6D
        # transposes (40.9 GB/step of HBM copies in the vision bench,
        # PARITY.md) never exist. Falls back to the window-layout kernel
        # when the band blocking can't satisfy divisibility/VMEM.
        out4 = None
        if (use_fused and p_drop == 0.0
                and not _os.environ.get("IDVS_SWIN_NO_ATTN")
                and not _os.environ.get("IDVS_SWIN_NO_WIN")
                and not _os.environ.get("IDVS_SWIN_NO_BAND")):
            from ..ops.pallas.attention import fused_mha_proj_band
            out4 = fused_mha_proj_band(x, rel_bias(), wcat, bcat,
                                       ko.astype(x.dtype),
                                       bo.astype(x.dtype),
                                       n_heads=nh, window=w,
                                       bias_grad=True, interpret=interp)
        if out4 is not None:
            wins = None
        elif _os.environ.get("IDVS_SWIN_NO_WIN"):
            wins = x.reshape(-1, w * w, C)   # ablation: no 6D transpose
        else:
            wins = _window_partition(x, w)                   # (B*nW, w*w, C)

        projected = False
        if out4 is not None:
            pass
        elif _os.environ.get("IDVS_SWIN_NO_ATTN"):
            qkv = jnp.dot(wins, wcat) + bcat
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = q + k + v                           # ablation: identity
        elif use_fused and p_drop == 0.0:
            # projection-absorbing kernel: QKV dot + biased MHA + output
            # dot in one pallas_call (at Swin's C the XLA projections hit
            # transpose-reuse conv emitters + per-dot layout copies)
            from ..ops.pallas.attention import fused_mha_proj
            out = fused_mha_proj(wins, rel_bias(), wcat, bcat,
                                 ko.astype(wins.dtype),
                                 bo.astype(wins.dtype),
                                 n_heads=nh, bias_grad=True,
                                 interpret=interp)
            projected = True
        elif use_fused:
            qkv = jnp.dot(wins, wcat) + bcat                 # (B·nW, w², 3C)
            from ..ops.pallas.attention import fused_mha
            rng = self.make_rng("dropout") if p_drop > 0.0 else None
            out = fused_mha(qkv, bias=rel_bias(),
                            bias_grad=True,   # the rel-pos table trains
                            n_heads=nh, drop_rate=p_drop, dropout_rng=rng,
                            interpret=interp)
        else:
            qkv = jnp.dot(wins, wcat) + bcat
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (t.reshape(-1, w * w, nh, dh) for t in (q, k, v))
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                              preferred_element_type=jnp.float32) / (dh ** 0.5)
            if not _os.environ.get("IDVS_SWIN_NO_BIAS"):
                idx = jnp.asarray(_rel_pos_index(w).reshape(-1))
                bias = table[idx].reshape(w * w, w * w, nh).transpose(2, 0, 1)
                attn = attn + bias[None]
            if s:
                amask = jnp.asarray(_shift_mask(Hp, Wp, w, s))  # (nW, ww, ww)
                nW = amask.shape[0]
                attn = attn.reshape(-1, nW, nh, w * w, w * w)
                attn = attn + amask[None, :, None]
                attn = attn.reshape(-1, nh, w * w, w * w)
            p = jax.nn.softmax(attn, axis=-1).astype(wins.dtype)
            p = nn.Dropout(c.attention_probs_dropout_prob,
                           deterministic=deterministic)(p)
            out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(-1, w * w, C)
        if out4 is not None:
            # band kernel output is already (B, Hp, Wp, C) — no reverse
            x = _ckpt_name(out4, "swin_attn")
            x = nn.Dropout(c.hidden_dropout_prob,
                           deterministic=deterministic)(x)
        else:
            if not projected:
                out = jnp.dot(out, ko.astype(out.dtype)) + bo.astype(out.dtype)
            # name the attention result for the chunked-remat policy: the
            # backward recompute re-runs everything EXCEPT these saved
            # outputs, so the windowed-attention kernel runs twice per
            # step, not three times
            # (train/step.py save_only_these_names('swin_attn'))
            out = _ckpt_name(out, "swin_attn")
            out = nn.Dropout(c.hidden_dropout_prob,
                             deterministic=deterministic)(out)
            if _os.environ.get("IDVS_SWIN_NO_WIN"):
                x = out.reshape(B, Hp, Wp, C)
            else:
                x = _window_reverse(out, w, Hp, Wp)
        if s:
            x = jnp.roll(x, (s, s), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :H, :W]
        attn_out = x.reshape(B, L, C)

        # --- MLP: LN -> 4C dense -> exact GELU -> dense (HF Swin
        # SwinIntermediate/SwinOutput). Fused Pallas edition on TPU: the
        # whole sub-block in one kernel with the 4C-wide intermediate
        # VMEM-resident — at stage-0/1 channel widths the XLA dots lower
        # through transpose-reuse conv emitters at ~12-26 TFLOPS with
        # relayout copies at every kernel boundary (PARITY.md band-layout
        # closure). Param tree unchanged (LNParams/ProjParams). ---
        from .layers import LNParams, layer_norm
        F = int(C * c.mlp_ratio)
        gm, bt = LNParams(C, name="layernorm_after")()
        k1, b1 = ProjParams(C, F, name="intermediate")()
        k2, b2 = ProjParams(F, C, name="output")()
        p_hid = 0.0 if deterministic else c.hidden_dropout_prob

        def dp_scale():
            """One DropPath Bernoulli per image, scaled by 1/keep — the
            DropPath module's semantics drawn inline for the fused tails
            (draw ORDER within the 'dropout' stream differs from the module
            path, like every fused-tail edition — PARITY r4 item 7)."""
            if self.drop_path > 0.0 and not deterministic:
                keep = 1.0 - self.drop_path
                mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                            (B, 1))
                sc = mask.astype(jnp.float32) / keep
            else:
                sc = jnp.ones((B, 1), jnp.float32)
            return jnp.broadcast_to(sc, (B, L)).reshape(-1)

        x = shortcut + DropPath(self.drop_path, name="dp1")(attn_out,
                                                            deterministic)
        if _os.environ.get("IDVS_SWIN_NO_MLP"):
            return x          # ablation: measure the MLP's in-context cost
        fused_tails = (use_fused and p_hid == 0.0
                       and not _os.environ.get("IDVS_SWIN_NO_FMLP")
                       and not _os.environ.get("IDVS_SWIN_NO_RESEPI"))
        # (A double-residual edition that ALSO folded the attention-side
        # `shortcut + DropPath(attn)` into the kernel was built and
        # measured: vision_zipf 204.0 device sps vs 217.5 with this
        # single-residual epilogue — the in-kernel attention-add serializes
        # work XLA was overlapping with the window-reverse copies. Removed;
        # dead-end log in PARITY.md round 5.)
        if fused_tails:
            # single-residual epilogue: the MLP sub-block INCLUDING its
            # `x + DropPath(...)` tail in one kernel. Check the blocking
            # fits BEFORE drawing the mask — a declined kernel must not
            # consume an rng draw the fallback DropPath would re-draw
            from ..ops.pallas.mlp import fused_mlp_res, fused_mlp_res_supported
            if fused_mlp_res_supported(C, F, x.dtype.itemsize):
                # DropPath inactive -> the scale-free unit edition (no
                # (M,1) operand, no per-row multiply)
                sc = (None if deterministic or self.drop_path == 0.0
                      else dp_scale())
                out = fused_mlp_res(x, sc, k1.astype(x.dtype),
                                    b1.astype(x.dtype), k2.astype(x.dtype),
                                    b2.astype(x.dtype), ln=(gm, bt),
                                    eps=c.layer_norm_eps, interpret=interp)
                if out is not None:
                    return out
        h = None
        if (use_fused and p_hid == 0.0
                and not _os.environ.get("IDVS_SWIN_NO_FMLP")):
            from ..ops.pallas.mlp import fused_mlp
            # save_h default off: at Swin's C the dot1 recompute (~0.25 ms
            # at stage 0) is cheaper than the (M, F) h round trip (~0.5 ms)
            h = fused_mlp(x, k1.astype(x.dtype), b1.astype(x.dtype),
                          k2.astype(x.dtype), b2.astype(x.dtype),
                          ln=(gm, bt), eps=c.layer_norm_eps,
                          save_h=bool(_os.environ.get("IDVS_SWIN_FMLP_SAVEH")),
                          interpret=interp)
        if h is None:
            h = layer_norm(x, gm, bt, c.layer_norm_eps)
            h = jnp.dot(h, k1.astype(h.dtype)) + b1.astype(h.dtype)
            h = nn.gelu(h, approximate=False)
            h = jnp.dot(h, k2.astype(h.dtype)) + b2.astype(h.dtype)
            h = nn.Dropout(c.hidden_dropout_prob,
                           deterministic=deterministic)(h)
        return x + DropPath(self.drop_path, name="dp2")(h, deterministic)


class PatchProject(nn.Module):
    """Non-overlapping patch embedding as space-to-depth + ONE matmul.

    Numerically identical to the stride-p pxp convolution (patches don't
    overlap, so the conv is a pure linear map per patch), but a TPU conv
    with C_in = 3 pads channels to the 8-lane tile and runs the emitter at
    a fraction of MXU rate — measured 78 ms/step of convolution fusions in
    the vision bench. The (p*p*C, D) matmul form reshapes the SAME conv
    kernel param (HWIO row-major over (ph, pw, c) matches the space-to-
    depth flattening order), so HF checkpoint conversion is untouched.
    """
    patch: int
    features: int

    @nn.compact
    def __call__(self, x):
        p = self.patch
        B, H, W, C = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (p, p, C, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // p, W // p,
                                                  p * p * C)
        w2 = kern.astype(x.dtype).reshape(p * p * C, self.features)
        return jnp.dot(x, w2) + bias.astype(x.dtype)


class PatchMerging(nn.Module):
    cfg: SwinConfig
    resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        H, W = self.resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x)


class SwinModel(nn.Module):
    """images NHWC (normalized) -> pooled (B, num_features)."""
    cfg: SwinConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        B = x.shape[0]
        x = PatchProject(c.patch_size, c.embed_dim,
                         name="patch_projection")(x)
        H, W = x.shape[1], x.shape[2]
        x = x.reshape(B, H * W, c.embed_dim)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="patch_norm")(x)
        x = nn.Dropout(c.hidden_dropout_prob, deterministic=deterministic)(x)

        total_blocks = sum(c.depths)
        dpr = np.linspace(0, c.drop_path_rate, total_blocks)
        bi = 0
        dim = c.embed_dim
        for s, depth in enumerate(c.depths):
            for b in range(depth):
                x = SwinBlock(c, dim, c.num_heads[s], (H, W),
                              shift=(b % 2 == 1), drop_path=float(dpr[bi]),
                              name=f"stage_{s}_block_{b}")(x, deterministic)
                bi += 1
            if s < len(c.depths) - 1:
                x = PatchMerging(c, (H, W), name=f"stage_{s}_downsample")(x)
                H, W = (H + 1) // 2, (W + 1) // 2
                dim *= 2
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm")(x)
        return jnp.mean(x, axis=1)  # HF pooler: AdaptiveAvgPool1d(1)


# --------------------------------------------------------------- conversion
def swin_torch_param_order(cfg: SwinConfig, prefix_hf: str = ""
                           ) -> List[Tuple[str, Optional[tuple]]]:
    """HF SwinModel.named_parameters() order -> flax paths."""
    P = prefix_hf
    order: List[Tuple[str, Optional[tuple]]] = [
        (P + "embeddings.patch_embeddings.projection.weight",
         ("patch_projection", "kernel")),
        (P + "embeddings.patch_embeddings.projection.bias",
         ("patch_projection", "bias")),
        (P + "embeddings.norm.weight", ("patch_norm", "scale")),
        (P + "embeddings.norm.bias", ("patch_norm", "bias")),
    ]
    for s, depth in enumerate(cfg.depths):
        for b in range(depth):
            t = P + f"encoder.layers.{s}.blocks.{b}."
            f = f"stage_{s}_block_{b}"
            order += [
                (t + "layernorm_before.weight", (f, "layernorm_before", "scale")),
                (t + "layernorm_before.bias", (f, "layernorm_before", "bias")),
                (t + "attention.self.relative_position_bias_table",
                 (f, "relative_position_bias_table")),
                (t + "attention.self.query.weight", (f, "query", "kernel")),
                (t + "attention.self.query.bias", (f, "query", "bias")),
                (t + "attention.self.key.weight", (f, "key", "kernel")),
                (t + "attention.self.key.bias", (f, "key", "bias")),
                (t + "attention.self.value.weight", (f, "value", "kernel")),
                (t + "attention.self.value.bias", (f, "value", "bias")),
                (t + "attention.output.dense.weight",
                 (f, "attention_output", "kernel")),
                (t + "attention.output.dense.bias",
                 (f, "attention_output", "bias")),
                (t + "layernorm_after.weight", (f, "layernorm_after", "scale")),
                (t + "layernorm_after.bias", (f, "layernorm_after", "bias")),
                (t + "intermediate.dense.weight", (f, "intermediate", "kernel")),
                (t + "intermediate.dense.bias", (f, "intermediate", "bias")),
                (t + "output.dense.weight", (f, "output", "kernel")),
                (t + "output.dense.bias", (f, "output", "bias")),
            ]
        if s < len(cfg.depths) - 1:
            t = P + f"encoder.layers.{s}.downsample."
            f = f"stage_{s}_downsample"
            order += [
                (t + "reduction.weight", (f, "reduction", "kernel")),
                (t + "norm.weight", (f, "norm", "scale")),
                (t + "norm.bias", (f, "norm", "bias")),
            ]
    order += [(P + "layernorm.weight", ("layernorm", "scale")),
              (P + "layernorm.bias", ("layernorm", "bias"))]
    return order


def convert_swin_state_dict(sd: Dict[str, np.ndarray], cfg: SwinConfig) -> Dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # tolerate the 'swin.' prefix of SwinForImageClassification checkpoints
    if any(k.startswith("swin.") for k in sd):
        sd = {k[len("swin."):] if k.startswith("swin.") else k: v
              for k, v in sd.items()}
    out: Dict = {}

    def put(path, v):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(v, np.float32)

    for tname, fpath in swin_torch_param_order(cfg):
        if fpath is None:
            continue
        v = sd[tname]
        if fpath[-1] == "kernel":
            if v.ndim == 4:      # conv OIHW -> HWIO
                v = v.transpose(2, 3, 1, 0)
            else:                # linear (out, in) -> (in, out)
                v = v.T
        put(fpath, np.ascontiguousarray(v))
    return out


def swin_frozen_paths(cfg: SwinConfig, freeze_before: int,
                      prefix: Tuple[str, ...] = ()) -> set:
    """The reference freezes by index over SwinForImageClassification's
    named_parameters — 'swin.*' entries first, classifier last and excluded
    from freezing (inbatch_sasrec_e2e_vision/run.py:58-60,125-129)."""
    frozen = set()
    for idx, (_t, fpath) in enumerate(swin_torch_param_order(cfg)):
        if idx < freeze_before and fpath is not None:
            frozen.add(prefix + fpath)
    return frozen
