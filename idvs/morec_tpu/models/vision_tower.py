"""Vision item tower: normalized NHWC images -> item embeddings.

Reference wrappers (inbatch_sasrec_e2e_vision/model/encoders.py:7-41 and
run.py:27-56):
- Resnet_Encoder: GELU(resnet(x)) with the torchvision fc replaced by
  Linear(embedding_dim) — here the fc lives inside our ResNet (out_dim)
- Vit_Encoder (Swin/BEiT): GELU(classifier(pooled)) with the classifier
  replaced by Linear(num_features -> embedding_dim)
- MAE_Encoder: GELU(cv_proj(last_hidden[:, 0]))
Two-stage mode returns the raw pre-GELU features for the cache
(bce_vision/main-2stage(SASRec)/run.py:64-69).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import xavier_normal, zeros_init

CV_MODEL_TABLE = {
    # reference names its models 'resnet50', 'swin_tiny', 'swin_base', 'mae'
    "resnet18": ("resnet", 512), "resnet34": ("resnet", 512),
    "resnet50": ("resnet", 2048), "resnet101": ("resnet", 2048),
    "resnet152": ("resnet", 2048),
    "swin_tiny": ("swin", 768), "swin-tiny": ("swin", 768),
    "swin_small": ("swin", 768), "swin_base": ("swin", 1024),
    "swin-base": ("swin", 1024),
    "vit_mae": ("mae", 768), "mae": ("mae", 768),
}


class VisionTower(nn.Module):
    net: nn.Module                 # pretrained CV net ('net' = fine-tune group)
    kind: str                      # 'resnet' | 'swin' | 'mae'
    embedding_dim: int
    feature_dim: int               # encoder output width
    project: bool = True           # False = two-stage raw features
    # activation dtype for the encoder. None keeps the input dtype — but
    # note f32 images SILENTLY promote every bf16-cast matmul back to f32
    # (dtype promotion), doubling encoder time and HBM; the train step
    # passes the Config compute dtype here.
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images, deterministic: bool = True, pad_mask=None):
        if jnp.issubdtype(images.dtype, jnp.integer):
            # uint8 host pipeline: normalize on device (ToTensor + Normalize
            # (.5,.5,.5) parity, reference dataset.py:68-73) — 4x less H2D
            images = (images.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        if pad_mask is not None:
            # id 0 = the pad item: the reference datasets inject a ZERO image
            # in NORMALIZED space for it (inbatch_sasrec_e2e_vision/
            # data_utils/dataset.py:145,164-165 padding_emb), which uint8
            # content cannot represent (u8 zeros normalize to -1.0) — zero
            # those slots exactly before the encoder sees them
            images = jnp.where(pad_mask[:, None, None, None],
                               jnp.zeros((), images.dtype), images)
        if self.compute_dtype is not None:
            images = images.astype(self.compute_dtype)
        if self.kind == "resnet":
            # fc(embedding_dim) is inside ResNet (out_dim); BN train mode
            # follows deterministic (SyncBN handled via axis_name in the net)
            feats = self.net(images, train=not deterministic)
        elif self.kind == "swin":
            pooled = self.net(images, deterministic)
            feats = nn.Dense(self.embedding_dim, kernel_init=xavier_normal,
                             bias_init=zeros_init, name="classifier")(pooled)
        else:  # mae
            hidden = self.net(images, deterministic)
            cls = hidden[:, 0]
            feats = nn.Dense(self.embedding_dim, kernel_init=xavier_normal,
                             bias_init=zeros_init, name="cv_proj")(cls)
        if not self.project:
            return feats
        return nn.gelu(feats, approximate=False)


def build_vision_tower(cfg, axis_name: Optional[str] = None):
    """Encoder bundle (module, params, frozen_paths, feature_dim) for
    cfg.cv_model_load. Loads torchvision .pth / HF checkpoints when present
    under pretrained_models_dir (reference run.py:27-56)."""
    import os

    name = cfg.cv_model_load.replace("-", "_")
    path = os.path.join(cfg.pretrained_models_dir, cfg.cv_model_load)

    if name.startswith("resnet"):
        from .resnet import (ResNet, convert_resnet_state_dict,
                             resnet_frozen_paths)
        net = ResNet(arch=name, out_dim=cfg.embedding_dim, axis_name=axis_name,
                     dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                            else None))
        params = None
        for cand in (os.path.join(path, f"{name}.pth"), path + ".pth"):
            if os.path.exists(cand):
                import torch
                sd = torch.load(cand, map_location="cpu", weights_only=True)
                p, stats = convert_resnet_state_dict(
                    {k: v.numpy() for k, v in sd.items()}, name)
                p.pop("fc", None)  # fc replaced by fresh Linear(ed) (run.py:42-46)
                params = {"params": p, "batch_stats": stats}
                break
        frozen = resnet_frozen_paths(name, cfg.freeze_paras_before,
                                     prefix=("encoder", "net"))
        kind, feat = "resnet", cfg.embedding_dim
    elif "swin" in name:
        from transformers import AutoConfig
        from .swin import (SwinConfig, SwinModel, convert_swin_state_dict,
                           swin_frozen_paths)
        scfg = (SwinConfig.from_hf(AutoConfig.from_pretrained(path))
                if os.path.isdir(path) else
                SwinConfig() if "tiny" in name else
                SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32)))
        net = SwinModel(scfg)
        params = None
        try:
            from .convert_text import load_torch_state_dict
            sd = load_torch_state_dict(path)
            params = {"params": convert_swin_state_dict(sd, scfg)}
        except (FileNotFoundError, OSError):
            pass
        frozen = swin_frozen_paths(scfg, cfg.freeze_paras_before,
                                   prefix=("encoder", "net"))
        kind, feat = "swin", scfg.num_features
    elif "beit" in name:
        from transformers import AutoConfig
        from .beit import (BeitConfig, BeitModel, convert_beit_state_dict,
                           beit_frozen_paths)
        bcfg = (BeitConfig.from_hf(AutoConfig.from_pretrained(path))
                if os.path.isdir(path) else BeitConfig())
        net = BeitModel(bcfg)
        params = None
        try:
            from .convert_text import load_torch_state_dict
            sd = load_torch_state_dict(path)
            params = {"params": convert_beit_state_dict(sd, bcfg)}
        except (FileNotFoundError, OSError):
            pass
        frozen = beit_frozen_paths(bcfg, cfg.freeze_paras_before,
                                   prefix=("encoder", "net"))
        kind, feat = "swin", bcfg.hidden_size  # pooled + classifier head
    elif "clip" in name:
        from transformers import AutoConfig
        from .clip_vit import (CLIPVisionConfig, CLIPVisionModel,
                               convert_clip_state_dict, clip_frozen_paths)
        ccfg = CLIPVisionConfig()
        if os.path.isdir(path):
            hf = AutoConfig.from_pretrained(path)
            ccfg = CLIPVisionConfig.from_hf(
                getattr(hf, "vision_config", hf))
        net = CLIPVisionModel(ccfg)
        params = None
        try:
            from .convert_text import load_torch_state_dict
            sd = load_torch_state_dict(path)
            params = {"params": convert_clip_state_dict(sd, ccfg)}
        except (FileNotFoundError, OSError):
            pass
        frozen = clip_frozen_paths(ccfg, cfg.freeze_paras_before,
                                   prefix=("encoder", "net"))
        kind, feat = "swin", ccfg.hidden_size  # pooled + classifier head
    else:  # mae
        from transformers import AutoConfig
        from .vit_mae import (ViTMAEConfig, ViTMAEModel,
                              convert_vit_mae_state_dict, vit_mae_frozen_paths)
        mcfg = (ViTMAEConfig.from_hf(AutoConfig.from_pretrained(path))
                if os.path.isdir(path) else ViTMAEConfig())
        net = ViTMAEModel(mcfg)
        params = None
        try:
            from .convert_text import load_torch_state_dict
            sd = load_torch_state_dict(path)
            params = {"params": convert_vit_mae_state_dict(sd, mcfg)}
        except (FileNotFoundError, OSError):
            pass
        frozen = vit_mae_frozen_paths(mcfg, cfg.freeze_paras_before,
                                      prefix=("encoder", "net"))
        kind, feat = "mae", mcfg.hidden_size

    tower = VisionTower(net=net, kind=kind, embedding_dim=cfg.embedding_dim,
                        feature_dim=feat, project=(cfg.stage == "end2end"),
                        compute_dtype=(jnp.bfloat16
                                       if cfg.compute_dtype == "bfloat16"
                                       else None))
    return tower, params, frozen, feat
