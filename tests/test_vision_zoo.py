"""Vision encoder zoo: build_vision_tower must load + convert real saved HF
checkpoints for swin/mae/beit/clip and torchvision-format resnet .pth."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from idvs.morec_tpu.config import Config


def _cfg(pm_dir, name, **kw):
    return Config(item_tower="modal", modality="vision", stage="end2end",
                  cv_model_load=name, pretrained_models_dir=pm_dir,
                  embedding_dim=16, image_resize=16, freeze_paras_before=2,
                  **kw)


def _check_bundle(bundle, feat_want, x_shape=(2, 16, 16, 3)):
    module, params, frozen, feat = bundle
    assert feat == feat_want
    assert params is not None
    x = jnp.zeros(x_shape, jnp.uint8)
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    variables = module.init(rngs, x, True)
    for coll, sub in params.items():
        merged = dict(variables[coll]["net"])
        merged.update(sub)
        variables[coll]["net"] = merged
    out = module.apply(variables, x, True,
                       rngs={"masking": jax.random.PRNGKey(2)})
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert len(frozen) == 2


def test_zoo_swin(tmp_path):
    from transformers import SwinConfig, SwinModel
    from idvs.morec_tpu.models.vision_tower import build_vision_tower
    d = tmp_path / "swin_tiny"
    torch.manual_seed(0)
    hf_cfg = SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                        depths=[2], num_heads=[2], window_size=2,
                        mlp_ratio=2.0, drop_path_rate=0.0)
    SwinModel(hf_cfg).save_pretrained(str(d), safe_serialization=False)
    bundle = build_vision_tower(_cfg(str(tmp_path), "swin_tiny"))
    _check_bundle(bundle, hf_cfg.embed_dim * 2 ** 0)


def test_zoo_mae(tmp_path):
    from transformers import ViTMAEConfig, ViTMAEModel
    from idvs.morec_tpu.models.vision_tower import build_vision_tower
    d = tmp_path / "vit_mae"
    torch.manual_seed(0)
    hf_cfg = ViTMAEConfig(image_size=16, patch_size=4, hidden_size=24,
                          num_hidden_layers=1, num_attention_heads=2,
                          intermediate_size=48, mask_ratio=0.5,
                          decoder_num_hidden_layers=1,
                          decoder_hidden_size=16,
                          decoder_num_attention_heads=2,
                          decoder_intermediate_size=32)
    m = ViTMAEModel(hf_cfg)
    m.save_pretrained(str(d), safe_serialization=False)
    bundle = build_vision_tower(_cfg(str(tmp_path), "vit_mae"))
    _check_bundle(bundle, 24)


def test_zoo_beit(tmp_path):
    from transformers import BeitConfig, BeitModel
    from idvs.morec_tpu.models.vision_tower import build_vision_tower
    d = tmp_path / "beit_base"
    torch.manual_seed(0)
    hf_cfg = BeitConfig(image_size=16, patch_size=4, hidden_size=24,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=48, use_relative_position_bias=True,
                        use_shared_relative_position_bias=False,
                        use_mean_pooling=True, use_mask_token=False,
                        use_absolute_position_embeddings=False,
                        drop_path_rate=0.0)
    BeitModel(hf_cfg, add_pooling_layer=True).save_pretrained(
        str(d), safe_serialization=False)
    bundle = build_vision_tower(_cfg(str(tmp_path), "beit_base"))
    _check_bundle(bundle, 24)


def test_zoo_clip(tmp_path):
    from transformers import CLIPVisionConfig, CLIPVisionModel
    from idvs.morec_tpu.models.vision_tower import build_vision_tower
    d = tmp_path / "clip_vit"
    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(image_size=16, patch_size=4, hidden_size=24,
                              num_hidden_layers=1, num_attention_heads=2,
                              intermediate_size=48)
    CLIPVisionModel(hf_cfg).save_pretrained(str(d), safe_serialization=False)
    bundle = build_vision_tower(_cfg(str(tmp_path), "clip_vit"))
    _check_bundle(bundle, 24)


def test_zoo_resnet_pth(tmp_path):
    """torchvision-format resnet .pth: converted params graft, fc replaced."""
    from idvs.morec_tpu.models.vision_tower import build_vision_tower
    from tests.test_resnet import TorchResNet18
    torch.manual_seed(0)
    ref = TorchResNet18(out_dim=1000)  # torchvision fc = 1000 classes
    d = tmp_path / "resnet18"
    d.mkdir()
    torch.save(ref.state_dict(), str(d / "resnet18.pth"))
    bundle = build_vision_tower(_cfg(str(tmp_path), "resnet18"))
    module, params, frozen, feat = bundle
    assert params is not None and "batch_stats" in params
    assert "fc" not in params["params"]  # replaced by fresh Linear(ed)
    x = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    variables = module.init(jax.random.PRNGKey(0), x, True)
    for coll, sub in params.items():
        merged = dict(variables[coll]["net"])
        merged.update(sub)
        variables[coll]["net"] = merged
    out = module.apply(variables, x, True)
    assert out.shape == (2, 16)
