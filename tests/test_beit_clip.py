"""BEiT and CLIP-vision parity vs HF transformers (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_beit_matches_hf():
    from transformers import BeitConfig as HFC, BeitModel as HFM
    from idvs.morec_tpu.models.beit import (BeitConfig, BeitModel,
                                            beit_torch_param_order,
                                            convert_beit_state_dict)
    hf_cfg = HFC(image_size=16, patch_size=4, num_channels=3, hidden_size=24,
                 num_hidden_layers=2, num_attention_heads=2,
                 intermediate_size=48, use_relative_position_bias=True,
                 use_shared_relative_position_bias=False,
                 layer_scale_init_value=0.1, use_mean_pooling=True,
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 drop_path_rate=0.0, use_mask_token=False,
                 use_absolute_position_embeddings=False)
    torch.manual_seed(0)
    hf = HFM(hf_cfg, add_pooling_layer=True).eval()
    # randomize the zero-init relative bias tables so they're covered
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "relative_position_bias_table" in n:
                p.normal_(0, 0.1)

    cfg = BeitConfig.from_hf(hf_cfg)
    names = [n for n, _ in hf.named_parameters()]
    want = [n for n, _ in beit_torch_param_order(cfg)]
    assert names == want

    x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(x)).pooler_output.numpy()
    params = convert_beit_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    model = BeitModel(cfg)
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)


def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig as HFC, CLIPVisionModel as HFM
    from idvs.morec_tpu.models.clip_vit import (CLIPVisionConfig,
                                                CLIPVisionModel,
                                                clip_torch_param_order,
                                                convert_clip_state_dict)
    hf_cfg = HFC(image_size=16, patch_size=4, num_channels=3, hidden_size=24,
                 num_hidden_layers=2, num_attention_heads=2,
                 intermediate_size=48, attention_dropout=0.0)
    torch.manual_seed(1)
    hf = HFM(hf_cfg).eval()
    cfg = CLIPVisionConfig.from_hf(hf_cfg)
    names = [n for n, _ in hf.named_parameters()]
    want = [n for n, _ in clip_torch_param_order(cfg)]
    assert names == want

    x = np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(x)).pooler_output.numpy()
    params = convert_clip_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    model = CLIPVisionModel(cfg)
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)
