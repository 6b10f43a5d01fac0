"""ViT-MAE parity vs HF transformers (random weights, injected noise)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _hf_cfg(mask_ratio=0.5):
    from transformers import ViTMAEConfig as HFC
    return HFC(image_size=16, patch_size=4, num_channels=3, hidden_size=24,
               num_hidden_layers=2, num_attention_heads=2,
               intermediate_size=48, hidden_dropout_prob=0.0,
               attention_probs_dropout_prob=0.0, mask_ratio=mask_ratio,
               decoder_num_hidden_layers=1, decoder_hidden_size=16,
               decoder_num_attention_heads=2, decoder_intermediate_size=32)


def test_vit_mae_matches_hf_with_injected_noise():
    from transformers import ViTMAEModel as HFM
    from idvs.morec_tpu.models.vit_mae import (ViTMAEConfig, ViTMAEModel,
                                               convert_vit_mae_state_dict,
                                               vit_mae_torch_param_order)
    hf_cfg = _hf_cfg()
    torch.manual_seed(0)
    hf = HFM(hf_cfg).eval()

    names = [n for n, _ in hf.named_parameters()]
    cfg = ViTMAEConfig.from_hf(hf_cfg)
    want = [n for n, _ in vit_mae_torch_param_order(cfg)]
    assert names == want

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    noise = rng.uniform(size=(2, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(x),
                 noise=torch.tensor(noise)).last_hidden_state.numpy()

    params = convert_vit_mae_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    model = ViTMAEModel(cfg)
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), True,
                      noise=jnp.asarray(noise))
    assert got.shape == ref.shape  # (2, 1 + 8 kept, 24)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)


def test_vit_mae_sincos_table_matches_hf():
    from transformers import ViTMAEModel as HFM
    from idvs.morec_tpu.models.vit_mae import sincos_pos_embed
    hf = HFM(_hf_cfg()).eval()
    ref = hf.embeddings.position_embeddings.detach().numpy()
    got = sincos_pos_embed(24, 4)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_vit_mae_masking_rng_path():
    from idvs.morec_tpu.models.vit_mae import ViTMAEConfig, ViTMAEModel
    cfg = ViTMAEConfig(image_size=16, patch_size=4, hidden_size=24,
                       num_hidden_layers=1, num_attention_heads=2,
                       intermediate_size=48, mask_ratio=0.5)
    model = ViTMAEModel(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, x, True)
    out = model.apply(params, x, True, rngs={"masking": jax.random.PRNGKey(2)})
    assert out.shape == (2, 1 + 8, 24)
