"""Swin parity vs HF transformers SwinModel (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _tiny_hf_cfg():
    from transformers import SwinConfig as HFC
    return HFC(image_size=16, patch_size=2, num_channels=3, embed_dim=8,
               depths=[2, 2], num_heads=[2, 4], window_size=2,
               mlp_ratio=2.0, drop_path_rate=0.0,
               hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def test_swin_matches_hf():
    from transformers import SwinModel as HFM
    from idvs.morec_tpu.models.swin import (SwinConfig, SwinModel,
                                            convert_swin_state_dict,
                                            swin_torch_param_order)
    hf_cfg = _tiny_hf_cfg()
    torch.manual_seed(0)
    hf = HFM(hf_cfg, add_pooling_layer=True).eval()

    names = [n for n, _ in hf.named_parameters()]
    cfg = SwinConfig.from_hf(hf_cfg)
    want = [n for n, _ in swin_torch_param_order(cfg)]
    assert names == want

    x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(x))
        ref_pooled = out.pooler_output.numpy()

    params = convert_swin_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    model = SwinModel(cfg)
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), True)
    np.testing.assert_allclose(np.asarray(got), ref_pooled, atol=3e-4)


def test_swin_shifted_window_path_changes_output():
    """depths [2] means block 1 uses shifted windows; verify the shift path
    actually differs from treating it unshifted (mask wiring sanity)."""
    from idvs.morec_tpu.models.swin import SwinConfig, SwinBlock
    cfg = SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                     depths=(2,), num_heads=(2,), window_size=2,
                     drop_path_rate=0.0, mlp_ratio=2.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 8)),
                    jnp.float32)
    shifted = SwinBlock(cfg, 8, 2, (8, 8), shift=True, drop_path=0.0)
    unshifted = SwinBlock(cfg, 8, 2, (8, 8), shift=False, drop_path=0.0)
    p = shifted.init(jax.random.PRNGKey(0), x, True)
    a = shifted.apply(p, x, True)
    b = unshifted.apply(p, x, True)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_swin_tiny_real_geometry_runs():
    """swin-tiny-at-224 geometry (4 stages, window 7) compiles and runs on a
    small batch."""
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel
    cfg = SwinConfig()  # defaults = swin-tiny
    model = SwinModel(cfg)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, True)
    out = model.apply(params, x, True)
    assert out.shape == (1, 768)


def test_swin_block_fused_mlp_matches_xla():
    """SwinBlock with fused=True (interpret-mode Pallas attention + MLP
    kernels) matches the XLA fallback path, fwd and grads."""
    import os
    from idvs.morec_tpu.models.swin import SwinConfig, SwinBlock
    cfg = SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                     depths=(2,), num_heads=(2,), window_size=2,
                     drop_path_rate=0.0, mlp_ratio=2.0)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 64, 8)),
                    jnp.float32)
    fused = SwinBlock(cfg, 8, 2, (8, 8), shift=True, drop_path=0.0,
                      fused=True)
    plain = SwinBlock(cfg, 8, 2, (8, 8), shift=True, drop_path=0.0,
                      fused=False)
    p = fused.init(jax.random.PRNGKey(0), x, True)
    assert p["params"].keys() == plain.init(
        jax.random.PRNGKey(0), x, True)["params"].keys()

    a = fused.apply(p, x, True)
    b = plain.apply(p, x, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=1e-5)

    ga = jax.grad(lambda p: jnp.sum(fused.apply(p, x, True) ** 2))(p)
    gb = jax.grad(lambda p: jnp.sum(plain.apply(p, x, True) ** 2))(p)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
    for path, va in flat_a:
        vb = flat_b[path]
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=5e-4, atol=2e-5,
                                   err_msg=str(path))


def test_swin_fused_mlp_ablation_env_identity():
    """IDVS_SWIN_NO_MLP short-circuits the MLP (diag tool contract)."""
    import os
    from idvs.morec_tpu.models.swin import SwinConfig, SwinBlock
    cfg = SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                     depths=(2,), num_heads=(2,), window_size=2,
                     drop_path_rate=0.0, mlp_ratio=2.0)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 64, 8)),
                    jnp.float32)
    blk = SwinBlock(cfg, 8, 2, (8, 8), shift=False, drop_path=0.0)
    p = blk.init(jax.random.PRNGKey(0), x, True)
    base = blk.apply(p, x, True)
    os.environ["IDVS_SWIN_NO_MLP"] = "1"
    try:
        ablated = blk.apply(p, x, True)
    finally:
        del os.environ["IDVS_SWIN_NO_MLP"]
    assert not np.allclose(np.asarray(base), np.asarray(ablated))
