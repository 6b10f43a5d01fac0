"""Two-group AdamW split parity: which params belong to the fine-tune group.

The reference builds its optimizer groups from torch named_parameters()
string rules:
- text (inbatch_sasrec_e2e_text/run.py:150-158): 'bert_model' in name ->
  fine-tune group, everything else recsys
- vision (inbatch_sasrec_e2e_vision/run.py:121-134): 'image_net' in name ->
  fine-tune group EXCEPT names containing 'fc' or 'classifier' (the replaced
  heads), which go to recsys

These tests apply the reference's own string rules to the converter order
maps (torch name <-> flax path) and assert param_labels/
default_encoder_predicate classifies every mapped path identically. The
ResNet case is the regression for the replaced-fc bug: our ResNet keeps fc
INSIDE 'net' (resnet.py out_dim), so a bare 'net'-membership predicate put
it in the fine-tune group while the reference pays recsys lr/l2 on it.
"""

import numpy as np
import pytest

from idvs.morec_tpu.train.state import default_encoder_predicate


def _ref_vision_group(torch_name: str) -> bool:
    """True = fine-tune group (reference vision run.py:125-129), for a
    param named cv_encoder.image_net.<torch_name>."""
    full = "cv_encoder.image_net." + torch_name
    if "image_net" in full:
        return not ("fc" in full or "classifier" in full)
    return False


def test_resnet_fc_in_recsys_group():
    from idvs.morec_tpu.models.resnet import resnet_torch_param_order

    for arch in ("resnet18", "resnet50"):
        order = resnet_torch_param_order(arch)
        assert any(t.startswith("fc.") for t, _ in order)
        for tname, fpath in order:
            ours = default_encoder_predicate(("encoder", "net") + fpath)
            assert ours == _ref_vision_group(tname), (arch, tname, fpath)


def test_swin_heads_and_body_grouping():
    from idvs.morec_tpu.models.swin import SwinConfig, swin_torch_param_order

    cfg = SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                     depths=(2, 2), num_heads=(2, 4), window_size=2)
    for tname, fpath in swin_torch_param_order(cfg):
        ours = default_encoder_predicate(("encoder", "net") + tuple(fpath))
        assert ours == _ref_vision_group(tname), (tname, fpath)
    # the replaced classifier lives OUTSIDE net on our side -> recsys,
    # exactly like the reference's 'classifier' exclusion
    assert not default_encoder_predicate(("encoder", "classifier", "kernel"))


def test_text_tower_grouping():
    # reference text rule: only bert_model itself fine-tunes; the per-attr
    # projection fc is recsys (run.py:153-158)
    assert default_encoder_predicate(("encoder", "net", "layer_0", "attention",
                                      "query", "kernel"))
    assert not default_encoder_predicate(("encoder", "fc", "kernel"))
    # OPT FFN denses are fc1/fc2 (exact-name exclusion must NOT catch them)
    assert default_encoder_predicate(("encoder", "net", "layer_0", "fc1",
                                      "kernel"))
    assert default_encoder_predicate(("encoder", "net", "layer_0", "fc2",
                                      "bias"))


def test_labels_on_real_resnet_tower():
    """End-to-end: param_labels over an initialized ResNet RecModel puts
    net-internal convs/bns in the encoder group and ONLY the replaced fc
    (+ SASRec/user params) in recsys."""
    import jax
    import jax.numpy as jnp

    from idvs.morec_tpu.models.model import RecModel
    from idvs.morec_tpu.models.resnet import ResNet
    from idvs.morec_tpu.models.vision_tower import VisionTower
    from idvs.morec_tpu.train.state import (ENCODER_LABEL, RECSYS_LABEL,
                                            param_labels)

    D = 8
    tower = VisionTower(net=ResNet(arch="resnet18", out_dim=D), kind="resnet",
                        embedding_dim=D, feature_dim=D)
    model = RecModel(user_tower="sasrec", item_tower="modal", item_num=5,
                     embedding_dim=D, num_attention_heads=2,
                     transformer_block=1, max_seq_len=4, drop_rate=0.0,
                     encoder=tower)
    ids = jnp.ones((2, 5), jnp.int32)
    imgs = jnp.zeros((10, 32, 32, 3), jnp.uint8)
    lm = jnp.ones((2, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, imgs, lm)
    labels = param_labels(params["params"], default_encoder_predicate, set())

    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {"fc": [], "net_other": [], "outside": []}
    for path, lab in flat:
        keys = tuple(getattr(p, "key", None) for p in path)
        if "net" in keys:
            (seen["fc"] if "fc" in keys else seen["net_other"]).append(lab)
        else:
            seen["outside"].append(lab)
    assert seen["fc"] and all(l == RECSYS_LABEL for l in seen["fc"])
    assert seen["net_other"] and all(l == ENCODER_LABEL
                                     for l in seen["net_other"])
    assert all(l == RECSYS_LABEL for l in seen["outside"])
