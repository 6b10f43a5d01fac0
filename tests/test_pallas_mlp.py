"""Fused Pallas (LN->)Dense->GELU->Dense kernel vs the XLA composition
(interpret mode on CPU; the real-TPU path is exercised by bench/graft)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idvs.morec_tpu.ops.pallas.mlp import fused_mlp

EPS = 1e-5


def _params(rng, C, F, dtype=np.float32):
    return (jnp.asarray(rng.normal(size=(C, F)).astype(dtype) * 0.05),
            jnp.asarray(rng.normal(size=(F,)).astype(dtype) * 0.1),
            jnp.asarray(rng.normal(size=(F, C)).astype(dtype) * 0.05),
            jnp.asarray(rng.normal(size=(C,)).astype(dtype) * 0.1))


def _ln_ref(x, gm, bt, eps=EPS):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * gm.astype(jnp.float32) + bt.astype(jnp.float32)
    return y.astype(x.dtype)


def _ref(x, w1, b1, w2, b2, ln=None, act="gelu"):
    if ln is not None:
        x = _ln_ref(x, *ln)
    h = jnp.dot(x, w1) + b1
    g = jnp.maximum(h, 0) if act == "relu" else jax.nn.gelu(
        h, approximate=False)
    return jnp.dot(g, w2) + b2


def test_ln_ref_matches_flax():
    """The functional LN (used by SwinBlock's fused-MLP fallback) is
    nn.LayerNorm bit-for-bit in f32."""
    import flax.linen as nn
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(7, 96)).astype(np.float32))
    mod = nn.LayerNorm(epsilon=EPS)
    var = mod.init(jax.random.PRNGKey(0), x)
    gm, bt = var["params"]["scale"], var["params"]["bias"]
    want = mod.apply(var, x)
    got = _ln_ref(x, gm, bt)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("C,F,M", [(96, 384, 100), (192, 768, 64),
                                   (64, 256, 9)])
def test_fused_mlp_forward_ln(C, F, M):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, C, F)
    gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bt = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    want = _ref(x, w1, b1, w2, b2, ln=(gm, bt))
    got = fused_mlp(x, w1, b1, w2, b2, ln=(gm, bt), eps=EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_mlp_forward_no_ln_3d():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 10, 96)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, 96, 384)
    want = _ref(x, w1, b1, w2, b2)
    got = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("with_ln,save_h", [(True, False), (False, False),
                                            (True, True), (False, True)])
def test_fused_mlp_grads(with_ln, save_h):
    rng = np.random.default_rng(3)
    C, F, M = 96, 384, 50
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, C, F)
    gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bt = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))

    if with_ln:
        def want_fn(x, gm, bt, w1, b1, w2, b2):
            return jnp.sum(_ref(x, w1, b1, w2, b2, ln=(gm, bt)) * cot)

        def got_fn(x, gm, bt, w1, b1, w2, b2):
            return jnp.sum(fused_mlp(x, w1, b1, w2, b2, ln=(gm, bt),
                                     eps=EPS, save_h=save_h,
                                     interpret=True) * cot)
        args = (x, gm, bt, w1, b1, w2, b2)
    else:
        def want_fn(x, w1, b1, w2, b2):
            return jnp.sum(_ref(x, w1, b1, w2, b2) * cot)

        def got_fn(x, w1, b1, w2, b2):
            return jnp.sum(fused_mlp(x, w1, b1, w2, b2, save_h=save_h,
                                     interpret=True) * cot)
        args = (x, w1, b1, w2, b2)

    want = jax.grad(want_fn, argnums=tuple(range(len(args))))(*args)
    got = jax.grad(got_fn, argnums=tuple(range(len(args))))(*args)
    for w, g in zip(want, got):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=1e-5)


def test_fused_mlp_pad_rows_are_inert():
    """M far from any block multiple: padded zero rows must not perturb
    weight grads (they get zero cotangents)."""
    rng = np.random.default_rng(4)
    C, F = 64, 256
    w1, b1, w2, b2 = _params(rng, C, F)
    x = jnp.asarray(rng.normal(size=(5, C)).astype(np.float32))

    def g(fn):
        return jax.grad(lambda w: jnp.sum(fn(w) ** 2))(w1)

    want = g(lambda w: _ref(x, w, b1, w2, b2))
    got = g(lambda w: fused_mlp(x, w, b1, w2, b2, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("save_h", [False, True])
def test_fused_mlp_relu_ln_grads(save_h):
    """The OPT FFN composition: LN absorbed + ReLU activation."""
    rng = np.random.default_rng(9)
    C, F, M = 64, 256, 40
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, C, F)
    gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bt = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))

    def want_fn(*a):
        return jnp.sum(_ref(a[0], *a[3:], ln=(a[1], a[2]),
                            act="relu") ** 2)

    def got_fn(*a):
        return jnp.sum(fused_mlp(a[0], *a[3:], ln=(a[1], a[2]), eps=EPS,
                                 act="relu", save_h=save_h,
                                 interpret=True) ** 2)

    args = (x, gm, bt, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got_fn(*args)), np.asarray(want_fn(*args)), rtol=1e-5)
    want = jax.grad(want_fn, argnums=tuple(range(7)))(*args)
    got = jax.grad(got_fn, argnums=tuple(range(7)))(*args)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=1e-5)


def test_fused_mlp_resln_fwd_and_grads():
    """Post-epilogue edition: PostLN(x + dense2(gelu(dense1(x)))) in one
    kernel (BERT's post-LN FFN sub-block, models/bert.py BertLayer tail).
    drop_rate=0 is the exact regime testable off-TPU (the in-kernel PRNG
    has no interpret lowering)."""
    from idvs.morec_tpu.ops.pallas.mlp import fused_mlp_resln

    rng = np.random.default_rng(11)
    C, F, M = 64, 256, 40     # odd M exercises the pad path
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, C, F)
    gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bt = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))

    def want_fn(x, w1, b1, w2, b2, gm, bt):
        return jnp.sum(jnp.sin(_ln_ref(x + _ref(x, w1, b1, w2, b2), gm, bt)))

    def got_fn(x, w1, b1, w2, b2, gm, bt):
        return jnp.sum(jnp.sin(fused_mlp_resln(
            x, w1, b1, w2, b2, ln2=(gm, bt), eps2=EPS, drop_rate=0.0,
            interpret=True)))

    args = (x, w1, b1, w2, b2, gm, bt)
    np.testing.assert_allclose(np.asarray(got_fn(*args)),
                               np.asarray(want_fn(*args)), rtol=1e-5)
    want = jax.grad(want_fn, argnums=tuple(range(7)))(*args)
    got = jax.grad(got_fn, argnums=tuple(range(7)))(*args)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5)


def test_bert_layer_post_epilogue_matches_fallback():
    """BertLayer with the post-epilogue kernel (interpret, drop 0) equals the
    IDVS_NO_FMLP_POST fallback composition bit-for-bit in f32."""
    import os

    from idvs.morec_tpu.models.bert import BertConfig, BertModel

    cfg = BertConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=16, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0,
                     fused_attention=False, fused_ffn=True,
                     fused_embed_backward=False)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 97, size=(4, 12)), jnp.int32)
    am = jnp.asarray((rng.uniform(size=(4, 12)) < 0.9), jnp.int32)
    model = BertModel(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, am)

    out_post = model.apply(params, ids, am, True)
    os.environ["IDVS_NO_FMLP_POST"] = "1"
    try:
        out_fall = model.apply(params, ids, am, True)
    finally:
        del os.environ["IDVS_NO_FMLP_POST"]
    np.testing.assert_allclose(np.asarray(out_post), np.asarray(out_fall),
                               rtol=2e-6, atol=2e-6)


def test_fused_proj_resln_fwd_and_grads():
    """Projection epilogue edition: PostLN(res + x @ w + b) in one kernel
    (BERT's post-attention tail, models/bert.py BertLayer)."""
    from idvs.morec_tpu.ops.pallas.mlp import fused_proj_resln

    rng = np.random.default_rng(13)
    C, M = 64, 41     # odd M exercises the pad path
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bt = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))

    def want_fn(x, res, w, b, gm, bt):
        return jnp.sum(jnp.sin(_ln_ref(res + jnp.dot(x, w) + b, gm, bt)))

    def got_fn(x, res, w, b, gm, bt):
        return jnp.sum(jnp.sin(fused_proj_resln(
            x, res, w, b, ln2=(gm, bt), eps2=EPS, drop_rate=0.0,
            interpret=True)))

    args = (x, res, w, b, gm, bt)
    np.testing.assert_allclose(np.asarray(got_fn(*args)),
                               np.asarray(want_fn(*args)), rtol=1e-5)
    want = jax.grad(want_fn, argnums=tuple(range(6)))(*args)
    got = jax.grad(got_fn, argnums=tuple(range(6)))(*args)
    for w_, g_ in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=2e-4, atol=2e-5)


def test_epilogue_blocks_equal_under_dropout():
    """Structural invariant: the epilogue kernels' flash-style dropout
    regenerates the mask in backward from (seed + program_id) with
    block-shaped draws, so BMf == BMb whenever drop_rate > 0 — the
    attention kernel's NBf==NBb invariant (PARITY r3 item 13). Pinned at
    the bench geometry, where the unforced picks differ (post: 256 vs 128)."""
    from idvs.morec_tpu.ops.pallas.mlp import (_align_blocks,
                                               _pick_block_post,
                                               _pick_block_proj)

    raw = _pick_block_post(512, 2048, 2)
    assert raw[0] != raw[1], "geometry no longer distinguishes — move it"
    for pick in (raw, _pick_block_proj(512, 2)):
        bf, bb = _align_blocks(pick, 0.1)
        assert bf == bb == min(pick)
        # drop 0 keeps the independently-optimal picks
        assert _align_blocks(pick, 0.0) == pick
    assert _align_blocks(None, 0.1) is None


def test_primal_fwd_only_editions_match_grad_path():
    """The custom_vjp PRIMALS (taken when nothing differentiates through
    the call — eval / catalog encode) run fwd-only kernels that skip the
    VJP residual writes (y_pre / h). Pin: primal output == the output the
    differentiated path produces, exactly, for all three editions."""
    from idvs.morec_tpu.ops.pallas.mlp import (fused_mlp, fused_mlp_resln,
                                               fused_proj_resln)

    rng = np.random.default_rng(23)
    C, F, M = 64, 256, 40
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, C, F)
    gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bt = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))

    def by_both_paths(f):
        primal = f(x)                                   # fwd-only kernel
        (_, vjp_out), _ = jax.vjp(lambda t: (jnp.sum(f(t)), f(t)), x)
        return primal, vjp_out                          # residual-emitting

    p, v = by_both_paths(lambda t: fused_mlp(
        t, w1, b1, w2, b2, save_h=True, interpret=True))
    np.testing.assert_array_equal(np.asarray(p), np.asarray(v))

    p, v = by_both_paths(lambda t: fused_mlp_resln(
        t, w1, b1, w2, b2, ln2=(gm, bt), eps2=EPS, drop_rate=0.0,
        interpret=True))
    np.testing.assert_array_equal(np.asarray(p), np.asarray(v))

    w = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.05)
    p, v = by_both_paths(lambda t: fused_proj_resln(
        t, res, w, b2[:C], ln2=(gm, bt), eps2=EPS, drop_rate=0.0,
        interpret=True))
    np.testing.assert_array_equal(np.asarray(p), np.asarray(v))


def test_fused_mlp_res_fwd_and_grads():
    """Pre-LN residual-epilogue edition (Swin tails, round 5):
    x + scale * mlp(LN(x)) — forward and every cotangent vs the XLA
    composition, with a DropPath-style 0/(1/keep) row mask."""
    from idvs.morec_tpu.ops.pallas.mlp import fused_mlp_res

    rng = np.random.default_rng(11)
    M, C, F = 48, 96, 192
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, C, F)
    gm = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1 + 1.0)
    bt = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    keep = 0.7
    s = jnp.asarray((rng.uniform(size=(M,)) < keep).astype(np.float32)
                    / keep)

    def ref(x, gm, bt, w1, b1, w2, b2):
        return x + s[:, None] * _ref(x, w1, b1, w2, b2, ln=(gm, bt))

    def fused(x, gm, bt, w1, b1, w2, b2):
        return fused_mlp_res(x, s, w1, b1, w2, b2, ln=(gm, bt), eps=EPS,
                             interpret=True)

    args = (x, gm, bt, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused(*args)),
                               np.asarray(ref(*args)), rtol=2e-5, atol=2e-5)
    ct = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * ct),
                     argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(lambda *a: jnp.sum(fused(*a) * ct),
                       argnums=tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=f"arg {i}")


def test_swin_block_res_epilogue_matches_fallback(monkeypatch):
    """SwinBlock level: the residual-epilogue path == the fused_mlp + XLA
    add path (IDVS_SWIN_NO_RESEPI) at drop_path 0, eval and train."""
    from idvs.morec_tpu.models.swin import SwinConfig, SwinModel

    cfg = SwinConfig(image_size=16, patch_size=2, embed_dim=16,
                     depths=(2,), num_heads=(2,), window_size=2,
                     drop_path_rate=0.0, mlp_ratio=2.0,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    model = SwinModel(cfg)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)

    out_epi = model.apply(params, imgs, True)
    monkeypatch.setenv("IDVS_SWIN_NO_RESEPI", "1")
    out_plain = model.apply(params, imgs, True)
    np.testing.assert_allclose(np.asarray(out_epi), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


def test_pre_ln_mlp_residual_fold_matches_fallback(monkeypatch):
    """CLIP / ViT-MAE / OPT pre-LN residual fold (layers.py residual=True,
    riding fused_mlp_res): force-fused interpret output == the XLA
    fallback composition at dropout 0."""
    import idvs.morec_tpu.models.layers as layers

    rng = np.random.default_rng(21)

    def run_pair(make):
        m, p, f = make()
        base = np.asarray(f(m, p))
        monkeypatch.setattr(layers, "fused_tail_gates",
                            lambda override=None: (True, True))
        try:
            fused = np.asarray(f(m, p))
        finally:
            monkeypatch.undo()
        np.testing.assert_allclose(fused, base, rtol=2e-5, atol=2e-5)

    def clip():
        from idvs.morec_tpu.models.clip_vit import (CLIPVisionConfig,
                                                    CLIPVisionModel)
        cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               intermediate_size=64)
        m = CLIPVisionModel(cfg)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        p = m.init({"params": jax.random.PRNGKey(0)}, x)
        return m, p, lambda m, p: m.apply(p, x, True)

    def mae():
        from idvs.morec_tpu.models.vit_mae import ViTMAEConfig, ViTMAEModel
        cfg = ViTMAEConfig(image_size=32, patch_size=8, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64)
        m = ViTMAEModel(cfg)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        p = m.init({"params": jax.random.PRNGKey(0),
                    "masking": jax.random.PRNGKey(1)}, x)
        return m, p, lambda m, p: m.apply(
            p, x, True, rngs={"masking": jax.random.PRNGKey(1)})

    def opt():
        from idvs.morec_tpu.models.opt import OPTConfig, OPTModel
        cfg = OPTConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, ffn_dim=64,
                        max_position_embeddings=40, dropout=0.0)
        m = OPTModel(cfg)
        ids = jnp.asarray(rng.integers(2, 50, size=(2, 7)), jnp.int32)
        am = jnp.ones((2, 7), jnp.int32)
        p = m.init(jax.random.PRNGKey(0), ids, am)
        return m, p, lambda m, p: m.apply(p, ids, am, True)

    for make in (clip, mae, opt):
        run_pair(make)


def test_fused_mlp_res_unit_edition_grads():
    """scale=None (unit) edition: forward AND all cotangents vs the XLA
    composition, including a padded-M geometry — pins the unit branches of
    _bwd_kernel / mlp_bwd (no scale operand, dx += dout)."""
    from idvs.morec_tpu.ops.pallas.mlp import fused_mlp_res

    rng = np.random.default_rng(31)
    M, C, F = 40, 96, 192            # M=40 pads to the row block
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    w1, b1, w2, b2 = _params(rng, C, F)
    gm = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1 + 1.0)
    bt = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)

    def ref(x, gm, bt, w1, b1, w2, b2):
        return x + _ref(x, w1, b1, w2, b2, ln=(gm, bt))

    def fused(x, gm, bt, w1, b1, w2, b2):
        return fused_mlp_res(x, None, w1, b1, w2, b2, ln=(gm, bt), eps=EPS,
                             interpret=True)

    args = (x, gm, bt, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused(*args)),
                               np.asarray(ref(*args)), rtol=2e-5, atol=2e-5)
    ct = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    g_ref = jax.grad(lambda *z: jnp.sum(ref(*z) * ct),
                     argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(lambda *z: jnp.sum(fused(*z) * ct),
                       argnums=tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=f"arg {i}")
