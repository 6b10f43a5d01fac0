"""ResNet parity: our Flax ResNet vs a torch module with torchvision's exact
structure and state_dict key names (torchvision itself is not installed in
this image; the checkpoint key format is the compatibility contract —
reference loads torchvision resnet .pth files, inbatch_sasrec_e2e_vision/
run.py:27-46)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn


class TorchBasicBlock(tnn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(idt + y)


class TorchResNet18(tnn.Module):
    """torchvision resnet18 structure with identical state_dict keys."""

    def __init__(self, out_dim=16):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        counts = (2, 2, 2, 2)
        filters = [64, 128, 256, 512]
        inp = 64
        for s, (n, f) in enumerate(zip(counts, filters)):
            blocks = []
            for b in range(n):
                stride = 2 if (s > 0 and b == 0) else 1
                blocks.append(TorchBasicBlock(inp, f, stride))
                inp = f
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, out_dim)

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            y = getattr(self, f"layer{s + 1}")(y)
        y = self.avgpool(y).flatten(1)
        return self.fc(y)


def test_resnet18_matches_torch_eval_mode():
    from idvs.morec_tpu.models.resnet import ResNet, convert_resnet_state_dict

    torch.manual_seed(0)
    ref_model = TorchResNet18(out_dim=16).eval()
    # randomize BN running stats so the test covers them
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(torch.tensor(x)).numpy()

    params, stats = convert_resnet_state_dict(
        {k: v.numpy() for k, v in ref_model.state_dict().items()}, "resnet18")
    model = ResNet(arch="resnet18", out_dim=16)
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_resnet_param_order_and_freezing():
    from idvs.morec_tpu.models.resnet import (resnet_torch_param_order,
                                              resnet_frozen_paths)
    torch.manual_seed(0)
    ref_model = TorchResNet18()
    names = [n for n, _ in ref_model.named_parameters()]
    want = [n for n, _ in resnet_torch_param_order("resnet18")]
    assert names == want
    frozen = resnet_frozen_paths("resnet18", freeze_before=9)
    assert ("conv1", "kernel") in frozen
    assert ("layer1_0", "conv1", "kernel") in frozen
    # fc never frozen regardless of index
    big = resnet_frozen_paths("resnet18", freeze_before=10_000)
    assert not any(p[0] == "fc" for p in big)


def test_resnet_train_mode_updates_batch_stats():
    from idvs.morec_tpu.models.resnet import ResNet
    model = ResNet(arch="resnet18", out_dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 8)
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mut["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
