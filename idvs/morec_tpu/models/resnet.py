"""Flax ResNet-18/34/50/101/152 — weight-compatible with torchvision
checkpoints (the reference's CV towers, inbatch_sasrec_e2e_vision/run.py:27-46,
with the classifier fc replaced by a Linear to embedding_dim).

BatchNorm: running stats live in the 'batch_stats' collection; in the
mesh-sharded train step the norm uses axis_name='data' for cross-replica
batch statistics — the TPU equivalent of the reference's
SyncBatchNorm.convert_sync_batchnorm (run.py:128).

Layout: NHWC (TPU-native); the converter transposes torch OIHW conv weights
to HWIO.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

ARCHS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _bn(name: str, axis_name: Optional[str], dtype=None):
    # dtype=None infers from input AND params — the f32 stats/scale promote
    # a bf16-cast network back to f32 from the first BN on. bf16 runs pass
    # an explicit dtype; statistics still accumulate in f32 internally.
    return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5,
                        axis_name=axis_name, name=name, dtype=dtype)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ra = not train
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = _bn("bn1", self.axis_name, self.dtype)(y, use_running_average=ra)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = _bn("bn2", self.axis_name, self.dtype)(y, use_running_average=ra)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               name="downsample_conv")(x)
            residual = _bn("downsample_bn", self.axis_name, self.dtype)(
                residual, use_running_average=ra)
        return nn.relu(residual + y)


class Bottleneck(nn.Module):
    filters: int          # width of the 3x3; output = 4*filters
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ra = not train
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="conv1")(x)
        y = _bn("bn1", self.axis_name, self.dtype)(y, use_running_average=ra)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2")(y)
        y = _bn("bn2", self.axis_name, self.dtype)(y, use_running_average=ra)
        y = nn.relu(y)
        y = nn.Conv(4 * self.filters, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn("bn3", self.axis_name, self.dtype)(y, use_running_average=ra)
        if residual.shape[-1] != 4 * self.filters or self.stride != 1:
            residual = nn.Conv(4 * self.filters, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               name="downsample_conv")(x)
            residual = _bn("downsample_bn", self.axis_name, self.dtype)(
                residual, use_running_average=ra)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """images NHWC (normalized) -> (B, out_dim) via the replaced fc head."""
    arch: str = "resnet50"
    out_dim: int = 512          # the reference replaces fc with Linear(ed)
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None   # BN result dtype (bf16 compute runs)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, counts = ARCHS[self.arch]
        Block = BasicBlock if block_name == "basic" else Bottleneck
        ra = not train
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        y = _bn("bn1", self.axis_name, self.dtype)(y, use_running_average=ra)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        filters = 64
        for stage, n_blocks in enumerate(counts):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                y = Block(filters, stride, self.axis_name, self.dtype,
                          name=f"layer{stage + 1}_{b}")(y, train)
            filters *= 2
        y = jnp.mean(y, axis=(1, 2))  # adaptive avg pool to 1x1
        return nn.Dense(self.out_dim, name="fc")(y)


# --------------------------------------------------------------- conversion
def _conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))  # OIHW->HWIO


def convert_resnet_state_dict(sd: Dict[str, np.ndarray], arch: str
                              ) -> Tuple[Dict, Dict]:
    """torchvision state_dict -> (params, batch_stats). The torch 'fc' is NOT
    converted (the reference replaces it before loading is relevant;
    run.py:42-46) — our fc stays fresh-initialized unless present with
    matching shape."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, v):
        d = tree
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(v, np.float32)

    def conv(tname, fpath):
        put(params, fpath + ("kernel",), _conv(sd[tname + ".weight"]))

    def bn(tname, fpath):
        put(params, fpath + ("scale",), sd[tname + ".weight"])
        put(params, fpath + ("bias",), sd[tname + ".bias"])
        put(stats, fpath + ("mean",), sd[tname + ".running_mean"])
        put(stats, fpath + ("var",), sd[tname + ".running_var"])

    conv("conv1", ("conv1",))
    bn("bn1", ("bn1",))
    block_name, counts = ARCHS[arch]
    n_convs = 2 if block_name == "basic" else 3
    for stage, n_blocks in enumerate(counts):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            for ci in range(1, n_convs + 1):
                conv(f"{t}.conv{ci}", (f, f"conv{ci}"))
                bn(f"{t}.bn{ci}", (f, f"bn{ci}"))
            if f"{t}.downsample.0.weight" in sd:
                conv(f"{t}.downsample.0", (f, "downsample_conv"))
                bn(f"{t}.downsample.1", (f, "downsample_bn"))
    if "fc.weight" in sd:
        put(params, ("fc", "kernel"), np.asarray(sd["fc.weight"]).T)
        put(params, ("fc", "bias"), sd["fc.bias"])
    return params, stats


def resnet_torch_param_order(arch: str) -> List[Tuple[str, Optional[tuple]]]:
    """torchvision named_parameters() order (BN running stats are buffers,
    not parameters, so they don't appear — matching the reference's
    index-based freezing over named_parameters, run.py:58-60)."""
    order: List[Tuple[str, Optional[tuple]]] = [
        ("conv1.weight", ("conv1", "kernel")),
        ("bn1.weight", ("bn1", "scale")),
        ("bn1.bias", ("bn1", "bias")),
    ]
    block_name, counts = ARCHS[arch]
    n_convs = 2 if block_name == "basic" else 3
    expansion = 1 if block_name == "basic" else 4
    filters = 64
    in_f = 64
    for stage, n_blocks in enumerate(counts):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            for ci in range(1, n_convs + 1):
                order += [(f"{t}.conv{ci}.weight", (f, f"conv{ci}", "kernel")),
                          (f"{t}.bn{ci}.weight", (f, f"bn{ci}", "scale")),
                          (f"{t}.bn{ci}.bias", (f, f"bn{ci}", "bias"))]
            stride = 2 if (stage > 0 and b == 0) else 1
            if b == 0 and (stride != 1 or in_f != filters * expansion):
                order += [(f"{t}.downsample.0.weight", (f, "downsample_conv", "kernel")),
                          (f"{t}.downsample.1.weight", (f, "downsample_bn", "scale")),
                          (f"{t}.downsample.1.bias", (f, "downsample_bn", "bias"))]
            in_f = filters * expansion
        filters *= 2
    order += [("fc.weight", ("fc", "kernel")), ("fc.bias", ("fc", "bias"))]
    return order


def resnet_frozen_paths(arch: str, freeze_before: int,
                        prefix: Tuple[str, ...] = ()) -> set:
    """Index-based freezing; the reference EXCLUDES the (replaced) fc head
    from the frozen set (inbatch_sasrec_e2e_vision/run.py:58-60 freezes
    index < freeze_paras_before over named_parameters; run.py:125-129 keeps
    fc/classifier in the recsys group)."""
    frozen = set()
    for idx, (tname, fpath) in enumerate(resnet_torch_param_order(arch)):
        if idx < freeze_before and not tname.startswith("fc."):
            frozen.add(prefix + fpath)
    return frozen
