"""Export one of our epoch-N.ckpt checkpoints to a reference-format
epoch-N.pt — the REVERSE of tools/convert_reference_ckpt.py, making
checkpoint migration bidirectional.

    python tools/export_reference_ckpt.py \
        --ckpt checkpoint_.../cpt_.../epoch-12.ckpt \
        <the same flags the training run used>

The written .pt carries {model_state_dict, optimizer, rng_state,
cuda_rng_state, scaler_state} exactly as the reference's save_model does
(data_utils/utils.py:107-114), loadable by its run_test.py / resume with
strict=True state-dict semantics. For modal end2end exports the encoder
template (pooler rows + registered buffers our tree does not hold) comes
from the HF checkpoint under --pretrained_models_dir — the pooler was
frozen at those pretrained values during training, so they are exactly
right.

Caveats (documented, inherent): RNG streams do not transfer — rng_state /
cuda_rng_state carry fresh host-RNG bytes, so a torch-side resume draws
different dropout masks (the reference's own contract when changing
GPUs); on a CUDA host torch.cuda.set_rng_state may reject the
CPU-format placeholder — resume with --seed instead of RNG restore there.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _net_template(cfg):
    """The encoder net's torch state dict (pooler + buffers included) for
    modal end2end exports, mirroring the reference's encoder load
    (inbatch_sasrec_e2e_text/run.py:29-72, vision run.py:27-56)."""
    if not (cfg.use_modal and cfg.stage == "end2end"):
        return None
    path = os.path.join(cfg.pretrained_models_dir,
                        cfg.bert_model_load if cfg.modality == "text"
                        else cfg.cv_model_load)
    if cfg.modality == "text":
        name = cfg.bert_model_load
        if "roberta" in name:
            from transformers import RobertaModel as Cls
        elif "opt" in name:
            from transformers import OPTModel as Cls
        else:
            from transformers import BertModel as Cls
        if not os.path.isdir(path):
            raise SystemExit(
                f"text export needs the pretrained HF checkpoint under "
                f"{path} — its (frozen) pooler tensors and registered "
                f"buffers go into the exported state dict verbatim; a "
                f"config-init template would silently write RANDOM pooler "
                f"weights")
        net = Cls.from_pretrained(path)
        return net.state_dict()
    name = cfg.cv_model_load.replace("-", "_")
    if name.startswith("resnet"):
        # the torchvision .pth is a plain tensor dict — no torchvision
        # import needed
        import torch
        for cand in (os.path.join(path, f"{name}.pth"), path + ".pth"):
            if os.path.exists(cand):
                return torch.load(cand, map_location="cpu",
                                  weights_only=True)
        raise SystemExit(f"resnet export needs the torchvision .pth under "
                         f"{path} (its BN buffers form the template)")
    if "swin" in name:
        import torch.nn as nn
        from transformers import SwinForImageClassification
        if not os.path.isdir(path):
            raise SystemExit(
                f"swin export needs the pretrained HF checkpoint under "
                f"{path} (registered buffers form the template)")
        net = SwinForImageClassification.from_pretrained(path)
        net.classifier = nn.Linear(net.classifier.in_features,
                                   cfg.embedding_dim)
        return net.state_dict()
    if "mae" in name or "checkpoint" in name:
        from transformers import ViTMAEModel
        if not os.path.isdir(path):
            raise SystemExit(
                f"mae export needs the pretrained HF checkpoint under "
                f"{path}")
        return ViTMAEModel.from_pretrained(path).state_dict()
    raise SystemExit(f"unsupported cv_model_load for export: {name}")


def main(argv=None, net_template_sd=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--ckpt", required=True, help="our epoch-N.ckpt path")
    pre.add_argument("--out", default=None,
                     help="output .pt path or directory")
    ns, rest = pre.parse_known_args(argv)

    import numpy as np
    import torch
    import flax.serialization

    from idvs.morec_tpu.config import parse_args
    from idvs.morec_tpu.models.convert_ref import (composed_map,
                                                   export_model_state,
                                                   export_optimizer)
    from idvs.morec_tpu.train.checkpoint import epoch_from_name

    cfg = parse_args(rest)
    epoch = epoch_from_name(ns.ckpt)
    with open(ns.ckpt, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())

    if net_template_sd is None:
        net_template_sd = _net_template(cfg)
    model_sd = export_model_state(payload["params"], cfg, net_template_sd)
    pseudo = {k: np.asarray(v) for k, v in model_sd.items()}
    cmap = composed_map(cfg, pseudo)
    opt_sd = export_optimizer(payload["opt_state"], cfg, cmap,
                              step=int(np.asarray(payload["step"])))

    out = {
        "model_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                             for k, v in model_sd.items()},
        "optimizer": {
            "state": {i: {"step": torch.as_tensor(st["step"]),
                          "exp_avg": torch.from_numpy(
                              np.ascontiguousarray(st["exp_avg"])),
                          "exp_avg_sq": torch.from_numpy(
                              np.ascontiguousarray(st["exp_avg_sq"]))}
                      for i, st in opt_sd["state"].items()},
            "param_groups": opt_sd["param_groups"],
        },
        "rng_state": torch.get_rng_state(),
        "cuda_rng_state": torch.get_rng_state(),   # placeholder; see docstring
        "scaler_state": payload.get("scaler_state", {}),
    }
    dest = ns.out or os.path.dirname(os.path.abspath(ns.ckpt))
    if os.path.isdir(dest) or dest.endswith(os.sep):
        os.makedirs(dest, exist_ok=True)
        dest = os.path.join(dest, f"epoch-{epoch}.pt")
    torch.save(out, dest)
    print(f"wrote {dest}  (epoch {epoch}, "
          f"{len(model_sd)} tensors, {len(opt_sd['state'])} optimizer "
          f"entries)")
    return dest


if __name__ == "__main__":
    main()
