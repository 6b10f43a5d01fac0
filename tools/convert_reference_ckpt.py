"""Convert a reference torch checkpoint (epoch-N.pt) to this framework's
epoch-N.ckpt.

The reference's test/resume workflow is checkpoint-driven
(inbatch_sasrec_e2e_text/run_test.py:111-123 loads `epoch-N.pt`;
data_utils/utils.py:107-114 writes it). A user migrating mid-project runs:

    python tools/convert_reference_ckpt.py \
        --pt  checkpoint_.../cpt_.../epoch-12.pt \
        --out checkpoint_.../cpt_.../          \
        <the SAME flags the reference training command used>

e.g. for the flagship text MoRec run:
        --item_tower modal --modality text --bert_model_load bert_base_uncased \
        --freeze_paras_before 165 --embedding_dim 512 ...

The flags select the variant/geometry (the .pt itself does not record them —
the reference re-creates the model from flags too). The converted file drops
in as --load_ckpt_name epoch-N.ckpt for `--mode test` or resume. Torch RNG
streams do not transfer (the resumed run's dropout draws differ — same
contract as a hardware change); model weights and AdamW moments transfer
exactly. See idvs/morec_tpu/models/convert_ref.py for the mapping.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _convert_one(pt_path, cfg, out_dir):
    import re

    import torch
    import flax.serialization

    from idvs.morec_tpu.models.convert_ref import convert_reference_checkpoint
    from idvs.morec_tpu.train.checkpoint import epoch_from_name

    epoch = epoch_from_name(pt_path)
    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    ckpt = convert_reference_checkpoint(payload, cfg, epoch)
    out = out_dir or os.path.dirname(os.path.abspath(pt_path))
    if os.path.isdir(out) or out.endswith(os.sep):
        os.makedirs(out, exist_ok=True)
        out = os.path.join(out, f"epoch-{epoch}.ckpt")
    with open(out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(ckpt))
    n = sum(x.size for x in _leaves(ckpt["params"]))
    print(f"wrote {out}  (epoch {epoch}, step {int(ckpt['step'])}, "
          f"{n} weights)")
    return out


def main(argv=None):
    import re

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--pt", required=True,
                     help="reference epoch-N.pt checkpoint path, or a "
                          "checkpoint DIRECTORY (cpt_<hparams>/) — a "
                          "directory converts every epoch-N.pt in it")
    pre.add_argument("--out", default=None,
                     help="output .ckpt path or directory "
                          "(default: alongside the .pt)")
    ns, rest = pre.parse_known_args(argv)

    from idvs.morec_tpu.config import parse_args

    cfg = parse_args(rest)
    if os.path.isdir(ns.pt):
        pts = sorted(
            (os.path.join(ns.pt, f) for f in os.listdir(ns.pt)
             if re.match(r"epoch-\d+\.pt$", f)),
            key=lambda p: int(re.findall(r"\d+", os.path.basename(p))[0]))
        if not pts:
            raise SystemExit(f"no epoch-N.pt files in {ns.pt}")
        outs = [_convert_one(p, cfg, ns.out or ns.pt) for p in pts]
        return outs[-1]
    return _convert_one(ns.pt, cfg, ns.out)


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif hasattr(tree, "size"):
        yield tree


if __name__ == "__main__":
    main()
