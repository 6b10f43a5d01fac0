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


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--pt", required=True,
                     help="reference epoch-N.pt checkpoint path")
    pre.add_argument("--out", default=None,
                     help="output .ckpt path or directory "
                          "(default: alongside the .pt)")
    ns, rest = pre.parse_known_args(argv)

    from idvs.morec_tpu.config import parse_args
    from idvs.morec_tpu.models.convert_ref import convert_reference_checkpoint
    from idvs.morec_tpu.train.checkpoint import epoch_from_name

    cfg = parse_args(rest)
    epoch = epoch_from_name(ns.pt)

    import torch
    payload = torch.load(ns.pt, map_location="cpu", weights_only=False)

    ckpt = convert_reference_checkpoint(payload, cfg, epoch)

    out = ns.out or os.path.dirname(os.path.abspath(ns.pt))
    if os.path.isdir(out) or out.endswith(os.sep):
        os.makedirs(out, exist_ok=True)
        out = os.path.join(out, f"epoch-{epoch}.ckpt")
    import flax.serialization
    with open(out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(ckpt))
    n = sum(x.size for x in _leaves(ckpt["params"]))
    print(f"wrote {out}  (epoch {epoch}, step {int(ckpt['step'])}, "
          f"{n} weights)")
    return out


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif hasattr(tree, "size"):
        yield tree


if __name__ == "__main__":
    main()
