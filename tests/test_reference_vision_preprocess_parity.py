"""Executed VISION preprocessing parity vs the reference's own code.

The composed-loop parity test executes the TEXT preprocess path inside
run.py; this covers the vision one: the reference's read_images +
read_behaviors (inbatch_sasrec_e2e_vision/data_utils/preprocess.py:5-101 —
manifest -> int-round-tripped store keys; min-len filter; [-(L+3):]
truncation; interaction-count re-iding; leave-one-out split; histories;
pop_prob with the [1] sentinel) run side by side with read_image_manifest +
read_behaviors on identical TSVs, including a zero-padded item name
('v007' -> key b'7', the int round-trip) and items that appear only in the
manifest (dropped by the re-iding).

Note on neg_sampling_list: the reference returns it but NO variant ever
consumes it — every BCE dataset draws negatives uniformly with in-seq
rejection (bce_text/main-end2end/data_utils/dataset.py:34-37,
bce_vision/main-end2end/data_utils/dataset.py:49-51), which is exactly
sample_negatives' semantics; the test asserts the pool's composition anyway
(it equals the concatenation of surviving user sequences).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _ref_harness import REF_ROOT, null_logger, t2n
from idvs.morec_tpu.data.preprocess import read_behaviors, read_image_manifest

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference repo not mounted")


def _load_ref_preprocess(tag: str):
    """preprocess.py imports only numpy/torch — load it standalone (the
    package __init__ would drag in dataset.py's lmdb/torchvision)."""
    path = os.path.join(REF_ROOT, "inbatch_sasrec_e2e_vision", "data_utils",
                        "preprocess.py")
    spec = importlib.util.spec_from_file_location(f"_ref_vis_prep_{tag}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"_ref_vis_prep_{tag}"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_vision_preprocess_chain_parity(tmp_path):
    prep = _load_ref_preprocess("p1")
    rng = np.random.default_rng(81)
    L, MIN = 6, 3
    # 12 catalog items incl. a zero-padded name; 2 never interacted with
    names = [f"v{k}" for k in range(1, 11)] + ["v007", "v12"]
    manifest = tmp_path / "images.tsv"
    manifest.write_text("\n".join(f"{n}\tunused_url" for n in names) + "\n")

    lines = []
    for u in range(9):
        n = int(rng.integers(1, L + 6))   # some below min_seq_len
        seq = rng.choice(names[:10] + ["v007"], size=n)
        lines.append(f"u{u}\t" + " ".join(seq))
    behaviors = tmp_path / "behaviors.tsv"
    behaviors.write_text("\n".join(lines) + "\n")

    r_keys, r_n2i, r_i2n = prep.read_images(str(manifest))
    o_keys, o_n2i, o_i2n = read_image_manifest(str(manifest))
    assert o_keys == r_keys          # incl. 'v007' -> b'7'
    assert o_n2i == r_n2i and o_i2n == r_i2n
    assert r_keys[r_n2i["v007"]] == b"7"

    log = null_logger()
    (r_item_num, r_id_keys, r_train, r_valid, r_test, r_hv, r_ht, r_name2id,
     r_negpool, r_pop) = prep.read_behaviors(str(behaviors), r_keys, r_n2i,
                                             r_i2n, L, MIN, log)
    bd = read_behaviors(str(behaviors), o_keys, o_n2i, o_i2n, L, MIN, log)

    assert bd.item_num == r_item_num
    assert bd.item_id_to_dic == r_id_keys        # store keys, re-ided
    assert bd.item_name_to_id == r_name2id
    assert bd.users_train == r_train
    assert bd.users_valid == r_valid
    assert bd.users_test == r_test
    for u in r_hv:
        np.testing.assert_array_equal(bd.users_history_for_valid[u],
                                      t2n(r_hv[u]))
        np.testing.assert_array_equal(bd.users_history_for_test[u],
                                      t2n(r_ht[u]))
    np.testing.assert_allclose(bd.pop_prob_list, np.asarray(r_pop),
                               rtol=1e-12, atol=0)
    # the (unconsumed) reference neg pool == concat of surviving sequences
    flat = [i for u in sorted(r_train) for i in
            (r_train[u] + [r_valid[u][-1], r_test[u][-1]])]
    assert sorted(r_negpool) == sorted(flat)
