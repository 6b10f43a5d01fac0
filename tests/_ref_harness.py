"""Shared helpers for executing the reference's own torch code in tests.

Used by test_reference_torch_parity.py (train-step parity) and
test_reference_eval_parity.py (eval-chain + composed-loop parity). The
reference variants are self-contained mini-packages; these loaders import
them in isolation (unique module names per call) so 'model'/'data_utils'
collisions between variants never happen.
"""

import importlib.util
import logging
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


# ------------------------------------------------------------- module loading
def load_ref_package(variant_rel: str, subpkg: str, tag: str):
    """Import <variant>/<subpkg> as an isolated package and return it."""
    d = os.path.join(REF_ROOT, variant_rel, subpkg)
    pkg_name = f"_refpkg_{subpkg}_{tag}"
    spec = importlib.util.spec_from_file_location(
        pkg_name, os.path.join(d, "__init__.py"),
        submodule_search_locations=[d])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[pkg_name] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def load_ref_model_class(variant_rel: str, tag: str):
    """Import <variant>/model and return its Model class."""
    return load_ref_package(variant_rel, "model", tag).Model


def load_ref_metrics(variant_rel: str, tag: str):
    """Import <variant>/data_utils and return its metrics module
    (inbatch_sasrec_e2e_text/data_utils/metrics.py:33-107)."""
    pkg = load_ref_package(variant_rel, "data_utils", tag)
    return sys.modules[f"_refpkg_data_utils_{tag}.metrics"]


_REF_TOPLEVEL = ("parameters", "model", "data_utils")


def load_ref_run(variant_rel: str, tag: str, filename: str = "run.py"):
    """Import <variant>/<filename> (default run.py — the reference's real
    train orchestrator, inbatch_sasrec_e2e_text/run.py:26-314; pass
    'run_test.py' for the test orchestrator) as an isolated module.

    The file imports its siblings by bare name ('from model import Model'),
    so the variant dir goes on sys.path for the import and the polluted
    top-level names are purged afterwards (they'd collide across variants).
    """
    d = os.path.join(REF_ROOT, variant_rel)
    saved = {}
    for k in list(sys.modules):
        if k in _REF_TOPLEVEL or k.split(".")[0] in _REF_TOPLEVEL:
            saved[k] = sys.modules.pop(k)
    sys.path.insert(0, d)
    try:
        spec = importlib.util.spec_from_file_location(
            f"_ref_run_{tag}", os.path.join(d, filename))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_ref_run_{tag}"] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(d)
        for k in list(sys.modules):
            if k in _REF_TOPLEVEL or k.split(".")[0] in _REF_TOPLEVEL:
                del sys.modules[k]
        sys.modules.update(saved)
    return mod


class NullScaler:
    """torch.cuda.amp.GradScaler stand-in for the CPU-executed reference
    loop (run.py:210,242-247): float32 pass-through, no scaling."""

    def scale(self, loss):
        return loss

    def step(self, optimizer):
        optimizer.step()

    def update(self):
        pass

    def state_dict(self):
        return {}

    def load_state_dict(self, sd):
        pass


def patch_cuda_free(monkeypatch, run_mod, tmpdir, args, log=None):
    """Make the reference train() executable on CPU: DDP passthrough,
    no-op autocast/GradScaler, cpu RNG in place of cuda RNG, globals the
    reference's __main__ block would have set (run.py:317-349)."""
    import contextlib

    import torch

    monkeypatch.setattr(run_mod, "DDP", DDPShim)
    monkeypatch.setattr(torch.cuda.amp, "autocast",
                        lambda *a, **k: contextlib.nullcontext(),
                        raising=False)
    monkeypatch.setattr(torch.cuda.amp, "GradScaler",
                        lambda *a, **k: NullScaler(), raising=False)
    monkeypatch.setattr(torch.cuda, "get_rng_state", torch.get_rng_state,
                        raising=False)
    monkeypatch.setattr(torch.cuda, "set_rng_state", lambda *a, **k: None,
                        raising=False)
    import time

    log = log or null_logger("ref_run_log")
    run_mod.Log_file = log
    run_mod.Log_screen = log
    run_mod.args = args
    run_mod.model_dir = str(tmpdir)
    run_mod.start_time = time.time()


# ------------------------------------------------------------------ dist shim
def ensure_single_rank_group(port: int = 29531):
    """Initialize a REAL single-rank gloo process group so the reference's
    torch.distributed calls (SequentialDistributedSampler world-size query,
    distributed_concat all_gather, DistributedSampler, para_and_log) execute
    their genuine code paths on CPU."""
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method=f"tcp://127.0.0.1:{port}",
            world_size=1, rank=0)


class FakeDist:
    """Single-rank stand-in for torch.distributed inside reference modules.

    distributed_concat (metrics.py:33-37) calls get_world_size + all_gather;
    with one rank the gather is an identity copy.
    """

    @staticmethod
    def get_world_size():
        return 1

    @staticmethod
    def get_rank():
        return 0

    @staticmethod
    def all_gather(output_tensors, tensor):
        output_tensors[0].copy_(tensor)

    @staticmethod
    def is_available():
        return True

    @staticmethod
    def is_initialized():
        return True

    @staticmethod
    def barrier():
        pass


class DDPShim:
    """Minimal DistributedDataParallel stand-in: exposes .module and forwards
    calls (the reference accesses model.module.<tower> during eval,
    metrics.py:68-71,95, and wraps forward for training, run.py:148)."""

    def __init__(self, module, **kwargs):
        self.module = module

    def __call__(self, *a, **k):
        return self.module(*a, **k)

    def eval(self):
        self.module.eval()
        return self

    def train(self, mode=True):
        self.module.train(mode)
        return self

    def parameters(self):
        return self.module.parameters()

    def named_parameters(self):
        return self.module.named_parameters()

    def state_dict(self):
        return self.module.state_dict()

    def load_state_dict(self, sd):
        return self.module.load_state_dict(sd)


def null_logger(name: str = "ref_parity_null"):
    log = logging.getLogger(name)
    log.addHandler(logging.NullHandler())
    log.propagate = False
    return log


# ---------------------------------------------------------------- args + nets
def ref_args(L=8, D=16, HEADS=2, BLOCKS=2, **over):
    base = dict(max_seq_len=L, embedding_dim=D, num_attention_heads=HEADS,
                drop_rate=0.0, transformer_block=BLOCKS,
                num_words_title=8, num_words_abstract=8, num_words_body=8,
                news_attributes=["title"], bert_model_load="bert-tiny",
                word_embedding_dim=24, dnn_layers=0, neg_num=2,
                num_workers=0)
    base.update(over)
    return types.SimpleNamespace(**base)


def t2n(x):
    # .numpy() shares memory with the tensor — copy so snapshots taken before
    # the torch optimizer runs are not mutated by its in-place updates
    return x.detach().cpu().numpy().copy()


def sasrec_params_from_torch(user_encoder) -> dict:
    """reference User_Encoder (model/encoders.py:7-28, modules.py:34-96)
    -> our SASRecEncoder param subtree."""
    import torch

    te = user_encoder.transformer_encoder
    p = {
        "position_embedding": {"embedding": t2n(te.position_embedding.weight)},
        "ln_in": {"scale": t2n(te.layer_norm.weight),
                  "bias": t2n(te.layer_norm.bias)},
    }
    for i, blk in enumerate(te.transformer_blocks):
        mha, ff = blk.multi_head_attention, blk.feed_forward
        p[f"block_{i}"] = {
            "mha": {n: {"kernel": t2n(getattr(mha, n).weight).T}
                    for n in ("w_Q", "w_K", "w_V", "fc")},
            "ln_attn": {"scale": t2n(mha.layer_norm.weight),
                        "bias": t2n(mha.layer_norm.bias)},
            "w_1": {"kernel": t2n(ff.w_1.weight).T, "bias": t2n(ff.w_1.bias)},
            "w_2": {"kernel": t2n(ff.w_2.weight).T, "bias": t2n(ff.w_2.bias)},
            "ln_ffn": {"scale": t2n(ff.layer_norm.weight),
                       "bias": t2n(ff.layer_norm.bias)},
        }
    return p


def mlp_params_from_torch(mlp_encoder) -> dict:
    """reference MLP_Encoder -> our MLPEncoder subtree ({} when identity)."""
    import torch

    if mlp_encoder.dnn_layers == 0:
        return {}
    linears = [m for m in mlp_encoder.MLP.mlp_layers
               if isinstance(m, torch.nn.Linear)]
    return {"mlp": {f"Dense_{i}": {"kernel": t2n(m.weight).T,
                                   "bias": t2n(m.bias)}
                    for i, m in enumerate(linears)}}


# --------------------------------------------------------------- synth users
def make_user_sequences(rng, n_users: int, item_num: int, max_seq_len: int,
                        min_len: int = 5):
    """Full user sequences + the reference's leave-one-out split artifacts
    (preprocess.py:52-67): users_train / users_valid / histories."""
    L = max_seq_len
    users_train, users_valid, users_test = {}, {}, {}
    hist_valid, hist_test = {}, {}
    for uid in range(n_users):
        n = int(rng.integers(min_len, L + 3 + 1))
        seq = rng.integers(1, item_num + 1, size=n).tolist()
        users_train[uid] = seq[:-2]
        users_valid[uid] = seq[-(L + 2):-1]
        users_test[uid] = seq[-(L + 1):]
        hist_valid[uid] = np.asarray(seq[:-2], dtype=np.int64)
        hist_test[uid] = np.asarray(seq[:-1], dtype=np.int64)
    return users_train, users_valid, users_test, hist_valid, hist_test
