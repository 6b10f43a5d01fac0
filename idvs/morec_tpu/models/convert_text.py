"""HF torch checkpoint -> Flax param-tree conversion for text encoders, plus
the index-based freeze-mask mapping.

The reference freezes HF parameters by their position in
model.named_parameters() (run.py:73-75: index < freeze_paras_before, plus the
pooler indices). We reproduce that exactly by generating the torch parameter
order for our architecture and mapping each index to its Flax param path.

torch named_parameters() order for BertModel:
  0-4: embeddings (word, position, token_type, LayerNorm.weight, .bias)
  per layer (16): q.w q.b k.w k.b v.w v.b att.out.w att.out.b att.LN.w
                  att.LN.b inter.w inter.b out.w out.b out.LN.w out.LN.b
  tail: pooler.dense.weight, pooler.dense.bias
  -> bert-base: 5 + 12*16 = 197 => pooler (197,198), matching run.py:67-69.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np


def _t(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def bert_torch_param_order(num_layers: int) -> List[Tuple[str, Tuple[str, ...]]]:
    """[(torch_name, flax_path)] in torch named_parameters() order.

    flax_path is relative to the BertModel param root; pooler entries map to
    None (not ported — frozen and unused in the reference)."""
    order: List[Tuple[str, Optional[Tuple[str, ...]]]] = [
        ("embeddings.word_embeddings.weight", ("word_embeddings", "embedding")),
        ("embeddings.position_embeddings.weight", ("position_embeddings", "embedding")),
        ("embeddings.token_type_embeddings.weight", ("token_type_embeddings", "embedding")),
        ("embeddings.LayerNorm.weight", ("embeddings_ln", "scale")),
        ("embeddings.LayerNorm.bias", ("embeddings_ln", "bias")),
    ]
    for i in range(num_layers):
        L = f"layer_{i}"
        t = f"encoder.layer.{i}."
        order += [
            (t + "attention.self.query.weight", (L, "attention_self", "query", "kernel")),
            (t + "attention.self.query.bias",   (L, "attention_self", "query", "bias")),
            (t + "attention.self.key.weight",   (L, "attention_self", "key", "kernel")),
            (t + "attention.self.key.bias",     (L, "attention_self", "key", "bias")),
            (t + "attention.self.value.weight", (L, "attention_self", "value", "kernel")),
            (t + "attention.self.value.bias",   (L, "attention_self", "value", "bias")),
            (t + "attention.output.dense.weight", (L, "attention_output", "kernel")),
            (t + "attention.output.dense.bias",   (L, "attention_output", "bias")),
            (t + "attention.output.LayerNorm.weight", (L, "attention_ln", "scale")),
            (t + "attention.output.LayerNorm.bias",   (L, "attention_ln", "bias")),
            (t + "intermediate.dense.weight", (L, "intermediate", "kernel")),
            (t + "intermediate.dense.bias",   (L, "intermediate", "bias")),
            (t + "output.dense.weight", (L, "output", "kernel")),
            (t + "output.dense.bias",   (L, "output", "bias")),
            (t + "output.LayerNorm.weight", (L, "output_ln", "scale")),
            (t + "output.LayerNorm.bias",   (L, "output_ln", "bias")),
        ]
    order += [("pooler.dense.weight", None), ("pooler.dense.bias", None)]
    return order


def convert_bert_state_dict(state_dict: Dict[str, "np.ndarray"],
                            num_layers: int) -> Dict:
    """torch state_dict (tensors or numpy) -> nested flax params dict."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {}

    def put(path: Tuple[str, ...], value: np.ndarray):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    for torch_name, flax_path in bert_torch_param_order(num_layers):
        if flax_path is None:
            continue
        if torch_name not in sd:
            # some checkpoints use the 'bert.'/'roberta.' prefix
            for pref in ("bert.", "roberta."):
                if pref + torch_name in sd:
                    torch_name = pref + torch_name
                    break
            else:
                raise KeyError(f"missing checkpoint tensor: {torch_name}")
        v = sd[torch_name]
        if flax_path[-1] == "kernel":
            v = _t(v)
        put(flax_path, np.asarray(v, np.float32))
    return out


def bert_frozen_paths(num_layers: int, freeze_before: int,
                      prefix: Tuple[str, ...] = ()) -> Set[Tuple[str, ...]]:
    """Flax param paths frozen under the reference's index rule
    (index < freeze_before; pooler entries aren't in the tree at all)."""
    frozen = set()
    for idx, (_name, flax_path) in enumerate(bert_torch_param_order(num_layers)):
        if flax_path is None:
            continue
        if idx < freeze_before:
            frozen.add(prefix + flax_path)
    return frozen


def load_torch_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read pytorch_model.bin or model.safetensors into numpy arrays."""
    import os
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        return load_file(st_path)
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    import torch
    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


# ----------------------------------------------------------------- DistilBERT
# HF DistilBertModel (reference run.py:9 imports it in every text variant but
# the bert_model_load dispatch never reaches it — supported here anyway).
# Same post-LN block as BERT; torch names differ (q_lin/k_lin/v_lin/out_lin,
# sa_layer_norm, ffn.lin1/lin2, output_layer_norm), no token-type table and
# no pooler. The flax tree is BertModel's (type_vocab_size=0).

def distilbert_torch_param_order(num_layers: int
                                 ) -> List[Tuple[str, Tuple[str, ...]]]:
    """[(torch_name, flax_path)] in DistilBertModel.named_parameters()
    order (embeddings: word, position, LayerNorm w/b — no token_type)."""
    order: List[Tuple[str, Optional[Tuple[str, ...]]]] = [
        ("embeddings.word_embeddings.weight",
         ("word_embeddings", "embedding")),
        ("embeddings.position_embeddings.weight",
         ("position_embeddings", "embedding")),
        ("embeddings.LayerNorm.weight", ("embeddings_ln", "scale")),
        ("embeddings.LayerNorm.bias", ("embeddings_ln", "bias")),
    ]
    for i in range(num_layers):
        L = f"layer_{i}"
        t = f"transformer.layer.{i}."
        order += [
            (t + "attention.q_lin.weight", (L, "attention_self", "query", "kernel")),
            (t + "attention.q_lin.bias",   (L, "attention_self", "query", "bias")),
            (t + "attention.k_lin.weight", (L, "attention_self", "key", "kernel")),
            (t + "attention.k_lin.bias",   (L, "attention_self", "key", "bias")),
            (t + "attention.v_lin.weight", (L, "attention_self", "value", "kernel")),
            (t + "attention.v_lin.bias",   (L, "attention_self", "value", "bias")),
            (t + "attention.out_lin.weight", (L, "attention_output", "kernel")),
            (t + "attention.out_lin.bias",   (L, "attention_output", "bias")),
            (t + "sa_layer_norm.weight", (L, "attention_ln", "scale")),
            (t + "sa_layer_norm.bias",   (L, "attention_ln", "bias")),
            (t + "ffn.lin1.weight", (L, "intermediate", "kernel")),
            (t + "ffn.lin1.bias",   (L, "intermediate", "bias")),
            (t + "ffn.lin2.weight", (L, "output", "kernel")),
            (t + "ffn.lin2.bias",   (L, "output", "bias")),
            (t + "output_layer_norm.weight", (L, "output_ln", "scale")),
            (t + "output_layer_norm.bias",   (L, "output_ln", "bias")),
        ]
    return order


def convert_distilbert_state_dict(state_dict: Dict[str, "np.ndarray"],
                                  num_layers: int) -> Dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {}

    def put(path: Tuple[str, ...], value: np.ndarray):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    for torch_name, flax_path in distilbert_torch_param_order(num_layers):
        if torch_name not in sd:
            if "distilbert." + torch_name in sd:
                torch_name = "distilbert." + torch_name
            else:
                raise KeyError(f"missing checkpoint tensor: {torch_name}")
        v = sd[torch_name]
        if flax_path[-1] == "kernel":
            v = _t(v)
        put(flax_path, np.asarray(v, np.float32))
    return out


def distilbert_frozen_paths(num_layers: int, freeze_before: int,
                            prefix: Tuple[str, ...] = ()
                            ) -> Set[Tuple[str, ...]]:
    frozen = set()
    for idx, (_n, flax_path) in enumerate(
            distilbert_torch_param_order(num_layers)):
        if idx < freeze_before:
            frozen.add(prefix + flax_path)
    return frozen
