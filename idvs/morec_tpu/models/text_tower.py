"""Text item tower: packed [ids || attmask] catalog rows -> item embeddings.

Reference semantics (inbatch_sasrec_e2e_text/model/encoders.py:31-117):
- content row = attributes concatenated, each attribute packed
  [input_ids || attention_mask] side by side
- per attribute: run the LM, pool CLS (BERT/RoBERTa) or masked mean (OPT),
  Dense(word_dim -> embedding_dim), GELU
- multiple attributes share ONE text encoder ('title') and their vectors are
  averaged (encoders.py:107-117)
- two-stage mode returns the raw pooled hidden instead
  (bce_text/main-2stage(SASRec)/model/encoders.py:79-95)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import xavier_normal, zeros_init


class TextTower(nn.Module):
    net: nn.Module                   # pretrained LM (the fine-tune group keys
                                     # off this submodule name, train/state.py)
    embedding_dim: int
    word_embedding_dim: int
    pooling: str = "cls"             # 'cls' | 'mean'
    attr_lengths: Sequence[int] = (30,)   # token length per attribute
    project: bool = True             # False = two-stage raw hidden output

    def setup(self):
        if self.project:
            self.fc = nn.Dense(self.embedding_dim, kernel_init=xavier_normal,
                               bias_init=zeros_init, name="fc")

    def _pool(self, hidden, attmask):
        if self.pooling == "cls":
            return hidden[:, 0]
        m = attmask[:, :, None].astype(hidden.dtype)
        return (hidden * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1e-9)

    def _encode_attr(self, packed, deterministic):
        num_words = packed.shape[1] // 2
        ids = packed[:, :num_words]
        attmask = packed[:, num_words:]
        hidden = self.net(ids, attmask, deterministic)
        pooled = self._pool(hidden, attmask)
        if self.project:
            pooled = nn.gelu(self.fc(pooled), approximate=False)
        return pooled

    def __call__(self, content, deterministic: bool = True):
        vecs = []
        start = 0
        for ln in self.attr_lengths:
            vecs.append(self._encode_attr(content[:, start:start + 2 * ln],
                                          deterministic))
            start += 2 * ln
        if len(vecs) == 1:
            return vecs[0]
        return jnp.mean(jnp.stack(vecs, axis=1), axis=1)


def build_text_tower(cfg):
    """Encoder bundle for end2end text MoRec: (module, converted_params,
    frozen_paths, word_dim). Reads HF config + weights from
    cfg.pretrained_models_dir/cfg.bert_model_load (reference run.py:29-72).
    """
    import os
    from transformers import AutoConfig

    from .bert import BertConfig, BertModel
    from .convert_text import (bert_frozen_paths, convert_bert_state_dict,
                               load_torch_state_dict)

    name = cfg.bert_model_load
    path = os.path.join(cfg.pretrained_models_dir, name)
    if not os.path.isdir(path):
        path = name
    hf_cfg = AutoConfig.from_pretrained(path)
    if "opt" in name:
        from .opt import OPTConfig, OPTModel
        ocfg = OPTConfig.from_hf(hf_cfg)
        net = OPTModel(ocfg)
        word_dim = ocfg.hidden_size
        pooling = "mean"   # reference uses Text_Encoder_mean for OPT
        from .convert_text import load_torch_state_dict
        from .opt import convert_opt_state_dict, opt_frozen_paths
        params = None
        try:
            sd = load_torch_state_dict(path)
            params = {"params": convert_opt_state_dict(sd, ocfg.num_hidden_layers)}
        except (FileNotFoundError, OSError):
            pass
        frozen = opt_frozen_paths(ocfg.num_hidden_layers, cfg.freeze_paras_before,
                                  prefix=("encoder", "net"))
    elif hf_cfg.model_type == "deberta":
        # same story as DistilBERT: imported by every reference text
        # variant, unreachable through its dispatch — supported here
        from .deberta import (DebertaConfig, DebertaModel,
                              convert_deberta_state_dict,
                              deberta_frozen_paths)
        dcfg = DebertaConfig.from_hf(hf_cfg)
        net = DebertaModel(dcfg)
        word_dim = dcfg.hidden_size
        pooling = "cls"
        params = None
        try:
            sd = load_torch_state_dict(path)
            params = {"params": convert_deberta_state_dict(
                sd, dcfg.num_hidden_layers, dcfg.num_attention_heads)}
        except (FileNotFoundError, OSError):
            pass
        frozen = deberta_frozen_paths(dcfg.num_hidden_layers,
                                      cfg.freeze_paras_before,
                                      prefix=("encoder", "net"))
    elif hf_cfg.model_type == "distilbert":
        # imported by every reference text variant (run.py:9) though its
        # bert_model_load dispatch never reaches it — supported here: same
        # flax module (type_vocab_size=0), own torch-name/freeze-order maps
        from .convert_text import (convert_distilbert_state_dict,
                                   distilbert_frozen_paths)
        bcfg = BertConfig.from_hf(hf_cfg)
        net = BertModel(bcfg)
        word_dim = bcfg.hidden_size
        pooling = "cls"
        params = None
        try:
            sd = load_torch_state_dict(path)
            params = {"params": convert_distilbert_state_dict(
                sd, bcfg.num_hidden_layers)}
        except (FileNotFoundError, OSError):
            pass
        frozen = distilbert_frozen_paths(bcfg.num_hidden_layers,
                                         cfg.freeze_paras_before,
                                         prefix=("encoder", "net"))
    else:
        bcfg = BertConfig.from_hf(hf_cfg)
        net = BertModel(bcfg)
        word_dim = bcfg.hidden_size
        pooling = "cls"
        params = None
        try:
            sd = load_torch_state_dict(path)
            params = {"params": convert_bert_state_dict(sd, bcfg.num_hidden_layers)}
        except (FileNotFoundError, OSError):
            pass
        frozen = bert_frozen_paths(bcfg.num_hidden_layers,
                                   cfg.freeze_paras_before,
                                   prefix=("encoder", "net"))

    attr_lengths = []
    for attr, n in (("title", cfg.num_words_title),
                    ("abstract", cfg.num_words_abstract),
                    ("body", cfg.num_words_body)):
        if attr in cfg.news_attributes:
            attr_lengths.append(n)
    if getattr(cfg, "text_pooling", ""):
        # explicit override (reference default: CLS for BERT/RoBERTa, masked
        # mean for OPT — encoders.py:41-50,63-70)
        pooling = cfg.text_pooling
    tower = TextTower(net=net, embedding_dim=cfg.embedding_dim,
                      word_embedding_dim=word_dim, pooling=pooling,
                      attr_lengths=tuple(attr_lengths),
                      project=(cfg.stage == "end2end"))
    return tower, params, frozen, word_dim
