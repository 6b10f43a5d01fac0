"""Modality-encoder factory: builds the Flax encoder module for end2end MoRec
and loads/converts pretrained weights from the same HF checkpoints the
reference uses (inbatch_sasrec_e2e_text/run.py:29-72,
inbatch_sasrec_e2e_vision/run.py:27-56).

Returns an `encoder bundle`: (module, converted_params_or_None, frozen_paths,
word_embedding_dim). The module maps content -> (N, embedding_dim) and nests
the pretrained net under a submodule named 'net' (the optimizer's fine-tune
group predicate keys off that, train/state.py).
"""

from __future__ import annotations

import os

# Hidden sizes + pooler parameter indices per model size
# (reference run.py:36-72 hard-codes these per bert_model_load name).
TEXT_MODEL_TABLE = {
    "tiny":   dict(word_dim=128,  pooler=(37, 38)),
    "mini":   dict(word_dim=256,  pooler=(69, 70)),
    "small":  dict(word_dim=512,  pooler=(69, 70)),
    "medium": dict(word_dim=512,  pooler=(133, 134)),
    "base":   dict(word_dim=768,  pooler=(197, 198)),
    "large":  dict(word_dim=1024, pooler=(389, 390)),
}


def text_model_spec(bert_model_load: str) -> dict:
    for key, spec in TEXT_MODEL_TABLE.items():
        if key in bert_model_load:
            return spec
    return dict(word_dim=768, pooler=())


def load_tokenizer(cfg):
    """HF tokenizer for offline catalog tokenization (host-side only)."""
    from transformers import AutoTokenizer
    path = os.path.join(cfg.pretrained_models_dir, cfg.bert_model_load)
    if not os.path.isdir(path):
        path = cfg.bert_model_load  # hub name fallback
    tok = AutoTokenizer.from_pretrained(path)
    if tok.pad_token is None:     # GPT2-style tokenizers (OPT) may lack one
        tok.pad_token = tok.eos_token or tok.unk_token
    return tok


def load_encoder(cfg, axis_name=None):
    """Build (module, params, frozen_paths, word_dim) for cfg's modality.

    axis_name: data-parallel mesh axis for cross-replica BatchNorm stats
    (ResNet towers; the reference's SyncBatchNorm, vision run.py:128)."""
    if cfg.modality == "text":
        from .text_tower import build_text_tower
        return build_text_tower(cfg)
    from .vision_tower import build_vision_tower
    return build_vision_tower(cfg, axis_name=axis_name)
