"""Reference torch checkpoint (.pt) -> framework checkpoint conversion.

The reference's whole test/resume workflow is checkpoint-driven: its
run_test.py loads `epoch-N.pt` (inbatch_sasrec_e2e_text/run_test.py:111-123)
written by data_utils/utils.py:107-114 as
{model_state_dict, optimizer, rng_state, cuda_rng_state, scaler_state}.
This module maps that payload onto this framework's structures so a user
migrating mid-project keeps their trained artifacts:

- model_state_dict  -> the RecModel 'params' (+ 'batch_stats') collections
- optimizer         -> the optax AdamW mu/nu moment trees + step counts.
  torch AdamW state keys are POSITIONS in the reference's param-group
  construction (fine-tune group then recsys group over requires_grad
  named_parameters, inbatch_sasrec_e2e_text/run.py:150-162; vision rule with
  the fc/classifier exception, inbatch_sasrec_e2e_vision/run.py:120-135;
  plain `model.parameters()` for IDRec/two-stage, run.py:191) — the maps
  below reproduce that ordering exactly.
- rng_state / cuda_rng_state: torch Mersenne/Philox streams cannot seed JAX
  threefry. The converted checkpoint carries a fresh deterministic PRNG key
  (seed + epoch), so the resumed run's dropout draws differ from the torch
  continuation — the same contract as moving a run to different hardware.

Composed name maps follow each reference Model's REGISTRATION order (that is
what named_parameters(), and hence optimizer indexing and index-based
freezing, key off):
- SASRec Models register [user_encoder, bert_encoder|cv_encoder|id_embedding]
  (inbatch_sasrec_e2e_text/model/model.py:16-28)
- the 2stage Model registers [fc(MLP_Layers: mlp_layers THEN fc),
  user_encoder] (bce_text/main-2stage(SASRec)/model/model.py:14-25,
  encoders.py:7-18)
- DSSM registers [user_embedding, user_encoder(MLP_Encoder),
  bert|cv | id_embedding+id_encoder]
  (bce_text/main-end2end(DSSM)/model/model.py:16-29)
- id_plus_mo end2end registers [user_encoder, bert|cv_encoder, fc(ADD/CAT),
  id_embedding] (bce_text/id_plus_mo-end2end/model/model.py:15-39)
- id_plus_mo 2stage registers [user_encoder, turn_dim(FC_Layers: fc THEN
  mlp_layers), fc(CAT), mlp_layers, id_embedding]
  (bce_text/id_plus_mo-2stage/model/model.py:17-44, encoders.py:45-78)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

FlaxPath = Optional[Tuple[str, ...]]


@dataclass
class Entry:
    """One reference named_parameters() row."""
    torch_name: str
    flax_path: FlaxPath          # full path under 'params'; None = unported
    requires_grad: bool = True


@dataclass
class ComposedMap:
    entries: List[Entry]
    # encoder-net conversion: (sub_sd with the net prefix stripped) ->
    # (params subtree under ('encoder','net'), batch_stats subtree or None)
    net_prefix: Optional[str] = None
    net_convert: Optional[Callable] = None
    # generic entries OUTSIDE the encoder net (converted by kernel-transpose)
    plain_entries: List[Entry] = field(default_factory=list)


# --------------------------------------------------------------- sub-modules
def sasrec_entries(n_blocks: int,
                   torch_prefix: str = "user_encoder.transformer_encoder.",
                   flax_prefix: Tuple[str, ...] = ("user_encoder",)
                   ) -> List[Entry]:
    """reference User_Encoder/TransformerEncoder registration order
    (inbatch_sasrec_e2e_text/model/modules.py:80-88: position_embedding,
    layer_norm, transformer_blocks; per block: multi_head_attention
    [w_Q,w_K,w_V,fc,layer_norm], feed_forward [w_1,w_2,layer_norm])."""
    tp, fp = torch_prefix, flax_prefix
    out = [
        Entry(tp + "position_embedding.weight",
              fp + ("position_embedding", "embedding")),
        Entry(tp + "layer_norm.weight", fp + ("ln_in", "scale")),
        Entry(tp + "layer_norm.bias", fp + ("ln_in", "bias")),
    ]
    for i in range(n_blocks):
        t = tp + f"transformer_blocks.{i}."
        f = fp + (f"block_{i}",)
        for n in ("w_Q", "w_K", "w_V", "fc"):
            out.append(Entry(t + f"multi_head_attention.{n}.weight",
                             f + ("mha", n, "kernel")))
        out += [
            Entry(t + "multi_head_attention.layer_norm.weight",
                  f + ("ln_attn", "scale")),
            Entry(t + "multi_head_attention.layer_norm.bias",
                  f + ("ln_attn", "bias")),
            Entry(t + "feed_forward.w_1.weight", f + ("w_1", "kernel")),
            Entry(t + "feed_forward.w_1.bias", f + ("w_1", "bias")),
            Entry(t + "feed_forward.w_2.weight", f + ("w_2", "kernel")),
            Entry(t + "feed_forward.w_2.bias", f + ("w_2", "bias")),
            Entry(t + "feed_forward.layer_norm.weight",
                  f + ("ln_ffn", "scale")),
            Entry(t + "feed_forward.layer_norm.bias", f + ("ln_ffn", "bias")),
        ]
    return out


def mlp_seq_entries(n_linears: int, torch_prefix: str,
                    flax_prefix: Tuple[str, ...]) -> List[Entry]:
    """MLP_Layers/CAT Sequential [Dropout, Linear, GELU] x n: the i-th Linear
    sits at index 3i+1 (bce_text/main-end2end(DSSM)/model/encoders.py:10-16)
    -> our MLPLayers Dense_{i}."""
    out = []
    for i in range(n_linears):
        t = torch_prefix + f"{3 * i + 1}."
        f = flax_prefix + (f"Dense_{i}",)
        out += [Entry(t + "weight", f + ("kernel",)),
                Entry(t + "bias", f + ("bias",))]
    return out


# ------------------------------------------------------------- encoder specs
def _text_encoder_spec(cfg, sd: Dict[str, np.ndarray]):
    """(net order entries incl. pooler requires_grad, net_prefix,
    net_convert, extra plain entries) for the text tower.

    The reference registers Text_Encoder as [bert_model, fc]
    (model/encoders.py:36-41) under bert_encoder.text_encoders.title; pooler
    params get requires_grad=False via the model-size table (run.py:55-75),
    and index < freeze_paras_before freezes the prefix."""
    prefix = "bert_encoder.text_encoders.title.bert_model."
    name = cfg.bert_model_load
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    if "opt" in name:
        from .opt import convert_opt_state_dict, opt_torch_param_order
        n_layers = 1 + max(int(m.group(1)) for k in sub
                           if (m := re.match(r"decoder\.layers\.(\d+)\.", k)))
        order = opt_torch_param_order(n_layers)
        convert = lambda s: (convert_opt_state_dict(s, n_layers), None)
    else:
        # BERT and RoBERTa share the module structure (RobertaModel state
        # dicts differ only in the wrapper prefix, run.py:29-41)
        from .convert_text import (bert_torch_param_order,
                                   convert_bert_state_dict)
        n_layers = 1 + max(int(m.group(1)) for k in sub
                           if (m := re.match(r"encoder\.layer\.(\d+)\.", k)))
        order = bert_torch_param_order(n_layers)
        convert = lambda s: (convert_bert_state_dict(s, n_layers), None)

    net_entries = []
    for idx, (tname, fpath) in enumerate(order):
        frozen = (idx < cfg.freeze_paras_before) or (fpath is None)
        # fpath None == the pooler rows: requires_grad=False via pooler_para
        # whenever the size table matches (every reference launcher does)
        net_entries.append(Entry(
            prefix + tname,
            None if fpath is None else ("encoder", "net") + tuple(fpath),
            requires_grad=not frozen))
    fc_prefix = "bert_encoder.text_encoders.title.fc."
    extra = [Entry(fc_prefix + "weight", ("encoder", "fc", "kernel")),
             Entry(fc_prefix + "bias", ("encoder", "fc", "bias"))]
    return net_entries, prefix, convert, extra


def _vision_encoder_spec(cfg, sd: Dict[str, np.ndarray]):
    """Net order + converter for the vision tower.

    Registration (inbatch_sasrec_e2e_vision/model/encoders.py:7-41):
    Resnet_Encoder/Vit_Encoder register image_net only (the replaced
    fc/classifier head lives INSIDE image_net at its original registration
    slot); MAE_Encoder registers [image_net, cv_proj]. Freezing is
    index < freeze_paras_before over image_net.named_parameters()
    (run.py:58-60)."""
    name = cfg.cv_model_load.replace("-", "_")
    prefix = "cv_encoder.image_net."
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    extra: List[Entry] = []

    if name.startswith("resnet"):
        from .resnet import convert_resnet_state_dict, resnet_torch_param_order
        order = resnet_torch_param_order(name)   # includes the replaced fc
        convert = lambda s: convert_resnet_state_dict(s, name)
        net_entries = [
            Entry(prefix + tname,
                  None if fpath is None else ("encoder", "net") + tuple(fpath),
                  requires_grad=idx >= cfg.freeze_paras_before)
            for idx, (tname, fpath) in enumerate(order)]
    elif "swin" in name:
        from .swin import SwinConfig, convert_swin_state_dict, swin_torch_param_order
        depths: Dict[int, int] = {}
        for k in sub:
            m = re.match(r"swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.", k)
            if m:
                s_i, b_i = int(m.group(1)), int(m.group(2))
                depths[s_i] = max(depths.get(s_i, 0), b_i + 1)
        depth_tuple = tuple(depths[i] for i in range(len(depths)))
        embed_dim = int(sub["swin.embeddings.patch_embeddings.projection.bias"].shape[0])
        n_heads = tuple(
            int(sub[f"swin.encoder.layers.{i}.blocks.0.attention.self."
                    "relative_position_bias_table"].shape[1])
            for i in range(len(depth_tuple)))
        scfg = SwinConfig(embed_dim=embed_dim, depths=depth_tuple,
                          num_heads=n_heads)
        order = swin_torch_param_order(scfg, prefix_hf="swin.")
        convert = lambda s: (convert_swin_state_dict(s, scfg), None)
        net_entries = [
            Entry(prefix + tname,
                  None if fpath is None else ("encoder", "net") + tuple(fpath),
                  requires_grad=idx >= cfg.freeze_paras_before)
            for idx, (tname, fpath) in enumerate(order)]
        # SwinForImageClassification registers [swin, classifier]; the
        # replaced classifier (run.py:50-54) maps to our tower-level head
        n_net = len(net_entries)
        for tname, fpath in ((prefix + "classifier.weight",
                              ("encoder", "classifier", "kernel")),
                             (prefix + "classifier.bias",
                              ("encoder", "classifier", "bias"))):
            net_entries.append(Entry(tname, fpath,
                                     requires_grad=n_net >= cfg.freeze_paras_before))
            n_net += 1
    elif "mae" in name or "checkpoint" in name:
        from .vit_mae import (ViTMAEConfig, convert_vit_mae_state_dict,
                              vit_mae_torch_param_order)
        n_layers = 1 + max(int(m.group(1)) for k in sub
                           if (m := re.match(r"encoder\.layer\.(\d+)\.", k)))
        hidden = int(sub["embeddings.cls_token"].shape[-1])
        mcfg = ViTMAEConfig(num_hidden_layers=n_layers, hidden_size=hidden)
        order = vit_mae_torch_param_order(mcfg)
        convert = lambda s: (convert_vit_mae_state_dict(s, mcfg), None)
        net_entries = [
            Entry(prefix + tname,
                  None if fpath is None else ("encoder", "net") + tuple(fpath),
                  # HF ViTMAE's sin-cos position_embeddings is a
                  # requires_grad=False Parameter — never in the optimizer
                  requires_grad=(idx >= cfg.freeze_paras_before
                                 and tname != "embeddings.position_embeddings"))
            for idx, (tname, fpath) in enumerate(order)]
        # MAE_Encoder registers cv_proj AFTER image_net (encoders.py:7-18)
        extra = [Entry("cv_encoder.cv_proj.weight",
                       ("encoder", "cv_proj", "kernel")),
                 Entry("cv_encoder.cv_proj.bias",
                       ("encoder", "cv_proj", "bias"))]
    else:
        raise ValueError(f"unsupported cv_model_load for conversion: {name}")
    return net_entries, prefix, convert, extra


# ------------------------------------------------------------- composed maps
def composed_map(cfg, sd: Dict[str, np.ndarray]) -> ComposedMap:
    """Full named_parameters()-ordered map for the reference Model variant
    selected by cfg (user_tower / item_tower / stage / modality)."""
    use_modal = "modal" in cfg.item_tower
    fused = cfg.item_tower in ("modal_id_add", "modal_id_cat")
    enc_entries: List[Entry] = []
    net_prefix = net_convert = None
    enc_extra: List[Entry] = []
    if use_modal and cfg.stage == "end2end":
        if cfg.modality == "text":
            enc_entries, net_prefix, net_convert, enc_extra = \
                _text_encoder_spec(cfg, sd)
        else:
            enc_entries, net_prefix, net_convert, enc_extra = \
                _vision_encoder_spec(cfg, sd)

    entries: List[Entry] = []
    if cfg.user_tower == "dssm":
        # [user_embedding, user_encoder(MLP_Encoder), item tower]
        entries.append(Entry("user_embedding.weight",
                             ("user_embedding", "embedding")))
        entries += mlp_seq_entries(cfg.dnn_layers,
                                   "user_encoder.MLP.mlp_layers.",
                                   ("user_mlp", "mlp"))
        if use_modal:
            entries += enc_entries + enc_extra
        else:
            entries.append(Entry("id_embedding.weight",
                                 ("id_embedding", "embedding")))
            entries += mlp_seq_entries(cfg.dnn_layers,
                                       "id_encoder.MLP.mlp_layers.",
                                       ("id_encoder", "mlp"))
    elif cfg.stage == "two_stage" and not fused:
        # 2stage: [fc(MLP_Layers: mlp_layers THEN fc), user_encoder]
        entries += mlp_seq_entries(cfg.dnn_layers, "fc.mlp_layers.",
                                   ("modal_mlp",))
        entries += [Entry("fc.fc.weight", ("modal_proj", "kernel")),
                    Entry("fc.fc.bias", ("modal_proj", "bias"))]
        entries += sasrec_entries(cfg.transformer_block)
    elif cfg.stage == "two_stage" and fused:
        # id_plus_mo-2stage: [user_encoder, turn_dim(fc THEN mlp_layers),
        # fc(CAT), mlp_layers, id_embedding]
        entries += sasrec_entries(cfg.transformer_block)
        entries += [Entry("turn_dim.fc.weight", ("turn_dim", "fc", "kernel")),
                    Entry("turn_dim.fc.bias", ("turn_dim", "fc", "bias"))]
        entries += mlp_seq_entries(cfg.mo_dnn_layers,
                                   "turn_dim.mlp_layers.mlp_layers.",
                                   ("turn_dim", "mlp"))
        if cfg.item_tower == "modal_id_cat":
            # the 2stage CAT is always single-layer (id_plus_mo-2stage/
            # model/encoders.py:45-52)
            entries += mlp_seq_entries(1, "fc.mlp_layers.",
                                       ("fusion", "mlp"))
        entries += mlp_seq_entries(cfg.dnn_layers, "mlp_layers.mlp_layers.",
                                   ("post_mlp",))
        entries.append(Entry("id_embedding.weight",
                             ("id_embedding", "embedding")))
    elif fused:
        # id_plus_mo end2end: [user_encoder, encoder, fc(ADD/CAT),
        # id_embedding]
        entries += sasrec_entries(cfg.transformer_block)
        entries += enc_entries + enc_extra
        if cfg.item_tower == "modal_id_cat":
            entries += mlp_seq_entries(cfg.cat_layers, "fc.mlp_layers.",
                                       ("fusion", "mlp"))
        entries.append(Entry("id_embedding.weight",
                             ("id_embedding", "embedding")))
    else:
        # main end2end SASRec: [user_encoder, encoder | id_embedding]
        entries += sasrec_entries(cfg.transformer_block)
        if use_modal:
            entries += enc_entries + enc_extra
        else:
            entries.append(Entry("id_embedding.weight",
                                 ("id_embedding", "embedding")))
    return ComposedMap(entries=entries, net_prefix=net_prefix,
                       net_convert=net_convert)


# ------------------------------------------------------------ sd -> flax tree
def _put(tree: Dict, path: Tuple[str, ...], value):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = value


def convert_model_state(sd: Dict[str, np.ndarray], cmap: ComposedMap
                        ) -> Tuple[Dict, Optional[Dict]]:
    """reference model_state_dict -> (params tree, batch_stats tree|None).

    The encoder net subtree goes through the family converter (which owns the
    conv-layout/qkv transforms); everything else uses the generic rule:
    flax leaf 'kernel' => transpose (out,in)->(in,out)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Optional[Dict] = None
    if cmap.net_prefix is not None:
        sub = {k[len(cmap.net_prefix):]: v for k, v in sd.items()
               if k.startswith(cmap.net_prefix)}
        net_tree, net_stats = cmap.net_convert(sub)
        _put(params, ("encoder", "net"), net_tree)
        if net_stats:
            stats = {"encoder": {"net": net_stats}}
    for e in cmap.entries:
        if e.flax_path is None:
            continue
        if e.flax_path[:2] == ("encoder", "net"):
            continue   # handled wholesale above
        if e.torch_name not in sd:
            raise KeyError(f"checkpoint is missing tensor {e.torch_name!r} "
                           f"expected by the composed map")
        v = sd[e.torch_name]
        if e.flax_path[-1] == "kernel":
            v = np.ascontiguousarray(v.T)
        _put(params, e.flax_path, np.asarray(v, np.float32))
    return params, stats


# ------------------------------------------------------- optimizer index map
def optimizer_ordered_entries(cfg, cmap: ComposedMap) -> List[Entry]:
    """Reference AdamW param order: for modal end2end/DSSM runs, the
    fine-tune group then the recsys group over requires_grad
    named_parameters (text rule: 'bert_model' in name, run.py:153-158;
    vision rule: 'image_net' in name unless 'fc'/'classifier' in name,
    vision run.py:123-131); plain `model.parameters()` (ALL params, one
    group) otherwise (run.py:191; two_stage run.py:151)."""
    use_modal = "modal" in cfg.item_tower
    if not (use_modal and cfg.stage == "end2end"):
        return list(cmap.entries)
    if cfg.modality == "text":
        is_ft = lambda n: "bert_model" in n
    else:
        is_ft = lambda n: ("image_net" in n
                           and "fc" not in n and "classifier" not in n)
    trainable = [e for e in cmap.entries if e.requires_grad]
    group_ft = [e for e in trainable if is_ft(e.torch_name)]
    group_rs = [e for e in trainable if not is_ft(e.torch_name)]
    return group_ft + group_rs


def torch_moment_sds(model_sd: Dict[str, np.ndarray], torch_opt_sd: Dict,
                     ordered: List[Entry],
                     expected_group_sizes: Optional[List[int]] = None
                     ) -> Tuple[Dict, Dict, int]:
    """Split the torch optimizer state into exp_avg / exp_avg_sq
    pseudo-state-dicts (zeros where a param has no optimizer state: frozen
    params, or trainable-but-gradless ones torch never stepped) + the global
    step count."""
    groups = torch_opt_sd.get("param_groups", [])
    idx_list: List[int] = []
    for g in groups:
        idx_list.extend(g["params"])
    if len(idx_list) != len(ordered):
        raise ValueError(
            f"optimizer has {len(idx_list)} params but the composed map "
            f"expects {len(ordered)} — the checkpoint's variant/geometry "
            f"does not match the provided flags")
    # group STRUCTURE must match the reference construction too: equal
    # totals with different group splits would silently mis-map moments
    if expected_group_sizes is not None:
        got = [len(g["params"]) for g in groups]
        if got != expected_group_sizes:
            raise ValueError(
                f"optimizer param_groups sizes {got} do not match the "
                f"reference construction {expected_group_sizes} for these "
                f"flags (fine-tune group then recsys group, run.py:150-162)"
                f" — was this checkpoint written by a modified optimizer "
                f"setup?")
    state = torch_opt_sd.get("state", {})
    mu_sd = {k: np.zeros_like(np.asarray(v))
             for k, v in model_sd.items()
             if hasattr(v, "shape")}
    nu_sd = {k: np.asarray(v).copy() for k, v in mu_sd.items()}
    step = 0
    for pos, entry in enumerate(ordered):
        st = state.get(idx_list[pos], state.get(str(idx_list[pos])))
        if st is None:
            continue
        mu_sd[entry.torch_name] = np.asarray(st["exp_avg"], np.float32)
        nu_sd[entry.torch_name] = np.asarray(st["exp_avg_sq"], np.float32)
        s = st.get("step", 0)
        step = max(step, int(np.asarray(s)))
    return mu_sd, nu_sd, step


# ----------------------------------------------------- optax state grafting
def _overlay_moments(template, filled):
    """Recursively overwrite template ndarray leaves with `filled` values at
    matching paths (missing paths / non-array template leaves are kept:
    MaskedNode serializations, frozen set_to_zero states)."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if isinstance(filled, dict) and k in filled:
                out[k] = _overlay_moments(v, filled[k])
            else:
                out[k] = v
        return out
    if hasattr(template, "shape") and hasattr(filled, "shape"):
        if tuple(template.shape) != tuple(np.asarray(filled).shape):
            raise ValueError(
                f"moment shape mismatch: template {tuple(template.shape)} "
                f"vs torch {tuple(np.asarray(filled).shape)}")
        return np.asarray(filled, np.float32)
    return template


def graft_adamw_moments(opt_state_sd: Dict, mu_tree: Dict, nu_tree: Dict,
                        step: int) -> Dict:
    """Fill every ScaleByAdamState ({count, mu, nu} sub-dict) in the
    serialized optax state with the torch moments and the global step."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        if set(node.keys()) >= {"count", "mu", "nu"}:
            out = dict(node)
            out["count"] = np.asarray(step, np.int32)
            out["mu"] = _overlay_moments(node["mu"], mu_tree)
            out["nu"] = _overlay_moments(node["nu"], nu_tree)
            return out
        return {k: walk(v) for k, v in node.items()}
    return walk(opt_state_sd)


# ---------------------------------------------------------------- full flow
def convert_reference_checkpoint(pt_payload: Dict, cfg, epoch: int) -> Dict:
    """torch .pt payload -> our msgpack checkpoint payload (the exact
    structure train/checkpoint.py:save_checkpoint writes).

    Requires cfg to describe the run the checkpoint came from (the same
    flags the reference training command used)."""
    import jax
    import flax.serialization

    from ..train.state import (default_encoder_predicate, make_optimizer,
                               param_labels)

    if getattr(cfg, "accumulation_step", 1) > 1:
        raise ValueError(
            "convert with accumulation_step=1: the reference never uses "
            "gradient accumulation, so its checkpoints carry no MultiSteps "
            "state (inbatch_sasrec_e2e_vision/parameters.py:29 declares the "
            "flag unused)")
    model_sd = {k: np.asarray(v.detach().cpu().numpy()
                              if hasattr(v, "detach") else v)
                for k, v in pt_payload["model_state_dict"].items()}
    cmap = composed_map(cfg, model_sd)
    params, stats = convert_model_state(model_sd, cmap)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats

    # --- optimizer template (labels reproduce runner.build_model exactly)
    labels = None
    if cfg.use_modal and cfg.stage == "end2end":
        frozen = {e.flax_path for e in cmap.entries
                  if not e.requires_grad and e.flax_path is not None}
        labels = param_labels(params, default_encoder_predicate, frozen)
    tx = make_optimizer(cfg, labels)
    opt_state = tx.init(jax.tree.map(np.asarray, params))
    opt_sd = flax.serialization.to_state_dict(jax.device_get(opt_state))

    ordered = optimizer_ordered_entries(cfg, cmap)
    opt_payload = pt_payload.get("optimizer") or {}
    if opt_payload:
        t_opt = {
            "state": {k: {kk: (vv.detach().cpu().numpy()
                               if hasattr(vv, "detach") else vv)
                          for kk, vv in st.items()}
                      for k, st in opt_payload.get("state", {}).items()},
            "param_groups": opt_payload.get("param_groups", []),
        }
        use_modal = "modal" in cfg.item_tower
        if use_modal and cfg.stage == "end2end":
            if cfg.modality == "text":
                is_ft = lambda n: "bert_model" in n
            else:
                is_ft = lambda n: ("image_net" in n and "fc" not in n
                                   and "classifier" not in n)
            n_ft = sum(1 for e in ordered if is_ft(e.torch_name))
            expected_sizes = [n_ft, len(ordered) - n_ft]
        else:
            expected_sizes = [len(ordered)]
        mu_sd, nu_sd, step = torch_moment_sds(model_sd, t_opt, ordered,
                                              expected_sizes)
        mu_tree, _ = convert_model_state(mu_sd, cmap)
        nu_tree, _ = convert_model_state(nu_sd, cmap)
        opt_sd = graft_adamw_moments(opt_sd, mu_tree, nu_tree, step)
    else:
        step = 0

    # fresh deterministic dropout stream (torch RNG does not transfer);
    # mirrors build_model's split then decorrelates by epoch. PRNGKey gives
    # the legacy uint32 key format checkpoint.py round-trips.
    key = jax.random.split(jax.random.PRNGKey(cfg.seed), 3)[2]
    key = jax.random.fold_in(key, epoch)

    return {
        "params": flax.serialization.to_state_dict(variables),
        "opt_state": opt_sd,
        "dropout_rng": np.asarray(jax.device_get(key)),
        "step": np.asarray(step, np.int32),
        "epoch": epoch,
        "scaler_state": {},
        "extra": {"converted_from": "reference_pt"},
    }


# ======================================================================
# Reverse direction: our checkpoint -> reference torch .pt (export).
#
# Makes checkpoint migration BIDIRECTIONAL: a model trained here exports
# to the exact artifact the reference's run_test.py / resume workflow
# consumes (torch.load -> model.load_state_dict(strict=True) ->
# optimizer.load_state_dict, run_test.py:111-123, run.py:130-145).
#
# strict=True means the exported model_state_dict must carry EVERY key of
# the torch module, including tensors our tree does not hold: the frozen
# BERT pooler and registered buffers (position_ids / token_type_ids /
# relative_position_index / BN num_batches_tracked — the exact set depends
# on the installed transformers). The exporter therefore takes a TEMPLATE
# state dict of the encoder net (instantiated from the HF class, or the
# user's original pretrained .bin — the pooler was frozen at those values
# during training, so the pretrained tensors are exactly right) and
# overlays the mapped keys onto it.
# ======================================================================

def _invert_leaf(v: np.ndarray, flax_leaf_name: str) -> np.ndarray:
    """Inverse of the forward converters' per-leaf transforms: 2D kernels
    transpose back to (out, in); 4D conv kernels HWIO -> OIHW. Every
    forward converter in this repo uses exactly these rules (plus
    name-only renames), so the generic inverse is exact."""
    v = np.asarray(v)
    if flax_leaf_name == "kernel":
        if v.ndim == 4:
            return np.ascontiguousarray(v.transpose(3, 2, 0, 1))
        return np.ascontiguousarray(v.T)
    return v


def _get_path(tree: Dict, path: Tuple[str, ...]):
    d = tree
    for k in path:
        d = d[k]
    return d


def export_model_state(variables: Dict, cfg,
                       net_template_sd: Optional[Dict] = None) -> Dict:
    """Our flax variables ({'params', maybe 'batch_stats'}) -> the
    reference Model's torch state_dict (numpy values).

    net_template_sd: the encoder net's torch state dict used (a) to infer
    the architecture for the composed map and (b) as the base the mapped
    keys overlay — its pooler/buffer tensors survive untouched. Required
    for modal end2end exports; pass the HF module's state_dict (or the
    original pretrained file's)."""
    params = variables["params"]
    stats = variables.get("batch_stats")
    pseudo_sd: Dict[str, np.ndarray] = {}
    out: Dict[str, np.ndarray] = {}
    net_prefix = None
    if (net_template_sd is None and "modal" in cfg.item_tower
            and cfg.stage == "end2end"):
        raise ValueError(
            "modal end2end export needs the encoder template state dict "
            "(the HF module's, or the original pretrained file's) — it "
            "carries the pooler rows and registered buffers the "
            "reference's strict load requires; pass "
            "--pretrained_models_dir to the export tool")
    if net_template_sd is not None:
        use_modal = "modal" in cfg.item_tower
        assert use_modal and cfg.stage == "end2end", \
            "net_template_sd only applies to modal end2end exports"
        if cfg.modality == "text":
            net_prefix = "bert_encoder.text_encoders.title.bert_model."
        else:
            net_prefix = "cv_encoder.image_net."
        for k, v in net_template_sd.items():
            t = np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, "detach") else v)
            pseudo_sd[net_prefix + k] = t
            out[net_prefix + k] = t
    cmap = composed_map(cfg, pseudo_sd)
    for e in cmap.entries:
        if e.flax_path is None:
            continue   # pooler rows: template values stand
        try:
            v = _get_path(params, e.flax_path)
        except KeyError:
            raise KeyError(f"our checkpoint has no leaf {e.flax_path} for "
                           f"{e.torch_name!r} — wrong flags for this "
                           f"checkpoint?")
        out[e.torch_name] = _invert_leaf(v, e.flax_path[-1])
    # ResNet BatchNorm running stats live in 'batch_stats'; torch keeps
    # them as <bn>.running_mean/var (+ num_batches_tracked, taken from the
    # template — unused by momentum-based BN). Torch module names come from
    # the order map (the downsample BN is 'downsample.1', not a name the
    # flax path alone can reconstruct).
    if stats is not None and net_prefix is not None:
        from .resnet import resnet_torch_param_order

        net_stats = stats.get("encoder", {}).get("net", {})
        arch = cfg.cv_model_load.replace("-", "_")
        for tname, fpath in resnet_torch_param_order(arch):
            if fpath is None or fpath[-1] != "scale":
                continue
            mod = tname[:-len(".weight")]
            for leaf, torch_stat in (("mean", "running_mean"),
                                     ("var", "running_var")):
                out[net_prefix + f"{mod}.{torch_stat}"] = np.asarray(
                    _get_path(net_stats, tuple(fpath[:-1]) + (leaf,)))
    return out


def export_optimizer(opt_state_sd: Dict, cfg, cmap: ComposedMap,
                     step: Optional[int] = None) -> Dict:
    """Our serialized optax state -> torch AdamW optimizer.state_dict().

    param_groups reproduce the reference's construction (fine-tune then
    recsys for modal end2end with the lr/wd knobs from cfg; one group
    otherwise, run.py:150-191); state entries carry exp_avg/exp_avg_sq
    through the same inverse transforms as the params."""
    # collect {flax_path: (mu, nu, count)} from every ScaleByAdamState
    moments: Dict[Tuple[str, ...], Tuple[np.ndarray, np.ndarray, int]] = {}

    def collect(node):
        if not isinstance(node, dict):
            return
        if set(node.keys()) >= {"count", "mu", "nu"}:
            cnt = int(np.asarray(node["count"]))

            def leaves(tree, prefix=()):
                for k, v in tree.items():
                    if isinstance(v, dict):
                        yield from leaves(v, prefix + (k,))
                    else:
                        yield prefix + (k,), v

            nus = dict(leaves(node["nu"]))
            for path, mu_v in leaves(node["mu"]):
                if hasattr(mu_v, "shape"):
                    moments[path] = (np.asarray(mu_v),
                                     np.asarray(nus[path]), cnt)
            return
        for v in node.values():
            collect(v)

    collect(opt_state_sd)

    ordered = optimizer_ordered_entries(cfg, cmap)
    use_modal = "modal" in cfg.item_tower
    two_group = use_modal and cfg.stage == "end2end"
    if two_group:
        if cfg.modality == "text":
            is_ft = lambda n: "bert_model" in n
        else:
            is_ft = lambda n: ("image_net" in n
                               and "fc" not in n and "classifier" not in n)
        n_ft = sum(1 for e in ordered if is_ft(e.torch_name))
        # fine-tune group weight decay: ONLY the inbatch variants pass
        # fine_tune_l2_weight (inbatch_sasrec_e2e_text/run.py:160, vision
        # run.py:132); every BCE variant — main-end2end, DSSM, id_plus_mo —
        # pays args.l2_weight on BOTH groups (bce_text/main-end2end/
        # run.py:158, main-end2end(DSSM)/run.py:149,
        # id_plus_mo-end2end/run.py:161; the PARITY.md l2 quirk)
        ft_wd = (cfg.fine_tune_l2_weight if cfg.loss == "inbatch_ce"
                 else cfg.l2_weight)
        groups = [
            {"params": list(range(n_ft)), "lr": cfg.fine_tune_lr,
             "weight_decay": ft_wd},
            {"params": list(range(n_ft, len(ordered))), "lr": cfg.lr,
             "weight_decay": cfg.l2_weight},
        ]
    else:
        groups = [{"params": list(range(len(ordered))), "lr": cfg.lr,
                   "weight_decay": cfg.l2_weight}]
    for g in groups:
        g.update({"betas": (0.9, 0.999), "eps": 1e-8, "amsgrad": False,
                  "maximize": False, "foreach": None, "capturable": False,
                  "differentiable": False, "fused": None})
    state: Dict[int, Dict] = {}
    for idx, e in enumerate(ordered):
        if e.flax_path is None or e.flax_path not in moments:
            continue   # pooler / grad-less: torch leaves no state entry
        mu_v, nu_v, cnt = moments[e.flax_path]
        leaf = e.flax_path[-1]
        state[idx] = {
            "step": np.asarray(float(step if step is not None else cnt)),
            "exp_avg": _invert_leaf(mu_v, leaf),
            "exp_avg_sq": _invert_leaf(nu_v, leaf),
        }
    return {"state": state, "param_groups": groups}
