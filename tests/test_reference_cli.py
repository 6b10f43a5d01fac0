"""Verbatim reference command lines parse into the right Config.

Each case reconstructs the flag list EXACTLY as one of the 12 reference
variants' canonical launchers formats it (first grid point, flags in the
format string's order, values as str.format renders them), and parses it
with parse_args(argv, base=axes) where `axes` carries only what the
reference encodes in the variant's DIRECTORY PATH (loss / user_tower /
modality / stage). Covers every reference-only flag spelling:
--images/--lmdb_data (inbatch_sasrec_e2e_vision/parameters.py:13-14),
--CV_resize/--CV_model_load (ibid:20-21), --dnn_layer singular
(bce_text/main-2stage(SASRec)/parameters.py:21), --mo_dnn_layers
(bce_text/id_plus_mo-2stage/parameters.py:25), the special-eval flags
(--cold_file/--new_file text, bce_text/main-end2end/parameters.py:13-14;
--cold_seqs/--new_seqs/--new_items/--new_lmdb_data vision,
inbatch_sasrec_e2e_vision/parameters.py:16-19), and the item_tower values
'modal_add'/'modal_cat' (id_plus_mo launchers).
"""

from idvs.morec_tpu.config import parse_args


def _argv(pairs):
    out = []
    for k, v in pairs:
        out += [f"--{k}", str(v)]
    return out


def test_inbatch_text_train_bert_base():
    # inbatch_sasrec_e2e_text/train_bert_base.py:40-50, first grid point
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "Dataset/MIND-large"),
        ("behaviors", "mind_60w_users.tsv"), ("news", "mind_60w_items.tsv"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"),
        ("label_screen", "modal_bs128_ed512_lr0.0001_dp0.1_L20.01_Flr5e-05"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("fine_tune_l2_weight", 0.01),
        ("drop_rate", 0.1), ("batch_size", 128), ("lr", 0.0001),
        ("embedding_dim", 512), ("news_attributes", "title"),
        ("bert_model_load", "bert_base_uncased"), ("epoch", 300),
        ("freeze_paras_before", 0), ("fine_tune_lr", "5e-05"),
    ])
    cfg = parse_args(argv, base=dict(loss="inbatch_ce", user_tower="sasrec",
                                     modality="text", stage="end2end"))
    assert cfg.loss == "inbatch_ce" and cfg.stage == "end2end"
    assert cfg.item_tower == "modal" and cfg.use_modal
    assert cfg.news == "mind_60w_items.tsv"
    assert cfg.batch_size == 128 and cfg.lr == 1e-4
    assert cfg.fine_tune_lr == 5e-5 and cfg.fine_tune_l2_weight == 0.01
    assert cfg.epoch == 300 and cfg.bert_model_load == "bert_base_uncased"


def test_inbatch_vision_train_swin_tiny():
    # inbatch_sasrec_e2e_vision/train_swin_tiny.py:37-49, first grid point
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "Dataset/Hm-large"),
        ("behaviors", "hm_50w_users.tsv"), ("images", "hm_50w_items.tsv"),
        ("lmdb_data", "hm_50w_items.lmdb"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("fine_tune_l2_weight", 0.01),
        ("drop_rate", 0.1), ("batch_size", 64), ("lr", 0.0001),
        ("embedding_dim", 2048),
        ("CV_resize", 224), ("CV_model_load", "swin_tiny"), ("epoch", 50),
        ("freeze_paras_before", 0), ("fine_tune_lr", 0.0001),
    ])
    cfg = parse_args(argv, base=dict(loss="inbatch_ce", user_tower="sasrec",
                                     modality="vision", stage="end2end"))
    assert cfg.news == "hm_50w_items.tsv"          # --images
    assert cfg.image_store == "hm_50w_items.lmdb"  # --lmdb_data
    assert cfg.image_resize == 224                 # --CV_resize
    assert cfg.cv_model_load == "swin_tiny"        # --CV_model_load
    assert cfg.embedding_dim == 2048 and cfg.fine_tune_lr == 1e-4


def test_vision_special_eval_flags():
    # the special-eval quartet (inbatch_sasrec_e2e_vision/parameters.py:16-19)
    # with the reference's 'None' = off convention for the unset ones
    argv = _argv([
        ("mode", "test"), ("item_tower", "modal"),
        ("images", "hm_50w_items.tsv"), ("lmdb_data", "hm_50w_items.lmdb"),
        ("cold_seqs", "hm_cold_users.tsv"), ("new_seqs", "hm_new_users.tsv"),
        ("new_items", "hm_new_items.tsv"), ("new_lmdb_data", "hm_new.lmdb"),
    ])
    cfg = parse_args(argv, base=dict(loss="inbatch_ce", user_tower="sasrec",
                                     modality="vision", stage="end2end"))
    assert cfg.cold_behaviors == "hm_cold_users.tsv"
    assert cfg.new_behaviors == "hm_new_users.tsv"
    assert cfg.new_items == "hm_new_items.tsv"
    assert cfg.new_image_store == "hm_new.lmdb"

    off = parse_args(_argv([("cold_seqs", "None"), ("new_seqs", "None"),
                            ("new_items", "None"), ("new_lmdb_data", "None")]))
    assert off.cold_behaviors == "" and off.new_behaviors == ""
    assert off.new_items == "" and off.new_image_store == ""


def test_text_special_eval_flags():
    # text spelling: --cold_file/--new_file (bce_text/main-end2end/
    # parameters.py:13-14)
    cfg = parse_args(_argv([("cold_file", "mind_cold_users.tsv"),
                            ("new_file", "mind_new_users.tsv")]))
    assert cfg.cold_behaviors == "mind_cold_users.tsv"
    assert cfg.new_behaviors == "mind_new_users.tsv"


def test_bce_text_train_bert_base():
    # bce_text/main-end2end/train_bert_base.py, first grid point
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "dataset/MIND"),
        ("behaviors", "mind_60w_users.tsv"), ("news", "mind_60w_items.tsv"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 32),
        ("lr", 0.0001), ("embedding_dim", 512),
        ("news_attributes", "title"),
        ("bert_model_load", "bert_base_uncased"), ("epoch", 150),
        ("freeze_paras_before", 0), ("fine_tune_lr", "5e-05"),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="text", stage="end2end"))
    assert cfg.loss == "bce" and cfg.batch_size == 32
    assert cfg.fine_tune_lr == 5e-5


def test_bce_text_dssm_train_bert_base():
    # bce_text/main-end2end(DSSM)/train_bert_base.py, first grid point
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "Dataset/MIND-large"),
        ("behaviors", "mind_60w_users.tsv"), ("news", "mind_60w_items.tsv"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 16), ("testing_num", 4),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 512),
        ("lr", 0.0001), ("embedding_dim", 512), ("dnn_layers", 0),
        ("news_attributes", "title"),
        ("bert_model_load", "bert_base_uncased"), ("epoch", 60),
        ("freeze_paras_before", 0), ("fine_tune_lr", "5e-05"),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="dssm",
                                     modality="text", stage="end2end"))
    assert cfg.user_tower == "dssm" and cfg.dnn_layers == 0
    assert cfg.logging_num == 16 and cfg.batch_size == 512


def test_bce_text_two_stage_train_bert_lyr_8():
    # bce_text/main-2stage(SASRec)/train_bert_lyr_8.py — the SINGULAR
    # --dnn_layer flag (parameters.py:21)
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "dataset/MIND"),
        ("behaviors", "mind_60w_users.tsv"), ("news", "mind_60w_items.tsv"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.1), ("drop_rate", 0.1), ("batch_size", 64),
        ("lr", 0.0001), ("embedding_dim", 512), ("dnn_layer", 8),
        ("news_attributes", "title"),
        ("bert_model_load", "bert_base_uncased"), ("epoch", 150),
        ("fine_tune_lr", 0),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="text", stage="two_stage"))
    assert cfg.stage == "two_stage" and cfg.dnn_layers == 8
    assert cfg.l2_weight == 0.1 and cfg.fine_tune_lr == 0


def test_bce_text_id_plus_mo_end2end_add():
    # bce_text/id_plus_mo-end2end/train_bert_add.py — item_tower 'modal_add'
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "dataset/MIND"),
        ("behaviors", "mind_60w_users.tsv"), ("news", "mind_60w_items.tsv"),
        ("mode", "train"), ("item_tower", "modal_add"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 32),
        ("lr", 0.0001), ("embedding_dim", 512),
        ("news_attributes", "title"),
        ("bert_model_load", "bert_base_uncased"), ("epoch", 150),
        ("freeze_paras_before", 0), ("fine_tune_lr", "5e-05"),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="text", stage="end2end"))
    assert cfg.item_tower == "modal_id_add" and cfg.use_fusion


def test_bce_text_id_plus_mo_two_stage():
    # bce_text/id_plus_mo-2stage/train_bert_add.py:42-57, first grid point —
    # --mo_dnn_layers + --dnn_layers together
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "dataset/MIND"),
        ("behaviors", "mind_60w_users.tsv"), ("news", "mind_60w_items.tsv"),
        ("mode", "train"), ("item_tower", "modal_add"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 64),
        ("lr", 0.0001), ("embedding_dim", 512),
        ("news_attributes", "title"),
        ("bert_model_load", "bert_base_uncased"), ("epoch", 150),
        ("freeze_paras_before", 0), ("fine_tune_lr", 0),
        ("mo_dnn_layers", 4), ("dnn_layers", 2),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="text", stage="two_stage"))
    assert cfg.item_tower == "modal_id_add" and cfg.stage == "two_stage"
    assert cfg.mo_dnn_layers == 4 and cfg.dnn_layers == 2


def test_bce_vision_train_swin_tiny():
    # bce_vision/main-end2end/train_swin_tiny.py, first grid point
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "dataset/HM"),
        ("behaviors", "hm_50w_users.tsv"), ("images", "hm_50w_items.tsv"),
        ("lmdb_data", "hm_50w_items.lmdb"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 16),
        ("lr", 0.0001), ("embedding_dim", 512),
        ("CV_resize", 224), ("CV_model_load", "swin_tiny"), ("epoch", 150),
        ("freeze_paras_before", 0), ("fine_tune_lr", 0.0001),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="vision", stage="end2end"))
    assert cfg.modality == "vision" and cfg.batch_size == 16
    assert cfg.image_store == "hm_50w_items.lmdb"


def test_bce_vision_dssm_train_swin_tiny():
    # bce_vision/main-end2end(DSSM)/train_swin_tiny.py, first grid point
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "Dataset/Hm-large"),
        ("behaviors", "hm_50w_users.tsv"), ("images", "hm_50w_items.tsv"),
        ("lmdb_data", "hm_50w_items.lmdb"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 128),
        ("lr", 0.0001), ("embedding_dim", 512), ("dnn_layers", 0),
        ("CV_resize", 224), ("CV_model_load", "swin_tiny"), ("epoch", 150),
        ("freeze_paras_before", 0), ("fine_tune_lr", 0.0001),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="dssm",
                                     modality="vision", stage="end2end"))
    assert cfg.user_tower == "dssm" and cfg.cv_model_load == "swin_tiny"


def test_bce_vision_two_stage_hm_swin_tiny_lyr_8():
    # bce_vision/main-2stage(SASRec)/hm_swin_tiny_lyr_8.py — singular
    # --dnn_layer again, vision spelling
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "dataset/HM"),
        ("behaviors", "hm_50w_users.tsv"), ("images", "hm_50w_items.tsv"),
        ("lmdb_data", "hm_50w_items.lmdb"),
        ("mode", "train"), ("item_tower", "modal"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.1), ("drop_rate", 0.1), ("batch_size", 64),
        ("lr", 0.0001), ("embedding_dim", 512), ("dnn_layer", 8),
        ("CV_resize", 224), ("CV_model_load", "swin_tiny"), ("epoch", 150),
        ("fine_tune_lr", 0),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="vision", stage="two_stage"))
    assert cfg.dnn_layers == 8 and cfg.stage == "two_stage"


def test_bce_vision_id_plus_mo_end2end_add():
    # bce_vision/id_plus_mo-end2end/train_swin_tiny_add.py, first grid point
    argv = _argv([
        ("root_data_dir", "../../../"), ("dataset", "dataset/HM"),
        ("behaviors", "hm_50w_users.tsv"), ("images", "hm_50w_items.tsv"),
        ("lmdb_data", "hm_50w_items.lmdb"),
        ("mode", "train"), ("item_tower", "modal_add"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 16),
        ("lr", 0.0001), ("embedding_dim", 512),
        ("CV_resize", 224), ("CV_model_load", "swin_tiny"), ("epoch", 150),
        ("freeze_paras_before", 0), ("fine_tune_lr", 0.0001),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="vision", stage="end2end"))
    assert cfg.item_tower == "modal_id_add" and cfg.root_data_dir == "../../../"


def test_bce_vision_id_plus_mo_two_stage_m8():
    # bce_vision/id_plus_mo-2stage/train_swin_tiny_add_m8.py:45-62, first
    # grid point — mo_dnn_layers 8, the grid VERDICT r3 flagged as dropped
    argv = _argv([
        ("root_data_dir", "../../"), ("dataset", "dataset/HM"),
        ("behaviors", "hm_50w_users.tsv"), ("images", "hm_50w_items.tsv"),
        ("lmdb_data", "hm_50w_items.lmdb"),
        ("mode", "train"), ("item_tower", "modal_add"),
        ("load_ckpt_name", "None"), ("label_screen", "x"),
        ("logging_num", 4), ("testing_num", 1),
        ("l2_weight", 0.01), ("drop_rate", 0.1), ("batch_size", 64),
        ("lr", 0.0001), ("embedding_dim", 512),
        ("CV_resize", 224), ("CV_model_load", "swin_tiny"), ("epoch", 150),
        ("freeze_paras_before", 0), ("fine_tune_lr", 0),
        ("mo_dnn_layers", 8), ("dnn_layers", 2),
    ])
    cfg = parse_args(argv, base=dict(loss="bce", user_tower="sasrec",
                                     modality="vision", stage="two_stage"))
    assert cfg.mo_dnn_layers == 8 and cfg.dnn_layers == 2
    assert cfg.item_tower == "modal_id_add" and cfg.modality == "vision"


def test_cat_value_and_local_rank():
    # 'modal_cat' value + torch.distributed.launch's injected --local_rank
    cfg = parse_args(["--item_tower", "modal_cat", "--local_rank", "3"])
    assert cfg.item_tower == "modal_id_cat" and cfg.cat_layers == 1


def test_cat3_value():
    # 'modal_cat_3' = 3-layer CAT MLP (bce_text/id_plus_mo-end2end/
    # model/model.py:28-34)
    cfg = parse_args(["--item_tower", "modal_cat_3"])
    assert cfg.item_tower == "modal_id_cat" and cfg.cat_layers == 3


def test_launcher_rejects_unknown_axis():
    # a shim that cannot express a reference grid axis fails LOUDLY
    import pytest

    from idvs.morec_tpu.launcher import grid_launch
    with pytest.raises(ValueError, match="not expressible"):
        grid_launch(dict(mode="train"), dict(no_such_flag=[1, 2]))


def test_launcher_zipped_length_mismatch():
    import pytest

    from idvs.morec_tpu.launcher import grid_launch
    with pytest.raises(ValueError, match="zipped"):
        grid_launch(dict(mode="train"), {},
                    zipped=dict(load_ckpt_name=["a"], dnn_layers=[1, 2]))
