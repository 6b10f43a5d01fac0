"""Reference-compatible grid launcher: bce_vision/id_plus_mo-2stage/train_swin_tiny_add_m8.py.

Same grid values as the reference (train_swin_tiny_add_m8.py:23-31: l2 0.01,
drop 0.1, bs 64, lr_ct (1e-4, 0), ed 512, mo_dnn_layers [8],
dnn_layers [2, 4, 6, 0]); reference flag spellings (--images/--lmdb_data/
--CV_resize/--CV_model_load) pass through config.REF_FLAG_ALIASES.
"""
from idvs.morec_tpu.launcher import grid_launch

base = dict(
    loss='bce',
    user_tower='sasrec',
    modality='vision',
    stage='two_stage',
    root_data_dir='../../',
    dataset='dataset/HM',
    behaviors='hm_50w_users.tsv',
    images='hm_50w_items.tsv',
    lmdb_data='hm_50w_items.lmdb',
    logging_num=4,
    testing_num=1,
    CV_resize=224,
    CV_model_load='swin_tiny',
    load_ckpt_name='None',
    mode='train',
    item_tower='modal_add',
    epoch=150,
    freeze_paras_before=0,
    fine_tune_lr=0,           # lr_list_ct = [(1e-4, 0)]
)

grid = dict(
    l2_weight=[0.01],
    drop_rate=[0.1],
    batch_size=[64],
    lr=[0.0001],
    embedding_dim=[512],
    mo_dnn_layers=[8],
    dnn_layers=[2, 4, 6, 0],
)

if __name__ == "__main__":
    grid_launch(base, grid)
