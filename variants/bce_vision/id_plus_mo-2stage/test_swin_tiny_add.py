"""Reference-compatible grid launcher: bce_vision/id_plus_mo-2stage/test_swin_tiny_add.py.

Checkpoint zipped with its (mo_dnn_layers, dnn_layers) by index
(test_swin_tiny_add.py:21,30-31: 'epoch-91.pt' with mo 8 / dnn 0).
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
    mode='test',
    item_tower='modal_add',
    epoch=150,
    freeze_paras_before=0,
    fine_tune_lr=0,
)

grid = dict(
    l2_weight=[0.01],
    drop_rate=[0.1],
    batch_size=[64],
    lr=[0.0001],
    embedding_dim=[512],
)

zipped = dict(
    load_ckpt_name=['epoch-91.pt'],
    mo_dnn_layers=[8],
    dnn_layers=[0],
)

if __name__ == "__main__":
    grid_launch(base, grid, zipped=zipped)
