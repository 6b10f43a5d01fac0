"""Reference-compatible grid launcher: bce_text/id_plus_mo-2stage/test_bert_cat.py.

Checkpoints zipped with their (mo_dnn_layers, dnn_layers) by index
(test_bert_cat.py:28-29: ckpts ['epoch-23.pt', 'epoch-49.pt'] with
mo [0, 8] / dnn [2, 4]).
"""
from idvs.morec_tpu.launcher import grid_launch

base = dict(
    loss='bce',
    user_tower='sasrec',
    modality='text',
    stage='two_stage',
    root_data_dir='../../',
    dataset='dataset/MIND',
    behaviors='mind_60w_users.tsv',
    news='mind_60w_items.tsv',
    logging_num=4,
    testing_num=1,
    bert_model_load='bert_base_uncased',
    mode='test',
    item_tower='modal_cat',
    epoch=150,
    news_attributes='title',
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
    load_ckpt_name=['epoch-23.pt', 'epoch-49.pt'],
    mo_dnn_layers=[0, 8],
    dnn_layers=[2, 4],
)

if __name__ == "__main__":
    grid_launch(base, grid, zipped=zipped)
