"""Reference-compatible grid launcher: bce_text/id_plus_mo-2stage/test_bert_add.py.

The reference pairs each checkpoint with its (mo_dnn_layers, dnn_layers) by
INDEX, not product (test_bert_add.py:28-29,38-41: ckpts ['epoch-50.pt',
'epoch-32.pt'] with mo [0, 8] / dnn [4, 2]) — expressed here with the
launcher's zipped axes.
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
    item_tower='modal_add',
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
    load_ckpt_name=['epoch-50.pt', 'epoch-32.pt'],
    mo_dnn_layers=[0, 8],
    dnn_layers=[4, 2],
)

if __name__ == "__main__":
    grid_launch(base, grid, zipped=zipped)
