"""Reference-compatible grid launcher: bce_text/id_plus_mo-2stage/train_bert_add.py.

Same nested-hparam-product semantics, flag names, and grid VALUES as the
reference script (train_bert_add.py:22-29: l2 0.01, drop 0.1, bs 64,
lr_ct (1e-4, 0), ed 512, mo_dnn_layers [4], dnn_layers [2, 4, 6, 0]);
each grid point invokes the unified TPU runner instead of formatting a
torch.distributed.launch command line. The variant axes (loss/user_tower/
modality/stage) replace the reference's directory encoding.
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
    load_ckpt_name='None',
    bert_model_load='bert_base_uncased',
    mode='train',
    item_tower='modal_add',
    epoch=150,
    news_attributes='title',
    freeze_paras_before=0,
    fine_tune_lr=0,           # lr_list_ct = [(1e-4, 0)]
)

grid = dict(
    l2_weight=[0.01],
    drop_rate=[0.1],
    batch_size=[64],
    lr=[0.0001],
    embedding_dim=[512],
    mo_dnn_layers=[4],
    dnn_layers=[2, 4, 6, 0],
)

if __name__ == "__main__":
    grid_launch(base, grid)
