"""Reference-compatible grid launcher: bce_text/main-end2end/test_bert_base.py equivalent.

Same nested-hparam-product semantics and flag names as the reference script;
each grid point invokes the unified TPU runner (idvs.morec_tpu.run) instead
of formatting a torch.distributed.launch command line.
"""
from idvs.morec_tpu.launcher import grid_launch

base = dict(
    loss='bce',
    user_tower='sasrec',
    stage='end2end',
    modality='text',
    root_data_dir='../../',
    dataset='Dataset/MIND-large',
    behaviors='mind_60w_users.tsv',
    news='mind_60w_items.tsv',
    logging_num=4,
    testing_num=1,
    load_ckpt_name='epoch-1.ckpt',
    mode='test',
    item_tower='modal',
    epoch=300,
    news_attributes='title',
    bert_model_load='bert_base_uncased',
    freeze_paras_before=0,
)

grid = dict(
    l2_weight=[0.01],
    fine_tune_l2_weight=[0.01],
    drop_rate=[0.1],
    batch_size=[128],
    lr=[0.0001],
    embedding_dim=[512],
    fine_tune_lr=[5e-05],
)

if __name__ == "__main__":
    grid_launch(base, grid)
