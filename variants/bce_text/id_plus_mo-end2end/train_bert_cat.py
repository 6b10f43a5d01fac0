"""Reference-compatible grid launcher: bce_text/id_plus_mo-end2end/train_bert_cat.py equivalent.

Same nested-hparam-product semantics and flag names as the reference script;
each grid point invokes the unified TPU runner (idvs.morec_tpu.run) instead
of formatting a torch.distributed.launch command line.
"""
from idvs.morec_tpu.launcher import grid_launch

base = dict(
    loss='bce',
    user_tower='sasrec',
    modality='text',
    root_data_dir='../../',
    dataset='Dataset/MIND-large',
    behaviors='mind_60w_users.tsv',
    news='mind_60w_items.tsv',
    logging_num=4,
    testing_num=1,
    load_ckpt_name='None',
    bert_model_load='bert_base_uncased',
    mode='train',
    item_tower='modal_id_cat',
    epoch=150,
    stage='end2end',
    news_attributes='title',
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
