"""Reference-compatible grid launcher: bce_text/main-end2end/train_id.py equivalent.

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
    load_ckpt_name='None',
    mode='train',
    item_tower='id',
    epoch=50,
    news_attributes='title',
)

grid = dict(
    embedding_dim=[512, 1024, 2048, 4096],
    batch_size=[256, 128],
    lr=[0.0001, 5e-05, 0.001, 0.0005],
    l2_weight=[0.1],
    drop_rate=[0.1],
)

if __name__ == "__main__":
    grid_launch(base, grid)
