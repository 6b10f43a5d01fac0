"""Reference-compatible grid launcher: bce_vision/main-end2end/test_id.py equivalent.

Same nested-hparam-product semantics and flag names as the reference script;
each grid point invokes the unified TPU runner (idvs.morec_tpu.run) instead
of formatting a torch.distributed.launch command line.
"""
from idvs.morec_tpu.launcher import grid_launch

base = dict(
    loss='bce',
    user_tower='sasrec',
    stage='end2end',
    modality='vision',
    root_data_dir='../../',
    dataset='Dataset/HM',
    behaviors='hm_50w_users.tsv',
    news='hm_50w_items.tsv',
    image_store='hm_images.mkv',
    logging_num=4,
    testing_num=1,
    load_ckpt_name='epoch-1.ckpt',
    mode='test',
    item_tower='id',
    epoch=50,
    news_attributes='None',
)

grid = dict(
    embedding_dim=[512],
    batch_size=[256],
    lr=[0.0001],
    l2_weight=[0.1],
    drop_rate=[0.1],
)

if __name__ == "__main__":
    grid_launch(base, grid)
