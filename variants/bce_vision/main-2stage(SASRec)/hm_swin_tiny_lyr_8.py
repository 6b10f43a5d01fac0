"""Reference-compatible grid launcher: bce_vision/main-2stage(SASRec)/hm_swin_tiny_lyr_8.py equivalent.

Same nested-hparam-product semantics and flag names as the reference script;
each grid point invokes the unified TPU runner (idvs.morec_tpu.run) instead
of formatting a torch.distributed.launch command line.
"""
from idvs.morec_tpu.launcher import grid_launch

base = dict(
    loss='bce',
    user_tower='sasrec',
    stage='two_stage',
    modality='vision',
    root_data_dir='../../',
    dataset='Dataset/HM',
    behaviors='hm_50w_users.tsv',
    news='hm_50w_items.tsv',
    image_store='hm_images.mkv',
    logging_num=4,
    testing_num=1,
    load_ckpt_name='None',
    mode='train',
    item_tower='modal',
    epoch=150,
    cv_model_load='swin_tiny',
    freeze_paras_before=10000,
    dnn_layers=8,
)

grid = dict(
    l2_weight=[0.01],
    fine_tune_l2_weight=[0.01],
    drop_rate=[0.1],
    batch_size=[64],
    lr=[0.0001],
    embedding_dim=[512],
    fine_tune_lr=[0.0001],
)

if __name__ == "__main__":
    grid_launch(base, grid)
