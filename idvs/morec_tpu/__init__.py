"""idvs.morec_tpu — a TPU-native JAX framework for ID- vs Modality-based
sequential recommendation (IDvs.MoRec capabilities, rebuilt TPU-first).

The reference (westlake-repl/IDvs.MoRec) ships 12 near-duplicate PyTorch
variant directories; this framework factors them into one config-driven
system over four axes:

    loss        in {inbatch_ce, bce}
    user_tower  in {sasrec, dssm}
    item_tower  in {id, modal, modal_id_add, modal_id_cat}
    stage       in {end2end, two_stage}

Compute path is jax/XLA/pallas under a jax.sharding.Mesh; host runtime
(record store, image transform) has native C++ components under native/.
"""

__version__ = "0.1.0"
