from .masking import causal_additive_mask, inbatch_rejection_mask
from .losses import (
    inbatch_debiased_ce,
    bce_sasrec_loss,
    bce_dssm_loss,
)
from .metrics import target_rank, hit_and_ndcg, masked_catalog_scores
