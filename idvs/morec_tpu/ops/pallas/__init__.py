from .inbatch_ce import fused_inbatch_ce, fused_inbatch_ce_gathered
