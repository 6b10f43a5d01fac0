from .inbatch_ce import fused_inbatch_ce
