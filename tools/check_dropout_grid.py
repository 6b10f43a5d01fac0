"""Run the TPU-gated dropout fwd/bwd mask-agreement check on real hardware
(tests/test_fused_attention.py::test_dropout_fwd_bwd_mask_agreement_tpu —
pytest forces CPU where the kernel PRNG doesn't exist, so this standalone
runner executes it on the chip).

Usage: python tools/check_dropout_grid.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

assert jax.default_backend() == "tpu", jax.default_backend()

from test_fused_attention import test_dropout_fwd_bwd_mask_agreement_tpu

test_dropout_fwd_bwd_mask_agreement_tpu()
print("dropout fwd/bwd mask agreement on TPU: OK")
