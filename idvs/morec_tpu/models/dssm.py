"""DSSM two-tower components (reference bce_text/main-end2end(DSSM)/model/).

User tower = user-ID embedding + MLP_Encoder (identity when dnn_layers == 0);
item tower = ID embedding + MLP_Encoder, or the modality encoder
(model.py:16-29, encoders.py:21-41).
"""

from __future__ import annotations

import flax.linen as nn

from .layers import MLPLayers


class MLPEncoder(nn.Module):
    """GELU MLP of dnn_layers equal-width layers; identity when 0.

    Reference bce_text/main-end2end(DSSM)/model/encoders.py:21-41.
    """
    embedding_dim: int
    dnn_layers: int
    drop_rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.dnn_layers > 0:
            x = MLPLayers([self.embedding_dim] * (self.dnn_layers + 1),
                          self.drop_rate, name="mlp")(x, deterministic)
        return x
