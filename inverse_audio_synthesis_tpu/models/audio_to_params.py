"""Downstream inverse-synthesis head: frozen audio representation → 78 synth params.

MLP dim → dim → dim → nparams with sigmoid output for the normalized 0-1 parameter
space (reference: audio_to_params.py:16-53).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.models.paramembed import MLPBlock


class AudioRepresentationToParams(nn.Module):
    nparams: int = 78
    dim: int = 1024
    hidden_norm: str = "nn.BatchNorm1d"
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MLPBlock(self.dim, self.hidden_norm, self.dropout, self.dtype, name="block1")(
            x, train
        )
        x = MLPBlock(self.dim, self.hidden_norm, self.dropout, self.dtype, name="block2")(
            x, train
        )
        x = nn.Dense(self.nparams, dtype=self.dtype, name="lin3")(x)
        return nn.sigmoid(x)
