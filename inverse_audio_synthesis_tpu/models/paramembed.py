"""Parameter tower: MLP nparams → dim → dim → dim (reference: paramembed.py:5-40).

Each hidden layer: Dense → {BatchNorm | Identity} → Dropout → ReLU; final Dense bare.
``hidden_norm`` takes the reference's config strings ("nn.BatchNorm1d" | "nn.Identity",
reference: conf/config.yaml:43-48).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MLPBlock(nn.Module):
    """Dense → norm → dropout → ReLU, shared by both towers and the downstream head."""

    features: int
    hidden_norm: str = "nn.BatchNorm1d"
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features, dtype=self.dtype, name="lin")(x)
        if self.hidden_norm == "nn.BatchNorm1d":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="norm",
            )(x)
        elif self.hidden_norm == "nn.Identity":
            pass
        else:
            raise ValueError(f"unknown hidden_norm {self.hidden_norm!r}")
        x = nn.Dropout(self.dropout, deterministic=not train, name="do")(x)
        return nn.relu(x)


class ParamEmbed(nn.Module):
    nparams: int = 78
    dim: int = 1024
    hidden_norm: str = "nn.BatchNorm1d"
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.nparams
        x = MLPBlock(self.dim, self.hidden_norm, self.dropout, self.dtype, name="block1")(
            x, train
        )
        x = MLPBlock(self.dim, self.hidden_norm, self.dropout, self.dtype, name="block2")(
            x, train
        )
        return nn.Dense(self.dim, dtype=self.dtype, name="lin3")(x)
