"""Normalized-parameter specs with curve warping.

Re-implements the behavior contract of torchsynth's ``ModuleParameterRange``:
every synth parameter lives in normalized [0, 1] space (the 78-dim vector the whole
pipeline trains on — reference: conf/config.yaml:27, audio_to_params.py:51-52) and is
warped to natural units by

    non-symmetric:  v = min + (max - min) * x**curve
    symmetric:      d = 2x - 1;  v = min + (max - min) * (sign(d) * |d|**curve + 1) / 2

``to_0to1`` is the exact inverse. torchsynth is not importable in this environment, so
these semantics are reconstructed from its public source (torchsynth/parameter.py);
cross-framework RNG parity is impossible regardless (torch vs threefry PRNG), and the
operational contract preserved here is: deterministic params/audio per batch number,
identical ranges/curves/ordering.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class ParamSpec:
    module: str
    name: str
    minimum: float
    maximum: float
    curve: float = 1.0
    symmetric: bool = False


def from_0to1(spec: ParamSpec, x):
    """Normalized [0,1] → natural units."""
    if not spec.symmetric:
        if spec.curve != 1.0:
            # safe power: x**curve has an infinite derivative at x = 0 for curve < 1
            # (matters for grad-through-synth when a sigmoid head saturates to 0)
            safe = jnp.where(x > 0.0, x, 1.0)
            x = jnp.where(x > 0.0, jnp.power(safe, spec.curve), 0.0)
        return spec.minimum + (spec.maximum - spec.minimum) * x
    dist = 2.0 * x - 1.0
    # safe power: |d|**curve has an infinite derivative at d = 0 for curve < 1;
    # mask the base so grads stay finite (value at d=0 is 0 either way)
    mag = jnp.abs(dist)
    safe = jnp.where(mag > 0.0, mag, 1.0)
    warped = jnp.sign(dist) * jnp.where(mag > 0.0, jnp.power(safe, spec.curve), 0.0)
    return spec.minimum + (spec.maximum - spec.minimum) * (warped + 1.0) / 2.0


def to_0to1(spec: ParamSpec, v):
    """Natural units → normalized [0,1] (inverse of from_0to1)."""
    if not spec.symmetric:
        x = (v - spec.minimum) / (spec.maximum - spec.minimum)
        if spec.curve != 1.0:
            x = jnp.power(x, 1.0 / spec.curve)
        return x
    d = 2.0 * (v - spec.minimum) / (spec.maximum - spec.minimum) - 1.0
    x = jnp.sign(d) * jnp.power(jnp.abs(d), 1.0 / spec.curve)
    return (x + 1.0) / 2.0
