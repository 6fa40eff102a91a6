"""Affine byte-quantization of PQMF grams (reference: imgscale8.py:1-23).

The min/max constants are the empirical PQMF output range over 32K torchsynth sounds
(reference: imgscale8.py:3-6). The audio tower currently bypasses this path
(reference: audioembed.py:42-46) but the op is kept for capability parity.
"""

import jax.numpy as jnp

maxval = 1.5680482
minval = -1.6843455


def scale8(x, xmin: float = minval, xmax: float = maxval):
    xscale = (x - xmin) / (xmax - xmin) * 255.0
    return jnp.clip(xscale, 0, 255).astype(jnp.uint8)


def unscale8(x, xmin: float = minval, xmax: float = maxval):
    return x.astype(jnp.float32) / 255.0 * (xmax - xmin) + xmin
