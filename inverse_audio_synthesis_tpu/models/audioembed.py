"""Audio tower: audio → PQMF pseudo-image → MobileNetV3-Small → conv stack → [B, dim].

Behavior contract (reference: audioembed.py:5-72, vicreg_audio_params.py:40-76):
[B, 1, T] audio → PQMF(N=3) → [B, 3, T/3] → reshape [B, 3, H, W] (240×245 for 4 s)
→ ImageNet normalize → mobilenet features [B, 576, H/32, W/32] → seven stacked 2×2
VALID convs (conv7: 576→dim, conv6..conv1: dim→dim, no activations between — matching
the reference) collapsing the spatial map to 1×1 → [B, dim].

TPU-native: everything runs NHWC; the byte-quantization path (scale8/unscale8) exists
but is bypassed, like the reference (audioembed.py:42-46).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.models.mobilenetv3 import MobileNetV3Small
from inverse_audio_synthesis_tpu.ops.pqmf import PQMF

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@lru_cache(maxsize=8)
def _pqmf(n_bands: int) -> PQMF:
    # PQMF holds trace-time filter constants only (no learned state); cache the
    # scipy filter design per band count.
    return PQMF(n_bands=n_bands)


class AudioEmbedding(nn.Module):
    dim: int = 1024
    n_bands: int = 3
    image_size: Tuple[int, int] = (240, 245)
    dtype: Any = jnp.float32
    bn_dtype: Any = jnp.float32

    def _preprocess(self, audio: jax.Array) -> jax.Array:
        """[B, 1, T] → NHWC normalized pseudo-image [B, H, W, 3].

        The PQMF conv emits band-last directly, so the NHWC image is a pure reshape —
        pixel (h, w) of channel c equals the reference's NCHW zimg[c, h, w]
        (audioembed.py:38-41) without the 35 MB transpose copy per direction."""
        h, w = self.image_size
        z = _pqmf(self.n_bands).analysis(audio, channels_last=True)  # [B, T/3, 3]
        assert z.shape[1] * z.shape[2] == self.n_bands * h * w, (
            f"audio length {audio.shape[-1]} does not tile into "
            f"{self.n_bands}×{h}×{w}"
        )
        zimg = z.reshape(-1, h, w, self.n_bands)
        mean = jnp.asarray(IMAGENET_MEAN, z.dtype)
        std = jnp.asarray(IMAGENET_STD, z.dtype)
        return (zimg - mean) / std

    @nn.compact
    def __call__(self, audio: jax.Array, train: bool = False) -> jax.Array:
        assert audio.ndim == 3 and audio.shape[1] == 1
        vision = MobileNetV3Small(
            dtype=self.dtype, bn_dtype=self.bn_dtype, name="vision_model"
        )
        t = vision(self._preprocess(audio), train=train)  # [B, h, w, 576]
        # Stacked VALID convs collapsing the spatial map to 1×1 with no activations
        # between, like the reference's conv7..conv1 (audioembed.py:15-33,61-68).
        # For the reference 8×8 map this is exactly seven 2×2 convs; for other
        # geometries kernel sizes clamp to the remaining extent.
        i = max(t.shape[1], t.shape[2]) - 1  # 7 for the reference 8×8 geometry
        while t.shape[1] > 1 or t.shape[2] > 1:
            kh = min(2, t.shape[1]) if t.shape[1] > 1 else 1
            kw = min(2, t.shape[2]) if t.shape[2] > 1 else 1
            t = nn.Conv(
                self.dim,
                (kh, kw),
                padding="VALID",
                use_bias=True,
                dtype=self.dtype,
                name=f"conv{i}",
            )(t)
            i -= 1
        if t.shape[-1] != self.dim:  # degenerate 1×1 feature maps skip the loop
            t = nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(t)
        b = t.shape[0]
        return t.reshape(b, self.dim)

    def features(self, audio: jax.Array, train: bool = False) -> jax.Array:
        return self(audio, train=train)
