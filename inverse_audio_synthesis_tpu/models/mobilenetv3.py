"""MobileNetV3-Small feature trunk in Flax (NHWC — TPU-native layout).

The reference uses torchvision's ``mobilenet_v3_small(pretrained=...).features`` as the
vision trunk of the audio tower (reference: vicreg_audio_params.py:52-54,
audioembed.py:61): [B, 3, 240, 245] → [B, 576, 8, 8]. This reimplements the same
architecture (Howard et al. 2019, torchvision layer plan) with torch-compatible
geometry: explicit (k−1)//2 padding, BatchNorm eps=1e-3 / momentum 0.01, hardswish /
hardsigmoid activations, and the standard channel rounding rule — so converted
torchvision weights drop in exactly (see models/torch_import.py).

ImageNet-pretrained weights cannot be downloaded in this environment (zero egress,
torchvision not installed); ``pretrained_vision_model: true`` loads a converted
checkpoint from ``vision_weights_path`` when provided, else random init.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


# (kernel, exp, out, use_se, use_hs, stride) — MobileNetV3-Small layer plan
SMALL_CONFIG: Tuple[Tuple[int, int, int, bool, bool, int], ...] = (
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
)


class ConvBNAct(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Any = hard_swish
    dtype: Any = jnp.float32
    # BatchNorm compute dtype. flax computes the batch statistics in fp32
    # regardless (and the scale/bias/running stats stay fp32 params), so bf16
    # here only changes the normalized OUTPUT (and the residuals XLA saves for
    # the backward) — halving the BN/activation HBM traffic under mixed
    # precision. fp32 default preserves the numerics the campaigns trained with.
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.bn_dtype,
            name="bn",
        )(x)
        return self.act(x) if self.act is not None else x


class SqueezeExcitation(nn.Module):
    squeeze_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    kernel: int
    exp_channels: int
    out_channels: int
    use_se: bool
    use_hs: bool
    stride: int
    dtype: Any = jnp.float32
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        act = hard_swish if self.use_hs else nn.relu
        in_channels = x.shape[-1]
        y = x
        idx = 0
        if self.exp_channels != in_channels:
            y = ConvBNAct(
                self.exp_channels, 1, act=act, dtype=self.dtype,
                bn_dtype=self.bn_dtype, name=f"block_{idx}"
            )(y, train)
            idx += 1
        y = ConvBNAct(
            self.exp_channels,
            self.kernel,
            stride=self.stride,
            groups=self.exp_channels,
            act=act,
            dtype=self.dtype,
            bn_dtype=self.bn_dtype,
            name=f"block_{idx}",
        )(y, train)
        idx += 1
        if self.use_se:
            y = SqueezeExcitation(
                make_divisible(self.exp_channels // 4), dtype=self.dtype, name=f"block_{idx}"
            )(y)
            idx += 1
        y = ConvBNAct(
            self.out_channels, 1, act=None, dtype=self.dtype,
            bn_dtype=self.bn_dtype, name=f"block_{idx}"
        )(y, train)
        if self.stride == 1 and in_channels == self.out_channels:
            y = y + x
        return y


class MobileNetV3Small(nn.Module):
    """``features`` trunk only: NHWC [B, H, W, 3] → [B, H/32, W/32, 576]."""

    dtype: Any = jnp.float32
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(16, 3, stride=2, act=hard_swish, dtype=self.dtype,
                      bn_dtype=self.bn_dtype, name="stem")(x, train)
        for i, (k, exp, out, se, hs, s) in enumerate(SMALL_CONFIG):
            x = InvertedResidual(
                k, exp, out, se, hs, s, dtype=self.dtype,
                bn_dtype=self.bn_dtype, name=f"bneck_{i}"
            )(x, train)
        x = ConvBNAct(576, 1, act=hard_swish, dtype=self.dtype,
                      bn_dtype=self.bn_dtype, name="head")(x, train)
        return x
