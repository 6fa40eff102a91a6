#!/usr/bin/env python3
"""Generate the committed synthetic "pretrained" vision-trunk fixture.

Real ImageNet weights cannot exist in this zero-egress image (the reference trains
from torchvision's pretrained MobileNetV3-small: vicreg_audio_params.py:52-54,
conf/vicreg/full.yaml:28), so CI exercises the FULL config→file→load→train path with
this deterministic stand-in: a converted-pickle checkpoint in exactly the format
``models/torch_import.py`` writes, with statistically sensible scales (He-scaled
convs, unit BN variance) so training from it is stable.

Regenerate (bit-identical, seed 0):
    python tools/make_vision_fixture.py
writes tests/golden/vision_trunk_fixture.pkl
"""

import pickle
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from inverse_audio_synthesis_tpu.models.mobilenetv3 import (  # noqa: E402
    SMALL_CONFIG,
    make_divisible,
)
from inverse_audio_synthesis_tpu.models.torch_import import (  # noqa: E402
    convert_mobilenetv3_small_state_dict,
)


def sensible_state_dict(seed: int = 0):
    """torchvision mobilenet_v3_small().features.state_dict() layout, He-scaled."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(shape, fan_in):
        return (rng.randn(*shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)

    def convbn(prefix, cin, cout, k, groups=1):
        fan_in = (cin // groups) * k * k
        sd[f"{prefix}.0.weight"] = conv((cout, cin // groups, k, k), fan_in)
        sd[f"{prefix}.1.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.1.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.1.running_mean"] = (rng.randn(cout) * 0.01).astype(np.float32)
        sd[f"{prefix}.1.running_var"] = np.ones(cout, np.float32)

    convbn("features.0", 3, 16, 3)
    cin = 16
    for i, (k, exp, cout, se, hs, s) in enumerate(SMALL_CONFIG, start=1):
        j = 0
        if exp != cin:
            convbn(f"features.{i}.block.{j}", cin, exp, 1)
            j += 1
        convbn(f"features.{i}.block.{j}", exp, exp, k, groups=exp)
        j += 1
        if se:
            sq = make_divisible(exp // 4)
            sd[f"features.{i}.block.{j}.fc1.weight"] = conv((sq, exp, 1, 1), exp)
            sd[f"features.{i}.block.{j}.fc1.bias"] = np.zeros(sq, np.float32)
            sd[f"features.{i}.block.{j}.fc2.weight"] = conv((exp, sq, 1, 1), sq)
            sd[f"features.{i}.block.{j}.fc2.bias"] = np.zeros(exp, np.float32)
            j += 1
        convbn(f"features.{i}.block.{j}", exp, cout, 1)
        cin = cout
    convbn("features.12", 96, 576, 1)
    return sd


def main() -> None:
    params, stats = convert_mobilenetv3_small_state_dict(sensible_state_dict())
    out = REPO / "tests" / "golden" / "vision_trunk_fixture.pkl"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)
    n = sum(x.size for x in _leaves(params))
    print(f"wrote {out} ({out.stat().st_size/1e6:.1f} MB, {n} trunk params)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
