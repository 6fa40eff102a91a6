"""Convert torchvision MobileNetV3-Small weights into this framework's Flax tree.

The reference loads ImageNet-pretrained torchvision weights
(``mobilenet_v3_small(pretrained=cfg.vicreg.pretrained_vision_model)``,
reference: vicreg_audio_params.py:52-54). This environment has no torchvision and no
network egress, so pretrained weights cannot be fetched here; this converter exists so
that a user WITH a torchvision ``state_dict`` file (``torch.save(model.state_dict())``)
can import it once and train from ImageNet initialization:

    python -m inverse_audio_synthesis_tpu.models.torch_import in.pt out.msgpack

Key mapping (torchvision ``features`` naming → ours):
    features.0.{0,1}                  → stem.{conv,bn}
    features.{i}.block.{j}.{0,1}      → bneck_{i-1}.block_{j}.{conv,bn}
    features.{i}.block.{j}.fc{1,2}    → bneck_{i-1}.block_{j}.fc{1,2}   (squeeze-excite)
    features.12.{0,1}                 → head.{conv,bn}
Weight layout: torch conv [O, I/g, kH, kW] → flax [kH, kW, I/g, O]; BN weight/bias →
scale/bias params, running_mean/var → batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convert_mobilenetv3_small_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch state_dict (tensors or numpy) → (params, batch_stats) nested dicts
    matching MobileNetV3Small's variable tree."""
    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def convert_convbn(src_prefix: str, dst_path: Tuple[str, ...]):
        put(params, dst_path + ("conv", "kernel"), _conv_kernel(sd[f"{src_prefix}.0.weight"]))
        put(params, dst_path + ("bn", "scale"), sd[f"{src_prefix}.1.weight"])
        put(params, dst_path + ("bn", "bias"), sd[f"{src_prefix}.1.bias"])
        put(stats, dst_path + ("bn", "mean"), sd[f"{src_prefix}.1.running_mean"])
        put(stats, dst_path + ("bn", "var"), sd[f"{src_prefix}.1.running_var"])

    convert_convbn("features.0", ("stem",))
    # eleven inverted-residual blocks: features.1 … features.11
    for i in range(1, 12):
        j = 0
        while True:
            src = f"features.{i}.block.{j}"
            if f"{src}.0.weight" in sd:  # Conv2dNormActivation
                convert_convbn(src, (f"bneck_{i-1}", f"block_{j}"))
            elif f"{src}.fc1.weight" in sd:  # SqueezeExcitation
                base = (f"bneck_{i-1}", f"block_{j}")
                put(params, base + ("fc1", "kernel"), _conv_kernel(sd[f"{src}.fc1.weight"]))
                put(params, base + ("fc1", "bias"), sd[f"{src}.fc1.bias"])
                put(params, base + ("fc2", "kernel"), _conv_kernel(sd[f"{src}.fc2.weight"]))
                put(params, base + ("fc2", "bias"), sd[f"{src}.fc2.bias"])
            else:
                break
            j += 1
    convert_convbn("features.12", ("head",))
    return params, stats


def load_into_audio_embedding(variables, converted, prefix="vision_model"):
    """Replace the vision_model subtree of an AudioEmbedding/VICReg variables pytree
    with converted torchvision weights, verifying shapes leaf-by-leaf. ``prefix`` is
    the key path to the vision trunk: a string for AudioEmbedding-scoped variables,
    or a tuple like ``("backbone_audio", "vision_model")`` for a full VICReg tree."""
    import jax

    path = (prefix,) if isinstance(prefix, str) else tuple(prefix)
    params, stats = converted

    def get(tree):
        node = tree
        for p in path:
            node = node[p]
        return node

    def replace(tree, sub, depth=0):
        out = dict(tree)
        if depth == len(path) - 1:
            out[path[depth]] = sub
        else:
            out[path[depth]] = replace(tree[path[depth]], sub, depth + 1)
        return out

    def check(old, new, kind):
        key = lambda item: jax.tree_util.keystr(item[0])
        flat_old = sorted(jax.tree_util.tree_leaves_with_path(old), key=key)
        flat_new = sorted(jax.tree_util.tree_leaves_with_path(new), key=key)
        assert len(flat_old) == len(flat_new), (
            f"{kind}: leaf count {len(flat_new)} != expected {len(flat_old)}"
        )
        for (pa, a), (pb, b) in zip(flat_old, flat_new):
            assert a.shape == np.asarray(b).shape, f"{kind} {pa}: {a.shape} vs {b.shape}"

    check(get(variables["params"]), params, "params")
    check(get(variables["batch_stats"]), stats, "batch_stats")
    new_vars = dict(variables)
    new_vars["params"] = replace(variables["params"], params)
    new_vars["batch_stats"] = replace(variables["batch_stats"], stats)
    return new_vars


def load_vision_weights_file(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a vision-weights file → (params, batch_stats) numpy trees.

    Accepts either the converted pickle written by this module's CLI
    (``{"params": ..., "batch_stats": ...}``) or a raw torch ``state_dict`` file
    (``features.0.0.weight`` keys), converted on the fly when torch is available."""
    import pickle

    with open(path, "rb") as f:
        head = f.read(2)
    if head[:1] == b"\x80":  # plain pickle protocol (any version)
        try:
            with open(path, "rb") as f:
                blob = pickle.load(f)
            if isinstance(blob, dict) and "params" in blob:
                return blob["params"], blob.get("batch_stats", {})
        except Exception:
            pass  # fall through to torch loader (zipfile-based .pt)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_mobilenetv3_small_state_dict(sd)


def main():  # pragma: no cover
    import sys

    import torch

    src, dst = sys.argv[1], sys.argv[2]
    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = convert_mobilenetv3_small_state_dict(sd)
    import pickle

    with open(dst, "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)
    print(f"wrote {dst}")


if __name__ == "__main__":  # pragma: no cover
    main()
