"""Device mesh + sharding rules (the framework's distributed layer).

The reference's only parallelism is Lightning DDP over 1-4 GPUs with the global-batch
gather disabled (reference: conf/config.yaml:5-8, vicreg.py:38-39, README.md:4-7).
Here the distributed layer is GSPMD over a 2-D ``(data, model)`` mesh:

- **data** axis: the batch dimension of every activation is sharded across it (DP).
  Gradients and the VICReg global-batch statistics become XLA psums over ICI.
- **model** axis: optional tensor parallelism for the projector — its hidden layers
  are the biggest matmuls in the network (1024→8192→8192→8192 at full config,
  reference: conf/vicreg/full.yaml:22). Hidden-layer kernels are sharded
  column-wise, the final kernel row-wise, so the pair needs only one psum.

Scaling beyond one slice (DCN) would add a leading ``replica`` axis; not needed for
parity with a single-node reference.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Build a (data, model) mesh. data=-1 → all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    """Constrain an activation's batch dim onto the data axis (inside jit)."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    )


def _projector_spec(path_str: str, leaf) -> Optional[P]:
    """Tensor-parallel layout for projector matmuls: hidden kernels column-sharded,
    final kernel row-sharded (megatron-style 1-psum pairing)."""
    ndim = getattr(leaf, "ndim", 0)  # scalar pytree leaves (e.g. step counters)
    if ndim == 2 and "projector" in path_str:
        if "lin_final" in path_str:
            return P("model", None)
        if "lin" in path_str:
            return P(None, "model")
    if ndim == 1 and "projector" in path_str and "lin" in path_str:
        # hidden-layer biases follow the column sharding
        if "lin_final" not in path_str:
            return P("model")
    return None


def param_shardings(variables: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a variables pytree: projector TP-sharded over 'model'
    (when the axis has >1 device), everything else replicated."""
    use_tp = mesh.shape["model"] > 1

    def rule(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = _projector_spec(path_str, leaf) if use_tp else None
        # BatchNorm stats/scales inside the projector stay replicated: they are
        # per-feature along the hidden dim... but the hidden dim IS model-sharded.
        if use_tp and getattr(leaf, "ndim", 0) == 1 and "projector" in path_str and (
            "bn" in path_str or "norm" in path_str
        ):
            spec = P("model")
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map_with_path(rule, variables)
