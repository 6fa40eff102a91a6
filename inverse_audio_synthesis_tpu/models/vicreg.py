"""VICReg: shared projector over both towers + variance-invariance-covariance loss.

Re-derives the reference's VICReg head (reference: vicreg.py:11-76, itself adapted from
facebookresearch/vicreg) as a Flax module plus a pure loss function.

The decisive TPU-native change: under GSPMD (jit over a sharded mesh), ``vicreg_loss``
is written over the *logical global batch* — XLA inserts the cross-chip collectives
(psum over ICI) for the mean/variance/covariance reductions automatically. This
restores — by construction — the global-batch statistics the reference disabled when it
commented out FullGatherLayer (reference: vicreg.py:38-39,79-95; README.md:4-7 calls
that the #1 multi-GPU perf bug). No hand-written all_gather/backward needed.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def parse_projector_spec(mlp: str, reprdim: int, embeddim: int) -> Tuple[int, ...]:
    """'8192-8192-%d' % embeddim prefixed with reprdim → (1024, 8192, 8192, 8192)
    (reference: vicreg.py:62-64)."""
    spec = f"{reprdim}-{mlp}" % embeddim
    return tuple(int(v) for v in spec.split("-"))


class Projector(nn.Module):
    """MLP from spec: Dense+BN+ReLU per hidden layer, bias-free final Dense
    (reference: vicreg.py:61-70)."""

    dims: Sequence[int]  # full layer widths, e.g. (1024, 8192, 8192, 8192)
    dtype: Any = jnp.float32
    # BN compute dtype (stats are fp32 either way — see mobilenetv3.ConvBNAct)
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = tuple(self.dims)
        for i, width in enumerate(dims[1:-1]):
            x = nn.Dense(width, dtype=self.dtype, name=f"lin{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.bn_dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return nn.Dense(dims[-1], use_bias=False, dtype=self.dtype, name="lin_final")(x)


class VICRegModule(nn.Module):
    """Both towers projected through a shared projector (reference: vicreg.py:30-33)."""

    backbone_audio: nn.Module
    backbone_param: nn.Module
    projector_dims: Sequence[int]
    dtype: Any = jnp.float32
    bn_dtype: Any = jnp.float32

    def setup(self):
        self.projector = Projector(
            self.projector_dims, dtype=self.dtype, bn_dtype=self.bn_dtype,
            name="projector",
        )

    def __call__(self, audio, params, train: bool = False):
        x = self.projector(self.backbone_audio(audio, train=train), train=train)
        y = self.projector(self.backbone_param(params, train=train), train=train)
        return x, y

    def embed_audio(self, audio, train: bool = False):
        return self.projector(self.backbone_audio(audio, train=train), train=train)

    def embed_params(self, params, train: bool = False):
        return self.projector(self.backbone_param(params, train=train), train=train)

    def audio_repr(self, audio, train: bool = False):
        return self.backbone_audio(audio, train=train)

    def param_repr(self, params, train: bool = False):
        return self.backbone_param(params, train=train)


def off_diagonal_sq_sum(c: jax.Array) -> jax.Array:
    return jnp.sum(c**2) - jnp.sum(jnp.diag(c) ** 2)


def vicreg_loss(
    x: jax.Array,
    y: jax.Array,
    sim_coeff: float = 25.0,
    std_coeff: float = 25.0,
    cov_coeff: float = 1.0,
    cov_batch_size: int | None = None,
    cov_operand_dtype=None,
):
    """Returns (loss, repr_loss, std_loss, cov_loss) — reference: vicreg.py:35-58.

    x, y: [B, embeddim] *global* (logical) batch. Under pjit/GSPMD the batch dim may be
    sharded across chips; the reductions below then compile to psums over ICI, giving
    exact global-batch variance/covariance statistics.

    ``cov_batch_size``: the reference normalizes covariance by its *config* batch size
    (vicreg.py:47-48) even when the runtime batch differs — a documented bug. Pass a
    value to reproduce it bit-for-bit; default None uses the actual batch dimension.

    ``cov_operand_dtype``: optional dtype for the covariance matmul operands (e.g.
    bf16 when the towers already run bf16 — the two [embeddim × embeddim] dots are the
    loss's only FLOP-heavy ops and dominate its cost in fp32). Accumulation stays fp32.
    """
    embeddim = x.shape[-1]
    n = x.shape[0]
    repr_loss = jnp.mean((x - y) ** 2)

    x = x - jnp.mean(x, axis=0)
    y = y - jnp.mean(y, axis=0)

    # torch.var is unbiased (n-1 denominator)
    std_x = jnp.sqrt(jnp.sum(x**2, axis=0) / (n - 1) + 1e-4)
    std_y = jnp.sqrt(jnp.sum(y**2, axis=0) / (n - 1) + 1e-4)
    std_loss = (
        jnp.mean(nn.relu(1.0 - std_x)) / 2.0 + jnp.mean(nn.relu(1.0 - std_y)) / 2.0
    )

    denom = (cov_batch_size if cov_batch_size is not None else n) - 1
    xc = x.astype(cov_operand_dtype) if cov_operand_dtype is not None else x
    yc = y.astype(cov_operand_dtype) if cov_operand_dtype is not None else y
    cov_x = jnp.matmul(xc.T, xc, preferred_element_type=jnp.float32) / denom
    cov_y = jnp.matmul(yc.T, yc, preferred_element_type=jnp.float32) / denom

    # off-diagonal² = ||C||² − ||diag(C)||², with diag computed directly from the
    # operands (diag(XᵀX)_j = Σ_b x²_bj): same math as off_diagonal_sq_sum(C), but
    # the backward of the diag term is then elementwise on [B, embeddim] instead of
    # an s32-indexed scatter into the [embeddim²] cotangent (profiled at ~1.4 ms/step
    # at embeddim 8192)
    def off_diag_sq(c, op):
        diag = jnp.sum(jnp.square(op.astype(jnp.float32)), axis=0) / denom
        return jnp.sum(c**2) - jnp.sum(diag**2)

    cov_loss = off_diag_sq(cov_x, xc) / embeddim + off_diag_sq(cov_y, yc) / embeddim

    loss = sim_coeff * repr_loss + std_coeff * std_loss + cov_coeff * cov_loss
    return loss, repr_loss, std_loss, cov_loss


def exclude_bias_and_norm(path: Tuple, leaf) -> bool:
    """LARS masking rule: 1-D params (biases, norm scales) are excluded
    (reference: vicreg.py:98-99)."""
    return leaf.ndim > 1
