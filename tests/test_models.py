"""Model towers: shapes, MobileNetV3 geometry, VICReg loss parity vs reference torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.models import (
    AudioEmbedding,
    AudioRepresentationToParams,
    MobileNetV3Small,
    ParamEmbed,
    VICRegModule,
    vicreg_loss,
)
from inverse_audio_synthesis_tpu.models.vicreg import parse_projector_spec

from conftest import load_reference_module


def test_projector_spec():
    assert parse_projector_spec("8192-8192-%d", 1024, 8192) == (1024, 8192, 8192, 8192)
    assert parse_projector_spec("256-256-%d", 64, 128) == (64, 256, 256, 128)


@pytest.mark.slow
def test_mobilenet_geometry():
    model = MobileNetV3Small()
    x = jnp.zeros((2, 240, 245, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    # reference contract: [B, 576, 8, 8] in NCHW (audioembed.py:57-58) = NHWC [B,8,8,576]
    assert y.shape == (2, 8, 8, 576)


def test_mobilenet_param_count_matches_torchvision():
    """torchvision mobilenet_v3_small().features has 927,008 parameters."""
    model = MobileNetV3Small()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 927_008, f"got {n}"


def test_param_embed_shapes():
    model = ParamEmbed(nparams=78, dim=64)
    x = jnp.zeros((4, 78))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (4, 64)
    # train mode needs dropout rng + batch_stats mutation
    y2, mutated = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert y2.shape == (4, 64) and "batch_stats" in mutated


def test_audio_embedding_tiny():
    # tiny geometry: 64×96 pseudo-image ⇒ audio length 3*64*96 = 18432
    model = AudioEmbedding(dim=32, image_size=(64, 96))
    audio = jnp.zeros((2, 1, 3 * 64 * 96))
    variables = model.init(jax.random.PRNGKey(0), audio, train=False)
    y = model.apply(variables, audio, train=False)
    assert y.shape == (2, 32)


def test_audio_to_params_range():
    model = AudioRepresentationToParams(nparams=78, dim=32)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = np.asarray(model.apply(variables, x, train=False))
    assert y.shape == (4, 78)
    assert (y > 0).all() and (y < 1).all()  # sigmoid output


def test_vicreg_loss_parity_vs_reference():
    torch = pytest.importorskip("torch")
    ref = load_reference_module("vicreg")

    rng = np.random.RandomState(3)
    x = rng.randn(16, 64).astype(np.float32)
    y = rng.randn(16, 64).astype(np.float32)

    class _Cfg:
        pass

    cfg = _Cfg()
    cfg.dim = 64
    cfg.embeddim = 64
    cfg.vicreg = _Cfg()
    cfg.vicreg.mlp = "64-%d"
    cfg.vicreg.batch_size = 16
    cfg.vicreg.sim_coeff = 25.0
    cfg.vicreg.std_coeff = 25.0
    cfg.vicreg.cov_coeff = 1.0
    ref_module = ref.VICReg(cfg, backbone_audio=None, backbone_param=None)
    with torch.no_grad():
        ref_losses = ref_module.loss(torch.from_numpy(x), torch.from_numpy(y))
    ours = vicreg_loss(
        jnp.asarray(x), jnp.asarray(y), 25.0, 25.0, 1.0, cov_batch_size=16
    )
    for a, b in zip(ours, ref_losses):
        np.testing.assert_allclose(float(a), float(b.item()), rtol=1e-4, atol=1e-5)


def test_vicreg_loss_fixes_cov_batch_bug():
    """Default normalizes covariance by the runtime batch, not the config batch."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    _, _, _, cov_runtime = vicreg_loss(x, y)
    _, _, _, cov_cfg = vicreg_loss(x, y, cov_batch_size=16)
    assert float(cov_runtime) == pytest.approx(
        float(cov_cfg) * ((16 - 1) / (8 - 1)) ** 2, rel=1e-5
    )


def test_vicreg_module_end_to_end_tiny():
    audio_tower = AudioEmbedding(dim=32, image_size=(64, 96))
    param_tower = ParamEmbed(nparams=78, dim=32)
    model = VICRegModule(
        backbone_audio=audio_tower,
        backbone_param=param_tower,
        projector_dims=(32, 64, 48),
    )
    audio = jnp.zeros((2, 1, 3 * 64 * 96))
    params = jnp.zeros((2, 78))
    variables = model.init(jax.random.PRNGKey(0), audio, params, train=False)
    x, y = model.apply(variables, audio, params, train=False)
    assert x.shape == (2, 48) and y.shape == (2, 48)
    loss, *_ = vicreg_loss(x, y)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_bn_bf16_knob_same_params_finite_close():
    """bn_bf16 changes only BatchNorm's COMPUTE dtype: the param/batch-stats
    pytree is identical (checkpoints stay compatible) and outputs stay finite.
    At random init the trunk's fp32-vs-bf16-BN outputs drift ~14% relative
    (depth-compounded rounding through hard_swish/SE) — the loose bound here is
    a catastrophe detector. Convergence equivalence was settled by the on-chip
    A/B (BASELINE.md round 4: same-seed 2,000-step curves within 0.25%, step
    25.10 -> 24.58 ms), which flipped the conf/config.yaml default to on."""
    import jax.tree_util as jtu

    x = jax.random.uniform(
        jax.random.PRNGKey(3), (4, 64, 64, 3), minval=-2.0, maxval=2.0
    )
    m32 = MobileNetV3Small(dtype=jnp.bfloat16, bn_dtype=jnp.float32)
    m16 = MobileNetV3Small(dtype=jnp.bfloat16, bn_dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(v) == jtu.tree_structure(
        m16.init(jax.random.PRNGKey(0), x, train=False)
    )
    a, _ = m32.apply(v, x, train=True, mutable=["batch_stats"])
    b, _ = m16.apply(v, x, train=True, mutable=["batch_stats"])
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-6) < 0.5

    # The projector's BN feeds ReLU -> Dense, which casts to bf16 anyway, so
    # bf16 BN output is EXACTLY the fp32 path (rounding commutes with ReLU).
    from inverse_audio_synthesis_tpu.models.vicreg import Projector

    y = jax.random.normal(jax.random.PRNGKey(5), (8, 32))
    vp = Projector((32, 64, 48), dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(1), y, train=False
    )
    outs = [
        Projector((32, 64, 48), dtype=jnp.bfloat16, bn_dtype=d).apply(
            vp, y, train=True, mutable=["batch_stats"]
        )[0]
        for d in (jnp.float32, jnp.bfloat16)
    ]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
