"""The restored FullGatherLayer semantics: VICReg variance/covariance statistics span
the GLOBAL batch when the batch dim is sharded across devices (reference disabled this
— vicreg.py:38-39, README.md:4-7 — making multi-GPU statistics per-device and wrong).

Under GSPMD the loss is written over the logical batch, so the sharded result must
equal the single-device result exactly (up to reduction association)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from inverse_audio_synthesis_tpu.models import vicreg_loss
from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh


def test_sharded_loss_equals_global_loss():
    rng = np.random.RandomState(0)
    x = rng.randn(32, 64).astype(np.float32)
    y = rng.randn(32, 64).astype(np.float32)

    ref = jax.jit(vicreg_loss)(jnp.asarray(x), jnp.asarray(y))

    mesh = create_mesh(data=8, model=1)
    shard = NamedSharding(mesh, P("data", None))
    xs = jax.device_put(jnp.asarray(x), shard)
    ys = jax.device_put(jnp.asarray(y), shard)
    out = jax.jit(vicreg_loss)(xs, ys)

    for a, b, name in zip(ref, out, ["loss", "repr", "std", "cov"]):
        np.testing.assert_allclose(
            float(a), float(b), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_per_device_stats_would_differ():
    """Sanity: per-shard statistics (what the reference actually computed under DDP)
    do NOT match the global statistics — i.e. the test above is non-vacuous."""
    rng = np.random.RandomState(1)
    x = rng.randn(32, 64).astype(np.float32)
    y = rng.randn(32, 64).astype(np.float32)
    global_loss = float(vicreg_loss(jnp.asarray(x), jnp.asarray(y))[0])
    per_shard = np.mean(
        [
            float(vicreg_loss(jnp.asarray(x[i : i + 4]), jnp.asarray(y[i : i + 4]))[0])
            for i in range(0, 32, 4)
        ]
    )
    assert abs(global_loss - per_shard) > 1e-3
