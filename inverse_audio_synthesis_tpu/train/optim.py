"""Optimizers + LR schedules matching the reference's training recipe.

- LARS with linear batch-size LR scaling ``batch_size / 256 * base_lr`` per the VICReg
  paper §4.2 (reference: vicreg_audio_params.py:134-142). lightning-flash's LARS
  defaults to zero momentum when called the way the reference calls it; we default to
  the same and expose the knob.
- LinearWarmupCosineAnnealingLR → optax.warmup_cosine_decay_schedule, stepped per
  optimizer step (reference: vicreg_audio_params.py:148-165; the reference's
  warmup_epochs/max_epochs are actually steps).
- SGD is also supported — working, unlike the reference where both SGD paths crash on
  an unbound/shadowed ``optim`` name (reference: vicreg_audio_params.py:131-132,
  audio_to_params.py:293-295; documented bug, fixed here).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class NonFiniteGuardState(NamedTuple):
    total_notfinite: Any
    inner_state: Any


def reject_nonfinite_updates(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Reject non-finite updates on device and count them (cheap apply_if_finite).

    optax.apply_if_finite wraps the inner update in ``lax.cond``, whose branches
    force whole-pytree buffer copies — measured +6.4 ms/step at the full VICReg
    config (143M params). Here the gate is a scalar-predicate ``jnp.where`` applied
    to the incoming gradients and to the produced updates, which XLA fuses into the
    existing elementwise update pipeline. On a non-finite step: gradients are zeroed
    before the inner transform (protecting momentum-style state), the final update is
    zeroed (so weight-decay-only residuals are rejected too), the inner state is
    rolled back, and ``total_notfinite`` increments. The guard never "gives up and
    accepts" — the Trainer aborts on the counter first (train/loop.py)."""

    def init(params):
        return NonFiniteGuardState(jnp.zeros([], jnp.int32), inner.init(params))

    def update(updates, state, params=None):
        isfinite = jnp.array(True)
        for leaf in jax.tree_util.tree_leaves(updates):
            isfinite = jnp.logical_and(isfinite, jnp.all(jnp.isfinite(leaf)))

        def gate(tree):
            return jax.tree_util.tree_map(
                lambda u: jnp.where(isfinite, u, jnp.zeros_like(u)), tree
            )

        out, inner_state = inner.update(gate(updates), state.inner_state, params)
        out = gate(out)
        # inner state (schedule counts, momentum buffers) must not advance on a
        # rejected step — tiny for the optimizers used here (momentum=0)
        inner_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(isfinite, new, old),
            inner_state,
            state.inner_state,
        )
        total = state.total_notfinite + jnp.where(isfinite, 0, 1).astype(jnp.int32)
        return out, NonFiniteGuardState(total, inner_state)

    return optax.GradientTransformation(init, update)


class FusedLarsState(NamedTuple):
    count: Any
    total_notfinite: Any


def fused_lars(
    learning_rate,
    weight_decay: float = 0.0,
    trust_coefficient: float = 0.001,
    eps: float = 1e-8,
    exclude_bias_and_norm: bool = False,
    guard_nonfinite: bool = False,
) -> optax.GradientTransformation:
    """LARS matching lightning-flash EXACTLY (zero momentum — the reference's
    configuration: vicreg_audio_params.py:134-142) in TWO HBM passes per tensor.

    optax.lars lowers to ~5 full passes over each large tensor (w-norm reduce,
    weight-decay add, g-norm reduce, trust scaling, update) — profiled at ~10 ms/step
    on the 143M-param full config, the single biggest step cost. Here pass 1 computes
    the two scalars sum(w²), sum(g²) together (XLA multi-output fusion: one read of
    w and g); pass 2 forms the scaled update. flash's formula
    (flash/core/optimizers/lars.py, parity-tested in tests/test_lars.py):

        if wd == 0:                      update = -lr · g            (plain SGD)
        elif ‖w‖ > 0 and ‖g‖ > 0:        local_lr = tc·‖w‖ / (‖g‖ + wd·‖w‖ + eps)
                                         update = -lr · local_lr · (g + wd·w)
        else:                            update = -lr · g            (no decay either)

    ``exclude_bias_and_norm=True`` wires the reference's unused ``exclude_bias_and_norm``
    helper (vicreg.py:98-99, the VICReg paper's recommended masking): 1-D params
    (biases, BN scales) get plain SGD (no weight decay, no trust scaling). Off by
    default — flash LARS, which the reference actually runs, adapts every param.

    ``guard_nonfinite=True`` folds the per-step NaN/Inf rejection (see
    ``reject_nonfinite_updates``) into the SAME two passes for free: a gradient leaf
    containing NaN/±Inf makes its already-computed sum(g²) non-finite, so the global
    finite predicate costs zero extra HBM traffic (the standalone guard's isfinite
    sweep re-read all 572 MB of fp32 gradients). On a non-finite step every update is
    zeroed, the schedule count does not advance, and ``total_notfinite`` increments.
    (A finite-but-fp32-overflowing sum(g²) also rejects — that is a ≥1e19-norm
    gradient, i.e. a divergence worth rejecting anyway.)
    """

    def init(params):
        return FusedLarsState(jnp.zeros([], jnp.int32), jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        assert params is not None, "fused_lars requires params"
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)
        wd = weight_decay

        def leaf_scalars(g, w):
            gf = g.astype(jnp.float32)
            g2 = jnp.sum(jnp.square(gf))
            if wd == 0.0 or (exclude_bias_and_norm and w.ndim == 1):
                return g2, None
            return g2, jnp.sum(jnp.square(w.astype(jnp.float32)))

        scalars = jax.tree_util.tree_map(leaf_scalars, updates, params)
        isfinite = jnp.array(True)
        if guard_nonfinite:
            # g2/w2 sums: any NaN/Inf in the operands makes them non-finite
            for s in jax.tree_util.tree_leaves(scalars):
                isfinite = jnp.logical_and(isfinite, jnp.isfinite(s))

        def per_leaf(g, w, sc):
            gf = g.astype(jnp.float32)
            g2, w2 = sc
            if w2 is None:  # wd == 0 or excluded 1-D: flash's plain-SGD path
                upd = -lr * gf
            else:
                wf = w.astype(jnp.float32)
                w_norm = jnp.sqrt(w2)
                g_norm = jnp.sqrt(g2)
                cond = (w_norm > 0.0) & (g_norm > 0.0)
                local_lr = jnp.where(
                    cond,
                    trust_coefficient * w_norm / (g_norm + wd * w_norm + eps),
                    1.0,
                )
                # when the norm gate fails flash leaves d_p = g (no decay, no scaling)
                upd = -lr * jnp.where(cond, local_lr * (gf + wd * wf), gf)
            if guard_nonfinite:
                upd = jnp.where(isfinite, upd, jnp.zeros_like(upd))
            return upd

        # scalars holds a (g2, w2) tuple at each leaf position of `updates`;
        # tree_map flattens the rest trees up-to the first tree's leaves, so the
        # tuples arrive whole at per_leaf
        new_updates = jax.tree_util.tree_map(per_leaf, updates, params, scalars)
        ok = isfinite.astype(jnp.int32)
        return new_updates, FusedLarsState(
            state.count + ok, state.total_notfinite + (1 - ok)
        )

    return optax.GradientTransformation(init, update)


class Fp32MasterState(NamedTuple):
    master: Any  # fp32 master copy of the (bf16-stored) apply weights
    inner_state: Any


def with_fp32_master(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Maintain an fp32 master copy of bf16-STORED weights (cfg.weights_bf16).

    Under mixed precision the towers compute in bf16 but flax stores weights in
    fp32 (param_dtype), so every forward+backward READS the full fp32 weight
    bytes — the dominant HBM term of the byte-saturated b128 VICReg step
    (docs/roofline_b128_r4.md names bf16 weight storage as the one untried
    lever). Storing the apply weights in bf16 halves that traffic; this wrapper
    keeps optimizer math exact by holding the fp32 master in the optimizer
    state:

        inner tx runs on (grads, MASTER fp32 weights) → master update
        emitted update = f32(bf16(new_master)) − f32(params): optax.apply_updates
        adds it to the bf16 params in f32 then casts back, so the stored params
        land on exactly bf16(new_master) (up to one trailing-ulp at rounding
        boundaries)

    The master never loses precision to the bf16 round trip; what training sees
    through the forward pass is bf16(master) — the same quantization the bf16
    compute path already applies to activations."""

    def init(params):
        # copy=True: for already-fp32 leaves (1-D biases/BN) a plain astype is a
        # no-op that ALIASES the param buffer — the state then donates the same
        # buffer twice in the jitted step ("Attempt to donate the same buffer")
        master = jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params
        )
        return Fp32MasterState(master, inner.init(master))

    def update(updates, state, params=None):
        upd, inner_state = inner.update(updates, state.inner_state, state.master)
        new_master = optax.apply_updates(state.master, upd)
        emitted = jax.tree_util.tree_map(
            lambda nm, p: nm.astype(p.dtype).astype(jnp.float32)
            - p.astype(jnp.float32),
            new_master,
            params,
        )
        return emitted, Fp32MasterState(new_master, inner_state)

    return optax.GradientTransformation(init, update)


def make_schedule(scheduler_cfg: Any, peak_lr: float):
    """Returns an optax schedule (callable) or the constant peak_lr.

    ``step_every_nbatches`` (default 1) advances the schedule once per N optimizer
    steps — the reference's downstream task steps its scheduler every 10,000 batches
    (reference: audio_to_params.py:280-284; latent there: it configures no scheduler
    for LARS, so ``sch.step()`` on None would crash at batch 10000)."""
    if not scheduler_cfg or not scheduler_cfg.get("name"):
        return peak_lr
    name = scheduler_cfg["name"]
    if name == "LinearWarmupCosineAnnealingLR":
        args = scheduler_cfg.get("args", {})
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=float(args.get("warmup_start_lr", 0.0)),
            peak_value=peak_lr,
            warmup_steps=int(args["warmup_epochs"]),
            decay_steps=int(args["max_epochs"]),
            end_value=float(args.get("eta_min", 0.0)),
        )
        step_every = int(scheduler_cfg.get("step_every_nbatches", 1))
        if step_every > 1:
            return lambda step: schedule(step // step_every)
        return schedule
    raise ValueError(f"unknown scheduler {name!r}")


def make_optimizer(
    optim_cfg: Any,
    batch_size: int,
    scheduler_cfg: Any = None,
    momentum: float = 0.0,
    guard_nonfinite: bool = True,
) -> Tuple[optax.GradientTransformation, Any]:
    """Build the optimizer named by the config. Returns (tx, schedule).

    With ``guard_nonfinite`` the transformation is wrapped in
    ``reject_nonfinite_updates``: a step whose gradients contain NaN/Inf is REJECTED on
    device (zero update) and counted in the opt state, so no poisoned step is ever
    applied — the per-step half of the reference's ``detect_anomaly=True``
    (reference: pretrain.py:96) without any host sync. The Trainer raises when the
    device-side count is nonzero at log time (see loop.py / total_notfinite)."""
    name = optim_cfg["name"]
    args = optim_cfg.get("args", {})
    if name == "lars":
        peak_lr = batch_size / 256.0 * float(args["base_lr"])
        schedule = make_schedule(scheduler_cfg, peak_lr)
        if momentum == 0.0:
            # flash LARS applies weight decay and trust scaling to every param; the
            # reference never wires exclude_bias_and_norm in (vicreg.py:98-99 unused)
            # — it stays an opt-in knob (the VICReg paper's recommended masking).
            # The non-finite guard folds into the LARS passes for free here, so the
            # outer reject_nonfinite_updates wrapper (an extra full gradient read)
            # is skipped.
            exclude = bool(args.get("exclude_bias_and_norm", False))
            tx = fused_lars(
                learning_rate=schedule,
                weight_decay=float(args.get("weight_decay", 0.0)),
                trust_coefficient=0.001,
                eps=1e-8,
                exclude_bias_and_norm=exclude,
                guard_nonfinite=guard_nonfinite,
            )
            return tx, schedule
        else:
            exclude = bool(args.get("exclude_bias_and_norm", False))
            adapt = (lambda p: jax.tree_util.tree_map(lambda w: w.ndim > 1, p)) if exclude else True
            tx = optax.lars(
                learning_rate=schedule,
                weight_decay=float(args.get("weight_decay", 0.0)),
                weight_decay_mask=adapt,
                trust_ratio_mask=adapt,
                trust_coefficient=0.001,
                eps=1e-8,
                momentum=momentum,
            )
    elif name == "sgd":
        lr = float(args["lr"])
        schedule = make_schedule(scheduler_cfg, lr)
        tx = optax.sgd(learning_rate=schedule, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if guard_nonfinite:
        tx = reject_nonfinite_updates(tx)
    return tx, schedule


def total_notfinite(opt_state) -> Any:
    """Device-side count of rejected (non-finite) updates from guard
    state(s) anywhere in an opt-state pytree; 0 if unguarded."""
    total = 0
    stack = [opt_state]
    while stack:
        s = stack.pop()
        if hasattr(s, "total_notfinite"):
            total = total + s.total_notfinite
            if hasattr(s, "inner_state"):  # guard wrapper; FusedLarsState has none
                stack.append(s.inner_state)
        elif isinstance(s, (tuple, list)):
            stack.extend(s)
    return total
