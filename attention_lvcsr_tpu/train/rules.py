"""Optax-composable step rules.

The reference composes Blocks step rules into one Theano update function
(``blocks/algorithms/__init__.py``: StepClipping:610, Momentum:431,
AdaDelta:464, RMSProp:568, AdaGrad:723, Adam:767, RemoveNotFinite:829,
VariableClipping:646; ``lvsr/algorithms.py``: BurnIn:19,
AdaptiveStepClipping:46; plus the host-side ``AdaptiveClipping`` extension,
``lvsr/extensions.py:64``).  Here each rule is an
``optax.GradientTransformation`` so the whole chain runs inside the jitted
train step — including the *adaptive* clipping threshold, which the
reference adjusted from the host between batches; keeping it on device
removes a host sync per step.

Sign convention: optax updates are *added* to params (Blocks steps are
subtracted); the conversion happens inside each rule.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def global_norm(updates):
    return optax.global_norm(updates)


# -- gradient clipping -----------------------------------------------------

class AdaptiveClipState(NamedTuple):
    count: jnp.ndarray
    mean_log_norm: jnp.ndarray
    mean_sq_log_norm: jnp.ndarray
    threshold: jnp.ndarray


def adaptive_clipping(initial_threshold: float, decay_rate: float = 0.998,
                      clip_level: float = 4.0, burnin_period: int = 500,
                      stdev_factor: float = 1.0):
    """Self-tuning global-norm clip.

    EMA of ``log(grad_norm)`` and its square set the threshold to
    ``exp(mean + stdev_factor * std)`` after a burn-in with a fixed
    threshold (semantics of lvsr's AdaptiveClipping extension +
    AdaptiveStepClipping rule).  ``clip_level`` bounds the norm used for
    the statistics update so explosions don't poison the EMA.
    """

    def init_fn(params):
        del params
        return AdaptiveClipState(
            count=jnp.zeros((), jnp.int32),
            mean_log_norm=jnp.zeros(()),
            mean_sq_log_norm=jnp.zeros(()),
            threshold=jnp.asarray(initial_threshold, jnp.float32),
        )

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        norm = jnp.where(jnp.isfinite(norm), norm, state.threshold)
        log_norm = jnp.log(jnp.minimum(norm, clip_level * state.threshold)
                           + 1e-30)
        decay = jnp.where(state.count < burnin_period,
                          1.0 - 1.0 / (state.count + 1.0), decay_rate)
        mean = decay * state.mean_log_norm + (1 - decay) * log_norm
        mean_sq = decay * state.mean_sq_log_norm + (1 - decay) * log_norm ** 2
        std = jnp.sqrt(jnp.maximum(mean_sq - mean ** 2, 0.0))
        new_threshold = jnp.where(
            state.count < burnin_period,
            jnp.asarray(initial_threshold, jnp.float32),
            jnp.exp(mean + stdev_factor * std))
        scale = jnp.minimum(1.0, state.threshold / (norm + 1e-30))
        clipped = jax.tree.map(lambda u: u * scale, updates)
        return clipped, AdaptiveClipState(
            count=state.count + 1, mean_log_norm=mean,
            mean_sq_log_norm=mean_sq, threshold=new_threshold)

    return optax.GradientTransformation(init_fn, update_fn)


def step_clipping(threshold: float):
    """Plain global-norm clipping (blocks StepClipping:610)."""
    return optax.clip_by_global_norm(threshold)


# -- core rules ------------------------------------------------------------

def momentum_rule(scale: float, momentum: float):
    """Blocks Momentum: ``velocity = momentum*velocity + scale*grad``."""
    return optax.chain(optax.trace(decay=momentum), optax.scale(-scale))


def adadelta_rule(decay_rate: float = 0.95, epsilon: float = 1e-6):
    return optax.chain(
        optax.scale_by_adadelta(rho=decay_rate, eps=epsilon),
        optax.scale(-1.0))


def rmsprop_rule(learning_rate: float, decay_rate: float = 0.9,
                 max_scaling: float = 1e5):
    return optax.chain(optax.scale_by_rms(decay=decay_rate,
                                          eps=1.0 / max_scaling),
                       optax.scale(-learning_rate))


def adam_rule(learning_rate: float = 2e-3, beta1: float = 0.1,
              beta2: float = 0.001, epsilon: float = 1e-8):
    # NB blocks' Adam parametrizes decays as (1 - beta) relative to the
    # paper; optax uses the paper's convention.
    return optax.chain(
        optax.scale_by_adam(b1=1 - beta1, b2=1 - beta2, eps=epsilon),
        optax.scale(-learning_rate))


def adagrad_rule(learning_rate: float = 0.002, epsilon: float = 1e-6):
    return optax.chain(optax.scale_by_rss(initial_accumulator_value=0.0,
                                          eps=epsilon),
                       optax.scale(-learning_rate))


# -- safety rails ----------------------------------------------------------

def remove_not_finite(scaler: float = 0.0):
    """Replace non-finite per-tensor updates (blocks RemoveNotFinite:829).

    With ``scaler`` 0 the parameter is left untouched on NaN/Inf steps;
    otherwise the update shrinks the parameter by ``scaler``.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def fix(u, p):
            ok = jnp.all(jnp.isfinite(u))
            fallback = (-scaler * p) if params is not None else \
                jnp.zeros_like(u)
            return jnp.where(ok, u, fallback)
        if params is not None:
            updates = jax.tree.map(fix, updates, params)
        else:
            updates = jax.tree.map(lambda u: fix(u, None), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


class BurnInState(NamedTuple):
    count: jnp.ndarray


def burn_in(num_steps: int):
    """Zero updates for the first ``num_steps`` (lvsr BurnIn:19-43)."""

    def init_fn(params):
        del params
        return BurnInState(count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        live = (state.count >= num_steps).astype(jnp.float32)
        updates = jax.tree.map(lambda u: u * live, updates)
        return updates, BurnInState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def max_norm_constraint(threshold: float, exclude_lookup: bool = False):
    """Column-norm constraint on weight matrices after the update
    (blocks VariableClipping axis=0 restricted to WEIGHT role,
    lvsr/main.py:491-505)."""

    def is_subject(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf.ndim != 2:
            return False
        if name not in ("kernel", "embedding", "state_to_state",
                        "state_to_gates", "W", "W_state"):
            return False
        if exclude_lookup and name == "embedding":
            return False
        return True

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            return updates, state

        flat_u = jax.tree_util.tree_flatten_with_path(updates)[0]
        flat_p, treedef = jax.tree_util.tree_flatten_with_path(params)
        new_leaves = []
        for (path, u), (_, p) in zip(flat_u, flat_p):
            if is_subject(path, p):
                new_p = p + u
                norms = jnp.sqrt((new_p ** 2).sum(axis=0, keepdims=True))
                scale = jnp.minimum(1.0, threshold / (norms + 1e-30))
                u = new_p * scale - p
            new_leaves.append(u)
        updates = jax.tree_util.tree_unflatten(
            treedef, [leaf for leaf in new_leaves])
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# -- composition -----------------------------------------------------------

def build_optimizer(train_conf: dict, reg_conf: Optional[dict] = None):
    """Assemble the rule chain from the ``training`` config section
    (lvsr/main.py:479-519): clipping -> core rules -> max-norm ->
    RemoveNotFinite -> burn-in."""
    reg_conf = reg_conf or {}
    chain = []
    threshold = train_conf.get("gradient_threshold", 100.0)
    if threshold:
        chain.append(step_clipping(threshold))
    rule_names = train_conf.get("rules", ["momentum"])
    for name in rule_names:
        if name == "momentum":
            chain.append(momentum_rule(train_conf.get("scale", 0.01),
                                       train_conf.get("momentum", 0.0)))
        elif name == "adadelta":
            chain.append(adadelta_rule(train_conf.get("decay_rate", 0.95),
                                       train_conf.get("epsilon", 1e-6)))
        elif name == "rmsprop":
            chain.append(rmsprop_rule(train_conf.get("scale", 0.01),
                                      train_conf.get("decay_rate", 0.9)))
        elif name == "adam":
            chain.append(adam_rule(train_conf.get("scale", 2e-3)))
        elif name == "adagrad":
            chain.append(adagrad_rule(train_conf.get("scale", 0.002)))
        else:
            raise ValueError(f"unknown training rule {name!r}")
    # scale_schedule: [[step, factor], ...] — multiply the step by the
    # factor of the last boundary passed (the blocks
    # SharedVariableModifier role, blocks/extensions/training.py:5-46,
    # done the XLA way: the schedule is compiled into the update instead
    # of mutated from the host mid-training).  It must run BEFORE the
    # max-norm projection: the reference scales the learning rate before
    # VariableClipping's column-norm constraint, so a factor > 1 must not
    # re-scale an already-projected update past the norm bound.
    if train_conf.get("scale_schedule"):
        entries = sorted((int(s), float(f))
                         for s, f in train_conf["scale_schedule"])
        if len({s for s, _ in entries}) != len(entries):
            raise ValueError("scale_schedule has duplicate step values: "
                             f"{train_conf['scale_schedule']}")
        # optax boundary scales are multiplicative; chain the ratios so
        # each boundary lands on its ABSOLUTE factor
        sched = optax.piecewise_constant_schedule(
            1.0, {step: factor / prev
                  for (step, factor), prev in zip(
                      entries, [1.0] + [f for _, f in entries[:-1]])})
        chain.append(optax.scale_by_schedule(sched))
    # negative/zero disables (wsj_paper9 sets -1.; reference
    # lvsr/main.py:491 tests `> 0`)
    if reg_conf.get("max_norm", 0) and reg_conf["max_norm"] > 0:
        chain.append(max_norm_constraint(
            reg_conf["max_norm"],
            exclude_lookup=reg_conf.get("max_norm_exclude_lookup", False)))
    chain.append(remove_not_finite(0.0))
    if train_conf.get("burn_in_steps", 0):
        chain.append(burn_in(train_conf["burn_in_steps"]))
    return optax.chain(*chain)
