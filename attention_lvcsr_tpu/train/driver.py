"""Experiment drivers: train / train_multistage / search / sample / ...

Counterpart of ``lvsr/main.py``: builds the data manager, recognizer and
training machinery from a config, assembles the extension list, and runs
the main loop; plus the decoding/scoring driver (``search``), sampling,
dataset inspection and normalization estimation (``init_norm`` — which the
reference CLI advertises but lost, ``bin/run.py:142``).

The train step is ONE jitted function doing forward+backward+update+
monitoring (the reference fused the same into one Theano function,
``blocks/algorithms/__init__.py:244-257``).  Regularization follows
``lvsr/main.py:397-460``: dropout on the bottom output, additive weight
noise (excluding attention parameters), monotonicity penalty, weight
decay; exploration (greedy/mixed) for the task-loss criterion follows
``lvsr/main.py:245-283``.
"""
from __future__ import annotations

import math
import os
import pprint
import sys
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from attention_lvcsr_tpu.data import Data
from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
from attention_lvcsr_tpu.ops.expressions import (entropy,
                                                 monotonicity_penalty,
                                                 weights_std)
from attention_lvcsr_tpu.ops.error_rate import wer
from attention_lvcsr_tpu.train.algorithm import GradientDescent
from attention_lvcsr_tpu.train.extensions import (Checkpoint, CodeVersion,
                                                  CompilationStatistics,
                                                  FinishAfter, Load, LoadLog,
                                                  Patience, Printing,
                                                  ProgressBar,
                                                  SwitchOffLengthFilter,
                                                  Timing, TrackTheBest)
from attention_lvcsr_tpu.train.log import TrainingLog
from attention_lvcsr_tpu.train.loop import MainLoop
from attention_lvcsr_tpu.train.monitoring import (AveragedTrainMonitoring,
                                                  BeamSearchErrorRate,
                                                  DataStreamMonitoring)
from attention_lvcsr_tpu.train.rules import build_optimizer

PRIMARY_OBSERVABLES = (
    "train_cost", "total_gradient_norm", "total_step_norm",
    "max_recording_length", "max_attended_length", "max_num_phonemes",
    "weights_entropy_per_label", "weights_penalty_per_recording")


def _gradient_norm_is_nan(log):
    # reads the LAST RECORDED value: the loop converts monitors one
    # batch late (train/loop.py delayed flush) so host and device
    # pipeline; a NaN stops training one step after it appears
    value = log.last_value("total_gradient_norm")
    if value is None:
        value = log.current_row.get("total_gradient_norm", 0.0)
    try:
        return math.isnan(float(value))
    except (TypeError, ValueError):
        return False


def create_model(config, data, load_path=None) -> SpeechRecognizer:
    """Build and initialize the recognizer (lvsr/main.py:179-242)."""
    net_config = dict(config["net"])
    net_config.pop("input_sources", None)
    bottom = net_config.get("bottom", {"bottom_class": "speech"})
    kind = str(bottom.get("bottom_class", "speech")).rsplit(".", 1)[-1]
    if kind in ("speech", "SpeechBottom"):
        input_dims = {"recordings": data.num_features("recordings")}
        input_num_chars = {}
    else:
        input_dims = {}
        input_num_chars = {"inputs": len(data.character_map("inputs"))}
    if config.get("regularization", {}).get("dropout"):
        net_config["dropout"] = True
    recognizer = SpeechRecognizer(
        dict(net_config,
             input_dims=input_dims,
             input_num_chars=input_num_chars,
             eos_label=data.eos_label,
             num_phonemes=data.num_labels,
             character_map=data.character_map("labels"),
             data_prepend_eos=bool(data.add_bos)),
        init_config=config.get("initialization", {}),
        seed=config.get("training", {}).get("seed", 1234))
    if load_path:
        recognizer.load_params(load_path)
    return recognizer


def _weight_leaf(path) -> bool:
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return name in ("kernel", "embedding", "state_to_state",
                    "state_to_gates", "W", "W_state", "conv_filters")


def _attention_leaf(path) -> bool:
    return any((p.key if hasattr(p, "key") else str(p)) == "attention"
               for p in path)


def make_train_step(recognizer: SpeechRecognizer, optimizer, config,
                    eos_label: int, input_key: str, pmean_axis=None):
    """Build the jitted fwd+bwd+update+monitor function.

    ``pmean_axis``: name of a mapped mesh axis (shard_map-dp mode,
    parallel/mesh.py) — gradients and monitors are lax.pmean'd over it
    before the optimizer update, so every shard applies the identical
    (global-batch) update."""
    net = recognizer.net
    reg = config.get("regularization", {}) or {}
    train_conf = config.get("training", {}) or {}
    if reg.get("adaptive_noise"):
        return make_adaptive_noise_train_step(
            recognizer, optimizer, config, input_key=input_key)
    noise_std = float(reg.get("noise", 0.0) or 0.0)
    decay = float(reg.get("decay", 0.0) or 0.0)
    penalty_coof = float(reg.get("penalty_coof", 0.0) or 0.0)
    dropout = bool(reg.get("dropout", False))
    exploration = train_conf.get("exploration", "imitative")
    criterion = (config["net"].get("criterion") or
                 {"name": "log_likelihood"})["name"]
    if exploration not in ("imitative", "greedy", "mixed"):
        raise ValueError(f"unknown exploration {exploration!r}")
    # Mixed-precision training (training.compute_dtype: bfloat16):
    # master params, optimizer state, and every reduction stay float32;
    # the network fwd/bwd (the HBM-bound encoder/decoder scans and MXU
    # matmuls) run in bf16.  bf16 shares float32's exponent range, so no
    # loss scaling is needed.
    compute_dtype = train_conf.get("compute_dtype")
    cdtype = jnp.dtype(compute_dtype) if compute_dtype else None

    def _downcast(tree):
        if cdtype is None:
            return tree
        return jax.tree.map(
            lambda a: a.astype(cdtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    def step(params, opt_state, rng, inputs, inputs_mask, labels,
             labels_mask):
        drop_rng, noise_rng, expl_rng = jax.random.split(rng, 3)
        B = labels.shape[0]
        TL = labels.shape[1]

        prediction = prediction_mask = None
        if exploration in ("greedy", "mixed"):
            # lvsr/main.py:245-283 — feed the model's own (greedy)
            # predictions, mask after the first EOS (mask rolled so the
            # EOS step itself is still counted).
            n_steps = TL + 10
            gen = net.apply(_downcast(params), _downcast(inputs),
                            _downcast(inputs_mask), n_steps, expl_rng,
                            method=net.generate)
            pred_tm = gen["outputs"]                       # (T', B)
            pmask = (jnp.cumsum(pred_tm == eos_label, axis=0) < 1
                     ).astype(jnp.float32)
            pmask = jnp.roll(pmask, 1, axis=0).at[0].set(1.0)
            if exploration == "mixed":
                targets = jnp.concatenate(
                    [labels.T, jnp.zeros((n_steps - TL, B), labels.dtype)])
                tmask = jnp.concatenate(
                    [labels_mask.T,
                     jnp.zeros((n_steps - TL, B), jnp.float32)])
                coin = jax.random.bernoulli(expl_rng, 0.5, (B,))
                pred_tm = jnp.where(coin[None, :], pred_tm, targets)
                pmask = jnp.where(coin[None, :], pmask, tmask)
            prediction = jax.lax.stop_gradient(pred_tm.T)
            prediction_mask = jax.lax.stop_gradient(pmask.T)

        def loss_fn(p):
            p_used = p
            if noise_std:
                flat, treedef = jax.tree_util.tree_flatten_with_path(p)
                keys = jax.random.split(noise_rng, len(flat))
                noised = []
                for (path, leaf), key in zip(flat, keys):
                    if not _attention_leaf(path):
                        leaf = leaf + noise_std * jax.random.normal(
                            key, leaf.shape, leaf.dtype)
                    noised.append(leaf)
                p_used = jax.tree_util.tree_unflatten(treedef, noised)

            out = net.apply(
                _downcast(p_used), _downcast(inputs),
                _downcast(inputs_mask), labels, _downcast(labels_mask),
                prediction, _downcast(prediction_mask), True,
                method=net.cost,
                rngs={"dropout": drop_rng} if dropout else {})
            if cdtype is not None:
                out = jax.tree.map(
                    lambda v: v.astype(jnp.float32)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v, out)
            batch_cost = out["costs"].sum()
            cost = batch_cost / B
            lm = (prediction_mask if prediction_mask is not None
                  else labels_mask)
            w_penalty = monotonicity_penalty(out["weights"], lm.T)
            w_entropy = entropy(out["weights"], lm.T)
            train_cost = cost
            if penalty_coof:
                train_cost = train_cost + penalty_coof * w_penalty / B
            if decay:
                flat = jax.tree_util.tree_flatten_with_path(p)[0]
                l2 = sum((leaf ** 2).sum() for path, leaf in flat
                         if _weight_leaf(path))
                train_cost = train_cost + decay * l2
            monitors = {
                "train_cost": train_cost,
                "sequence_total_cost": cost,
                "batch_cost": batch_cost,
                "batch_size": jnp.float32(B),
                "weights_penalty": w_penalty,
                "weights_entropy": w_entropy,
                "weights_penalty_per_recording": w_penalty / B,
                "weights_entropy_per_label": w_entropy / lm.sum(),
                "max_recording_length": jnp.float32(inputs.shape[1]),
                "max_attended_length":
                    jnp.float32(out["encoded"].shape[1]),
                "max_num_phonemes": jnp.float32(TL),
                "mask_density": lm.mean(),
                "mean_attended": jnp.abs(out["encoded"]).mean(),
                "mean_bottom_output":
                    jnp.abs(out["bottom_output"]).mean(),
            }
            if out.get("energies") is not None:
                monitors["min_energy"] = out["energies"].min()
                monitors["max_energy"] = out["energies"].max()
            return train_cost, monitors

        (train_cost, monitors), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            # extremes stay global extremes; everything else averages
            monitors = {
                k: (jax.lax.pmax(v, pmean_axis) if k.startswith("max_")
                    else jax.lax.pmin(v, pmean_axis)
                    if k.startswith("min_")
                    else jax.lax.pmean(v, pmean_axis))
                for k, v in monitors.items()}
        import optax
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        step_norm = optax.global_norm(updates)
        new_params = optax.apply_updates(params, updates)
        monitors["total_gradient_norm"] = grad_norm
        monitors["total_step_norm"] = step_norm
        return new_params, new_opt_state, monitors

    # marker consumed by make_parallel_train_step(shard_map_dp=True)
    step.pmean_axis = pmean_axis
    return step


LOG_SIGMA_SCALE = 2048.0


def init_adaptive_noise_params(recognizer, init_sigma=1e-6):
    """Add the per-parameter log-variance tree (collection 'noise')."""
    init_val = float(np.log(init_sigma) * 2.0 / LOG_SIGMA_SCALE)
    ls2 = jax.tree.map(lambda p: jnp.full(p.shape, init_val, jnp.float32),
                      recognizer.params["params"])
    recognizer.params = dict(recognizer.params, noise=ls2)
    return recognizer.params


def make_adaptive_noise_train_step(recognizer, optimizer, config, *,
                                   input_key="recordings"):
    """Graves'11 adaptive (variational) weight noise training step.

    Re-design of ``lvsr/graph.py:71-251`` (``apply_adaptive_noise``):
    every model parameter becomes a Gaussian with learned mean (the
    original parameter) and learned per-entry variance
    ``exp(LOG_SIGMA_SCALE * ls2)``; the forward pass samples the weights,
    the KL-style "model cost" against the empirical Gaussian prior is
    added, and both means and log-variances get the reference's custom
    gradients — including the diagonal-Hessian estimate ``g**2``, which
    (as in the reference, graph.py:232-236) assumes batch size 1.
    """
    net = recognizer.net
    reg = config.get("regularization", {}) or {}
    conf = dict(reg.get("adaptive_noise") or {})
    init_sigma = float(conf.get("init_sigma", 1e-6))
    coeff = float(conf.get("model_cost_coefficient", 1.0))
    num_examples = int(conf.get("num_examples", 1))

    if "noise" not in recognizer.params:
        init_adaptive_noise_params(recognizer, init_sigma)
    static_collections = {k: v for k, v in recognizer.params.items()
                          if k not in ("params", "noise")}

    def step(params, opt_state, rng, inputs, inputs_mask, labels,
             labels_mask):
        import optax
        model = params["params"]
        ls2 = params["noise"]
        B = labels.shape[0]

        s2 = jax.tree.map(lambda l: jnp.exp(l * LOG_SIGMA_SCALE), ls2)
        leaves = jax.tree_util.tree_leaves(model)
        keys = jax.random.split(rng, len(leaves))
        keys = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(model), list(keys))
        noise = jax.tree.map(
            lambda p, v, k: jax.random.normal(k, p.shape, p.dtype)
            * jnp.sqrt(v), model, s2, keys)

        # empirical prior over all noisy parameters (graph.py:185-198)
        total_sum = sum(p.sum() for p in leaves)
        total_count = sum(p.size for p in leaves)
        prior_u = total_sum / total_count
        prior_s2 = (sum(v.sum() for v in jax.tree_util.tree_leaves(s2))
                    + sum(((p - prior_u) ** 2).sum() for p in leaves)
                    ) / total_count

        def task_loss(m):
            noisy = jax.tree.map(lambda p, n: p + n, m,
                                 jax.lax.stop_gradient(noise))
            out = net.apply({**static_collections, "params": noisy},
                            inputs, inputs_mask, labels, labels_mask,
                            method=net.cost)
            cost = out["costs"].sum() / B
            monitors = {
                "sequence_total_cost": cost,
                "batch_size": jnp.float32(B),
                "weights_entropy": entropy(out["weights"], labels_mask.T),
                "weights_penalty": monotonicity_penalty(
                    out["weights"], labels_mask.T),
            }
            return cost, monitors

        (task_cost, monitors), g = jax.value_and_grad(
            task_loss, has_aux=True)(model)

        # model cost (graph.py:206-214)
        model_cost = sum(
            0.5 * (jnp.log(prior_s2) - l * LOG_SIGMA_SCALE).sum()
            + (1.0 / (2.0 * prior_s2))
            * (((p - prior_u) ** 2) + v - prior_s2).sum()
            for p, l, v in zip(
                leaves, jax.tree_util.tree_leaves(ls2),
                jax.tree_util.tree_leaves(s2)))
        model_cost = model_cost / num_examples * coeff

        # custom gradients (graph.py:236-249); prior treated as constant
        pu = jax.lax.stop_gradient(prior_u)
        ps2 = jax.lax.stop_gradient(prior_s2)
        g_model = jax.tree.map(
            lambda p, gr: gr + coeff * (p - pu) / (num_examples * ps2),
            model, g)
        g_ls2 = jax.tree.map(
            lambda v, gr: (coeff * 0.5 / num_examples * LOG_SIGMA_SCALE)
            * (v / ps2 - 1.0)
            + 0.5 * LOG_SIGMA_SCALE * v * gr ** 2,
            s2, g)

        grads = {"params": g_model, "noise": g_ls2}
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        monitors.update({
            "train_cost": task_cost + model_cost,
            "model_cost": model_cost,
            "model_prior_mean": prior_u,
            "model_prior_variance": prior_s2,
            "total_gradient_norm": grad_norm,
            "total_step_norm": optax.global_norm(updates),
        })
        return new_params, new_opt_state, monitors

    return step


def make_eval_fn(recognizer: SpeechRecognizer, input_key: str):
    """Validation cost function with weighted aggregation
    (DataStreamMonitoring observables, lvsr/main.py:550-553)."""
    net = recognizer.net

    @jax.jit
    def ev(params, inputs, inputs_mask, labels, labels_mask):
        out = net.apply(params, inputs, inputs_mask, labels, labels_mask,
                        method=net.cost)
        w_penalty = monotonicity_penalty(out["weights"], labels_mask.T)
        w_entropy = entropy(out["weights"], labels_mask.T)
        return {
            "batch_cost": out["costs"].sum(),
            "batch_size": jnp.float32(labels.shape[0]),
            "num_labels": labels_mask.sum(),
            "weights_penalty": w_penalty,
            "weights_entropy": w_entropy,
        }

    def eval_fn(batch):
        r = {k: float(v) for k, v in ev(
            recognizer.params, batch[input_key],
            batch[f"{input_key}_mask"], batch["labels"],
            batch["labels_mask"]).items()}
        return {
            "sequence_total_cost": (r["batch_cost"], r["batch_size"]),
            "num_utterances": (r["batch_size"], 1.0),
            "weights_penalty_per_recording": (r["weights_penalty"],
                                              r["batch_size"]),
            "weights_entropy_per_label": (r["weights_entropy"],
                                          r["num_labels"]),
        }

    return eval_fn


def initialize_all(config, save_path, params_path=None, fast_start=False,
                   use_load_ext=False, load_log=False):
    """Build data, model, algorithm and extensions (lvsr/main.py:286-683)."""
    root_path, extension = os.path.splitext(save_path)
    data = Data(**config["data"])
    train_conf = config.get("training", {})
    mon_conf = config.get("monitoring", {})
    recognizer = create_model(config, data,
                              None if use_load_ext else params_path)
    input_key = ("recordings"
                 if "recordings" in recognizer.net_config["input_dims"]
                 else "inputs")

    adaptive_conf = (config.get("regularization", {}) or {}).get(
        "adaptive_noise")
    if adaptive_conf is not None and adaptive_conf is not False:
        adaptive_conf = dict(adaptive_conf or {})
        adaptive_conf.setdefault("num_examples",
                                 data.get_dataset("train").num_examples)
        config = dict(config)
        config["regularization"] = dict(config.get("regularization", {}),
                                        adaptive_noise=adaptive_conf)
        init_adaptive_noise_params(
            recognizer, float(adaptive_conf.get("init_sigma", 1e-6)))

    optimizer = build_optimizer(train_conf,
                                config.get("regularization", {}))
    step_fn = make_train_step(recognizer, optimizer, config, data.eos_label,
                              input_key)
    algorithm = GradientDescent(
        recognizer.params, optimizer, step_fn,
        batch_keys=(input_key, f"{input_key}_mask", "labels", "labels_mask"),
        rng=jax.random.PRNGKey(train_conf.get("seed", 1234)))
    # keep recognizer.params aliased to the live training params
    recognizer.params = algorithm.params

    extensions = []
    if use_load_ext and params_path:
        extensions.append(Load(params_path, load_iteration_state=True,
                               load_log=True))
    if load_log and params_path:
        extensions.append(LoadLog(params_path))
    extensions += [Timing(), CodeVersion(), CompilationStatistics()]

    average = AveragedTrainMonitoring(
        record_names=PRIMARY_OBSERVABLES, every_n_batches=10)
    extensions.append(average)

    validation = DataStreamMonitoring(
        _bind_eval(recognizer, make_eval_fn(recognizer, input_key),
                   algorithm),
        lambda: data.get_stream("valid", shuffle=False),
        prefix="valid").set_conditions(
            before_first_epoch=not fast_start,
            every_n_epochs=mon_conf.get("validate_every_epochs", 1),
            every_n_batches=mon_conf.get("validate_every_batches", 0))
    extensions.append(validation)

    search_conf = mon_conf.get("search", {})
    per_monitoring = None
    if search_conf:
        per_monitoring = BeamSearchErrorRate(
            recognizer, data,
            lambda: data.get_stream("valid", shuffle=False),
            beam_size=search_conf.get("beam_size", 10),
            char_discount=search_conf.get("char_discount"),
            round_to_inf=search_conf.get("round_to_inf"),
            stop_on=search_conf.get("stop_on"),
            prefix="valid").set_conditions(
                before_first_epoch=not fast_start,
                every_n_epochs=mon_conf.get("search_every_epochs", 1),
                every_n_batches=mon_conf.get("search_every_batches", 0))
        extensions.append(per_monitoring)

    track_the_best_per = None
    if per_monitoring is not None:
        track_the_best_per = TrackTheBest(
            per_monitoring.record_name_full).set_conditions(
                before_first_epoch=True, after_epoch=True)
        extensions.append(track_the_best_per)
    track_the_best_cost = TrackTheBest(
        validation.record_name("sequence_total_cost")).set_conditions(
            before_first_epoch=True, after_epoch=True)
    extensions.append(track_the_best_cost)

    extensions += [
        SwitchOffLengthFilter(
            data.length_filter,
            after_n_batches=train_conf.get("stop_filtering")),
        FinishAfter(after_n_batches=train_conf.get("num_batches"),
                    after_n_epochs=train_conf.get("num_epochs"))
        .add_condition(["after_batch"], _gradient_norm_is_nan),
    ]

    checkpoint = Checkpoint(
        save_path,
        before_first_epoch=not fast_start, after_epoch=True,
        every_n_batches=train_conf.get("save_every_n_batches"))
    if track_the_best_per is not None:
        checkpoint.add_condition(
            ["after_epoch"],
            predicate=_on_record(track_the_best_per.notification_name),
            arguments=(root_path + "_best" + extension,))
    checkpoint.add_condition(
        ["after_epoch"],
        predicate=_on_record(track_the_best_cost.notification_name),
        arguments=(root_path + "_best_ll" + extension,))
    extensions.append(checkpoint)

    if train_conf.get("patience"):
        patience_conf = dict(train_conf["patience"])
        if not patience_conf.get("notification_names"):
            names = [track_the_best_cost.notification_name]
            if track_the_best_per is not None:
                names.insert(0, track_the_best_per.notification_name)
            patience_conf["notification_names"] = names
        extensions.append(Patience(**patience_conf))

    plot_conf = mon_conf.get("plot")
    if plot_conf:
        from attention_lvcsr_tpu.train.extensions import Plot, PlotServer
        # the reference's five predefined channel groups
        # (lvsr/main.py:628-649)
        channels = plot_conf.get("channels") or [
            ["train_cost", "valid_sequence_total_cost"],
            ([per_monitoring.record_name_full]
             if per_monitoring is not None else []),
            ["total_gradient_norm", "total_step_norm"],
            ["max_energy", "min_energy"],
            ["weights_entropy", "weights_penalty"],
        ]
        channels = [g for g in channels if g]
        if plot_conf.get("path"):
            extensions.append(Plot(
                os.path.expandvars(plot_conf["path"]), channels,
                every_n_batches=plot_conf.get("every_n_batches", 100)))
        if plot_conf.get("serve"):
            extensions.append(PlotServer(
                channels, port=int(plot_conf.get("port", 0))))

    extensions.append(Printing(every_n_batches=1, after_epoch=True))

    return recognizer, algorithm, data, extensions


def _bind_eval(recognizer, eval_fn, algorithm):
    def fn(batch):
        recognizer.params = algorithm.params
        return eval_fn(batch)
    return fn


def _on_record(name):
    def predicate(log):
        return bool(log.current_row.get(name))
    return predicate


def train(config, save_path, params_path=None, fast_start=False,
          use_load_ext=False, load_log=False, profile=False):
    recognizer, algorithm, data, extensions = initialize_all(
        config, save_path, params_path, fast_start, use_load_ext, load_log)
    log = TrainingLog()
    log.status["_config"] = repr(dict(config))
    loop = MainLoop(
        algorithm=algorithm,
        data_stream_factory=lambda: data.get_stream("train"),
        log=log, extensions=extensions,
        profile_enabled=profile or bool(os.environ.get("LVSR_PROFILE")))
    loop.run()
    recognizer.params = algorithm.params
    return loop


def train_multistage(config, save_path, params_path=None, start_stage=None,
                     final_stage=None, **kwargs):
    """Chained multi-stage training (lvsr/main.py:896-922)."""
    if not getattr(config, "multi_stage", False):
        return train(config, save_path, params_path, **kwargs)
    os.makedirs(save_path, exist_ok=True)
    stages = list(config.ordered_stages.items())
    start_index = ([name for name, _ in stages].index(start_stage)
                   if start_stage else 0)
    loops = []
    for number in range(start_index, len(stages)):
        stage_name, stage_config = stages[number]
        print(f"Stage '{stage_name}' config:\n"
              + pprint.pformat(stage_config, width=100))
        stage_save_path = os.path.join(save_path, f"{stage_name}.zip")
        if number and not params_path:
            prev_name = stages[number - 1][0]
            suffix = stage_config.get("training", {}).get(
                "restart_from", "")
            stage_params = os.path.join(save_path,
                                        f"{prev_name}{suffix}.zip")
        else:
            stage_params = params_path
            params_path = None
        loops.append(train(stage_config, stage_save_path, stage_params,
                           **kwargs))
        if final_stage is not None and stage_name == final_stage:
            break
    return loops


def _batched_decode_iter(stream, recognizer, input_key, decode_batch,
                         search_kwargs, decode_only):
    """Group stream examples into chunks and decode each chunk in ONE
    batched on-device beam search (utterances x beam is the shape the
    decode is built for).  Yields (number, example, outputs, costs,
    seconds-per-utterance).  Note the decode-length cap comes from the
    chunk's longest utterance (the per-utterance path uses each
    utterance's own length)."""
    chunk = []

    def flush():
        if not chunk:
            return
        B = len(chunk)
        arrs = [np.asarray(ex[input_key]) for _, ex in chunk]
        max_t = max(len(a) for a in arrs)
        batch = np.zeros((B, max_t) + arrs[0].shape[1:], arrs[0].dtype)
        mask = np.zeros((B, max_t), np.float32)
        for i, a in enumerate(arrs):
            batch[i, :len(a)] = a
            mask[i, :len(a)] = 1.0
        before = time.time()
        out = recognizer.beam_search(batch, mask, as_arrays=True,
                                     **search_kwargs)
        took = (time.time() - before) / B
        for i, (number, ex) in enumerate(chunk):
            valid = out["done_valid"][i]
            if not valid.any():
                yield number, ex, [[]], [np.nan], took
                continue
            order = [k for k in np.argsort(out["done_adjusted"][i])
                     if valid[k]]
            outputs = [list(out["done_out"][i, k, :out["done_len"][i, k]])
                       for k in order]
            costs = [float(out["done_cost"][i, k]) for k in order]
            yield number, ex, outputs, costs, took
        chunk.clear()

    for number, example in enumerate(stream):
        if decode_only is not None and number not in decode_only:
            continue
        chunk.append((number, example))
        if len(chunk) >= decode_batch:
            yield from flush()
    yield from flush()


def search(config, load_path, part="valid", decode_only=None, report=None,
           decoded_save=None, nll_only=False, seed=None,
           print_to=sys.stdout):
    """Decode & score a dataset part (lvsr/main.py:705-864)."""
    data = Data(**config["data"])
    search_conf = config.get("monitoring", {}).get("search", {})
    recognizer = create_model(config, data, load_path)
    recognizer.init_beam_search(search_conf.get("beam_size", 10))
    input_key = ("recordings"
                 if "recordings" in recognizer.net_config["input_dims"]
                 else "inputs")

    dataset = data.get_dataset(part, add_sources=("uttids",)
                               if "uttids" in data.sources_map else ())
    add_sources = ("uttids",) if "uttids" in data.sources_map else ()
    stream = data.get_stream(part, batches=False,
                             shuffle=part == "train",
                             add_sources=add_sources,
                             num_examples=(500 if part == "train" else None),
                             seed=seed)

    vocabulary = None
    if config.get("vocabulary"):
        vocabulary = {}
        with open(os.path.expandvars(config["vocabulary"])) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    vocabulary[parts[0]] = parts[1]

    def to_words(chars):
        words = chars.split()
        return [vocabulary.get(word, vocabulary.get("<UNK>", "<UNK>"))
                for word in words]

    if report:
        os.makedirs(os.path.join(report, "alignments"), exist_ok=True)
        print_to = open(os.path.join(report, "report.txt"), "w")
    decoded_file = open(decoded_save, "w") if decoded_save else None

    stats = dict(num_examples=0, total_nll=0.0, total_errors=0.0,
                 total_length=0.0, total_wer_errors=0.0,
                 total_word_length=0.0)
    search_kwargs = {k: v for k, v in dict(
        char_discount=search_conf.get("char_discount"),
        round_to_inf=search_conf.get("round_to_inf"),
        stop_on=search_conf.get("stop_on"),
        # the reference's dataset-provided dictionary constraint
        # (lvsr/main.py:803-804); DecodeConstraint runs on device
        validate_solution_function=getattr(
            data.info_dataset, "validate_solution", None)).items() if v}

    # monitoring.search.decode_batch > 1: chunked batched decoding —
    # one on-device beam search per chunk instead of per utterance
    decode_batch = int(search_conf.get("decode_batch", 1) or 1)
    if decode_batch > 1 and not nll_only:
        example_iter = _batched_decode_iter(
            stream, recognizer, input_key, decode_batch, search_kwargs,
            decode_only)
    else:
        example_iter = ((n, ex, None, None, None)
                        for n, ex in enumerate(stream)
                        if decode_only is None or n in decode_only)

    for number, example, pre_out, pre_costs, pre_took in example_iter:
        uttids = example.pop("uttids", None)
        raw_groundtruth = np.asarray(example["labels"], np.int64)
        inputs = np.asarray(example[input_key], np.float32)
        print(f"Utterance {number} ({uttids})", file=print_to)
        groundtruth = dataset.decode(raw_groundtruth)
        groundtruth_text = dataset.pretty_print(raw_groundtruth, example)

        analysis = recognizer.analyze(
            jnp.asarray(inputs)[None], jnp.ones((1, len(inputs))),
            jnp.asarray(raw_groundtruth)[None],
            jnp.ones((1, len(raw_groundtruth))))
        nll = float(analysis["costs"].sum())
        weights_gt = analysis["weights"][:, 0, :]
        stats["total_nll"] += nll
        stats["num_examples"] += 1
        print("Groundtruth:", groundtruth_text, file=print_to)
        print("Groundtruth cost:", nll, file=print_to)
        print("Groundtruth weight std:",
              float(weights_std(weights_gt[:, None, :],
                                np.ones((len(weights_gt), 1), "f"))),
              file=print_to)
        print("Average groundtruth cost: {}".format(
            stats["total_nll"] / stats["num_examples"]), file=print_to)
        if nll_only:
            print_to.flush()
            continue

        if pre_out is not None:
            outputs, search_costs, took = pre_out, pre_costs, pre_took
        else:
            before = time.time()
            from attention_lvcsr_tpu.search.beam import \
                CandidateNotFoundError
            try:
                outputs, search_costs = recognizer.beam_search(
                    inputs, **search_kwargs)
            except CandidateNotFoundError:
                outputs, search_costs = [[]], [np.nan]
            took = time.time() - before

        recognized = dataset.decode(outputs[0])
        recognized_text = dataset.pretty_print(outputs[0], example)
        error = min(1, wer(groundtruth, recognized)) if recognized else 1
        stats["total_errors"] += len(groundtruth) * error
        stats["total_length"] += len(groundtruth)

        costs_recognized = weights_recognized = None
        if recognized:
            rec_analysis = recognizer.analyze(
                jnp.asarray(inputs)[None], jnp.ones((1, len(inputs))),
                jnp.asarray(np.asarray(outputs[0], np.int64))[None],
                jnp.ones((1, len(outputs[0]))))
            costs_recognized = float(rec_analysis["costs"].sum())
            weights_recognized = rec_analysis["weights"][:, 0, :]

        if vocabulary is not None:
            wer_error = min(1, wer(to_words(groundtruth_text),
                                   to_words(recognized_text)))
            stats["total_wer_errors"] += len(groundtruth) * wer_error
            stats["total_word_length"] += len(groundtruth)

        if report and recognized:
            from attention_lvcsr_tpu.utils.plots import save_alignment
            save_alignment(weights_gt, groundtruth, os.path.join(
                report, "alignments", f"{number}.groundtruth.png"))
            save_alignment(weights_recognized, recognized, os.path.join(
                report, "alignments", f"{number}.recognized.png"))

        if decoded_file is not None:
            print("{} {}".format(uttids, " ".join(recognized)),
                  file=decoded_file)

        print("Decoding took:", took, file=print_to)
        print("Beam search cost:", search_costs[0], file=print_to)
        print("Recognized:", recognized_text, file=print_to)
        if costs_recognized is not None:
            print("Recognized cost:", costs_recognized, file=print_to)
            print("Recognized weight std:",
                  float(weights_std(
                      weights_recognized[:, None, :],
                      np.ones((len(weights_recognized), 1), "f"))),
                  file=print_to)
        print("CER:", error, file=print_to)
        print("Average CER:",
              stats["total_errors"] / stats["total_length"], file=print_to)
        if vocabulary is not None:
            print("WER:", wer_error, file=print_to)
            print("Average WER:", stats["total_wer_errors"] /
                  stats["total_word_length"], file=print_to)
        print_to.flush()
    return stats


def sample(config, load_path, part="valid", print_to=sys.stdout):
    """Greedy/probabilistic sampling dump (lvsr/main.py:867-886)."""
    data = Data(**config["data"])
    recognizer = create_model(config, data, load_path)
    dataset = data.get_dataset(part)
    input_key = ("recordings"
                 if "recordings" in recognizer.net_config["input_dims"]
                 else "inputs")
    stream = data.get_stream(part, batches=False, shuffle=False)
    for number, example in enumerate(stream):
        raw_groundtruth = example["labels"]
        print(f"Utterance {number}", file=print_to)
        print("Groundtruth:",
              dataset.pretty_print(raw_groundtruth, example), file=print_to)
        result = recognizer.sample(
            np.asarray(example[input_key], np.float32))
        outputs = result["outputs"][:, 0]
        print("Recognized:", dataset.pretty_print(outputs, example),
              file=print_to)


def show_data(config):
    """Print a sample batch and its statistics (lvsr/main.py:889-893,
    sans IPython embed)."""
    data = Data(**config["data"])
    batch = next(iter(data.get_stream("train")))
    for key, value in batch.items():
        arr = np.asarray(value)
        print(f"{key}: shape={arr.shape} dtype={arr.dtype}")
        if arr.dtype.kind == "f":
            print(f"  mean={arr.mean():.4f} std={arr.std():.4f}")
    return batch


def init_norm(config, save_path):
    """Estimate feature normalization and save it (implements the CLI
    entry the reference advertises but lost, bin/run.py:142)."""
    from attention_lvcsr_tpu.data.preprocessing import Normalization
    config = dict(config)
    data_conf = dict(config["data"])
    data_conf.pop("normalization", None)
    data = Data(**data_conf)
    norm = Normalization.compute(
        data.get_stream("train", batches=False, shuffle=False),
        source="recordings")
    norm.save(save_path)
    print(f"saved normalization to {save_path}")
    return norm


def test(config, **kwargs):
    raise NotImplementedError("the reference's 'test' entry is also "
                              "unimplemented (lvsr/main.py:925-926)")
