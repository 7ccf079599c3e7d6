"""The recognizer: bottom -> encoder -> top -> attention decoder.

TPU-native counterpart of ``lvsr/bricks/recognizer.py:159-562``
(``SpeechRecognizer``).  Two layers:

* :class:`RecognizerNet` — a pure flax module assembling the network from
  the ``net`` config section; methods ``encode``/``cost``/``generate`` plus
  the split decode-step interface used by the on-device beam search.
* :class:`SpeechRecognizer` — the host-side wrapper owning parameters,
  jit caches, config-driven initialization, checkpoint IO and the
  beam-search/analyze/sample public surface of the reference class.

Parameter paths are slash-joined module paths under ``/recognizer`` —
the same *role* the reference's brick paths play for config-driven
initialization (``lvsr/main.py:225-232``) and checkpoint surgery.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import traverse_util

from attention_lvcsr_tpu.models import initializers as inits
from attention_lvcsr_tpu.models.attention import make_attention
from attention_lvcsr_tpu.models.bottom import (LookupBottom, SpeechBottom,
                                               make_bottom)
from attention_lvcsr_tpu.models.encoder import Encoder
from attention_lvcsr_tpu.models.generator import (Readout,
                                                  SequenceGenerator,
                                                  ShallowFusionReadout)


def _canon(name):
    """'blocks.bricks.recurrent.GatedRecurrent' -> 'GatedRecurrent'."""
    return name.rsplit(".", 1)[-1] if isinstance(name, str) else name


class TopMLP(nn.Module):
    """Optional MLP on top of the encoder (recognizer.py:244-248)."""
    dims: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = jnp.tanh(nn.Dense(d, name=f"top_{i}")(x))
        return nn.Dense(self.out_dim, name="top_out")(x)


class RecognizerNet(nn.Module):
    """Network assembly from the ``net`` config section."""
    input_dims: Mapping[str, int]
    input_num_chars: Mapping[str, int]
    eos_label: int
    num_phonemes: int
    dim_dec: int
    dims_bidir: Sequence[int]
    enc_transition: str = "gru"
    dec_transition: str = "gru"
    attention_type: str = "content"
    use_states_for_readout: bool = False
    criterion: Mapping[str, Any] = None
    bottom: Mapping[str, Any] = None
    lm: Optional[Mapping[str, Any]] = None
    character_map: Optional[Mapping[str, int]] = None
    bidir: bool = True
    subsample: Optional[Sequence[int]] = None
    dims_top: Optional[Sequence[int]] = None
    prior: Optional[Mapping[str, Any]] = None
    conv_n: Optional[int] = None
    post_merge_activation: str = "tanh"
    post_merge_dims: Optional[Sequence[int]] = None
    dim_matcher: Optional[int] = None
    embed_outputs: bool = True
    dim_output_embedding: Optional[int] = None
    dec_stack: int = 1
    conv_num_filters: int = 1
    data_prepend_eos: bool = True
    energy_normalizer: Optional[str] = None
    max_decoded_length_scale: float = 1.0
    # Regularization knobs applied inside the cost graph (the reference
    # applies dropout 0.5 to the bottom output via graph surgery,
    # lvsr/main.py:402-404).
    dropout: bool = False
    # Pallas kernel policy for the decode path (models/attention.py)
    use_pallas: str = "auto"

    def setup(self):
        criterion = dict(self.criterion or {"name": "log_likelihood"})
        self.bottom_dropout = nn.Dropout(rate=0.5)
        self.bottom_net = make_bottom(
            dict(self.bottom or {"bottom_class": "speech"}),
            dict(self.input_dims), dict(self.input_num_chars), name="bottom")
        subsample = tuple(self.subsample or [1] * len(self.dims_bidir))
        self.encoder = Encoder(
            transition=_canon(self.enc_transition),
            dims=tuple(self.dims_bidir), subsample=subsample,
            bidir=self.bidir, name="encoder")
        dim_encoded = self.encoder.dim_encoded
        if self.dims_top:
            self.top = TopMLP(tuple(self.dims_top), dim_encoded, name="top")
        else:
            self.top = None

        state_names = (("states",) if self.dec_stack == 1 else
                       tuple(f"states_{i}" for i in range(self.dec_stack)))
        attention = make_attention(
            self.attention_type, state_names, dim_encoded,
            self.dim_matcher or self.dim_dec, conv_n=self.conv_n,
            conv_num_filters=self.conv_num_filters, prior=self.prior,
            energy_normalizer=self.energy_normalizer,
            use_pallas=self.use_pallas)

        source_names = (list(state_names) if self.use_states_for_readout
                        else []) + ["weighted_averages"]
        lm_module = None
        lm_conf = dict(self.lm) if self.lm else {}
        if lm_conf.get("path"):
            from attention_lvcsr_tpu.models.lm import make_language_model
            lm_weight = lm_conf.pop("weight", 0.0)
            readout = ShallowFusionReadout(
                source_names=tuple(source_names),
                readout_dim=self.num_phonemes,
                post_merge_dims=(tuple(self.post_merge_dims)
                                 if self.post_merge_dims else None),
                post_merge_activation=self.post_merge_activation,
                lm_costs_name="lm_add",
                lm_weight=lm_weight,
                normalize_am_weights=lm_conf.pop("normalize_am_weights", True),
                normalize_lm_weights=lm_conf.pop("normalize_lm_weights", False),
                normalize_tot_weights=lm_conf.pop("normalize_tot_weights", False),
                am_beta=lm_conf.pop("am_beta", 1.0))
            lm_module = make_language_model(
                lm_conf, nn_char_map=dict(self.character_map or {}),
                name="language_model")
        else:
            readout = Readout(
                source_names=tuple(source_names),
                readout_dim=self.num_phonemes,
                post_merge_dims=(tuple(self.post_merge_dims)
                                 if self.post_merge_dims else None),
                post_merge_activation=self.post_merge_activation)

        self.generator = SequenceGenerator(
            attention=attention, readout=readout,
            num_outputs=self.num_phonemes, dim_dec=self.dim_dec,
            dec_transition=_canon(self.dec_transition),
            dec_stack=self.dec_stack, embed_outputs=self.embed_outputs,
            dim_output_embedding=self.dim_output_embedding,
            use_states_for_readout=self.use_states_for_readout,
            criterion=criterion["name"],
            min_reward=float(criterion.get("min_reward", -1.0)),
            language_model=lm_module, name="generator")

    # -- pieces ------------------------------------------------------------
    def encode(self, inputs, inputs_mask, dropout=False, fast=False):
        """bottom -> encoder -> top. inputs: (B, T, F) or (B, T) ints.

        ``fast=True`` (inference paths only) runs the recurrent layers
        through the fused forward-only Pallas scan on TPU."""
        bottom_out = self.bottom_net(inputs)
        if dropout:
            bottom_out = self.bottom_dropout(bottom_out,
                                             deterministic=False)
        pallas = None
        if self.use_pallas != "never":
            if fast:
                # forward-only fused scan (inference paths)
                if self.use_pallas == "interpret":
                    pallas = "interpret"
                elif jax.default_backend() == "tpu":
                    pallas = "compile"
            elif not os.environ.get("LVSR_NO_TRAIN_GRU"):
                # differentiable fused scan (custom VJP) for training;
                # needs single-device SHAPES (parallel/mesh.py)
                from attention_lvcsr_tpu.parallel.mesh import \
                    pallas_train_kernels_allowed
                if self.use_pallas == "interpret":
                    pallas = "train_interpret"
                elif pallas_train_kernels_allowed():
                    pallas = "train"
        encoded, encoded_mask = self.encoder(bottom_out, inputs_mask,
                                             pallas=pallas)
        if self.top is not None:
            encoded = self.top(encoded)
        return encoded, encoded_mask, bottom_out

    def cost(self, inputs, inputs_mask, labels, labels_mask,
             prediction=None, prediction_mask=None, train=False):
        """Teacher-forced cost graph (recognizer.py:375-390).

        ``labels``/masks are batch-major (B, T); internally time-major.
        Returns the generator's evaluate dict plus encoder diagnostics.
        With ``train=True`` and ``dropout`` configured, dropout(0.5) is
        applied to the bottom output (rng collection 'dropout').
        """
        encoded, encoded_mask, bottom_out = self.encode(
            inputs, inputs_mask,
            dropout=self.dropout and train)
        fed = prediction if prediction is not None else labels
        fed_mask = (prediction_mask if prediction_mask is not None
                    else labels_mask)
        result = self.generator.evaluate(
            encoded, encoded_mask,
            fed.T, fed_mask.T if fed_mask is not None else None,
            groundtruth=labels.T)
        result["encoded"] = encoded
        result["encoded_mask"] = encoded_mask
        result["bottom_output"] = bottom_out
        return result

    def generate(self, inputs, inputs_mask, n_steps, rng):
        # generation is forward-only (exploration stops gradients), so
        # use the fast encode path: no backward residuals
        encoded, encoded_mask, _ = self.encode(inputs, inputs_mask,
                                               fast=True)
        return self.generator.generate(encoded, encoded_mask, n_steps, rng)

    # -- decode-step interface (used by search.beam) ----------------------
    def decode_contexts(self, inputs, inputs_mask):
        encoded, encoded_mask, _ = self.encode(inputs, inputs_mask,
                                               fast=True)
        ctx = {
            "attended": encoded,
            "preprocessed": self.generator.attention.preprocess(encoded),
            "attended_mask": encoded_mask,
        }
        att = self.generator.attention
        pallas = getattr(att, "_pallas_mode", lambda: None)()
        # the fully-fused score kernel is opt-in (use_pallas='fused'):
        # measured slower than the XLA+energy-kernel path on the current
        # runtime (sequential per-utterance grid), kept for iteration
        if pallas is not None and \
                getattr(att, "use_pallas", "") in ("fused", "interpret") \
                and self.generator.fused_score_supported():
            ctx["fused_tables"] = self.generator.fused_score_tables(
                encoded.shape[1], encoded.dtype)
        return ctx

    def decode_loop(self, inputs, inputs_mask):
        """Everything shape-dependent the whole-loop decode kernel
        consumes (ops/pallas/beam_loop.py): encoder outputs +
        preprocessed energies input.  The (params-only) dense weight
        tables come from :meth:`decode_loop_tables` so the caller can
        cache them across search calls."""
        encoded, encoded_mask, _ = self.encode(inputs, inputs_mask,
                                               fast=True)
        return {
            "pre": self.generator.attention.preprocess(encoded),
            "attended": encoded,
            "attended_mask": encoded_mask,
        }

    def decode_loop_tables(self, length, dtype):
        return self.generator.loop_decode_tables(length, dtype)

    def decode_init(self, batch_size, contexts):
        return self.generator.initial_states(batch_size,
                                             contexts["attended"])

    def decode_score(self, carry, contexts, beam=1):
        return self.generator.score_step(carry, contexts, beam=beam)

    def decode_advance(self, carry, g_new, outputs, contexts):
        return self.generator.advance_states(carry, g_new, outputs, contexts)


# ---------------------------------------------------------------------------
# Config-driven initialization
# ---------------------------------------------------------------------------

_RECURRENT_NAMES = {"state_to_state", "state_to_gates", "W", "W_state"}
_BIAS_NAMES = {"bias", "merge_bias"}
_INITIAL_STATE_NAMES = {"initial_state", "initial_cells"}


def classify_param(path: Tuple[str, ...]) -> str:
    leaf = path[-1]
    if leaf in _INITIAL_STATE_NAMES:
        return "initial_state"
    if leaf in _BIAS_NAMES:
        return "bias"
    if leaf in _RECURRENT_NAMES and any("cell" in p or "transition" in p
                                        for p in path):
        return "recurrent_weight"
    return "weight"


_CATEGORY_KEYS = {
    "weight": ("weights_init",),
    "recurrent_weight": ("rec_weights_init", "weights_init"),
    "bias": ("biases_init",),
    "initial_state": ("initial_states_init",),
}

_CATEGORY_DEFAULTS = {
    "bias": inits.Constant(0.0),
    "initial_state": inits.Constant(0.0),
}


def initialize_params(shapes: Dict, init_config: Mapping[str, Mapping],
                      seed: int = 1234):
    """Generate parameters per the config ``initialization`` section.

    ``init_config`` maps brick-style paths (``/recognizer`` or
    ``/recognizer/generator/...``) to dicts of scheme keys
    (``weights_init``/``biases_init``/``rec_weights_init``/
    ``initial_states_init``); deeper paths win (lvsr/main.py:225-232).
    ``shapes`` is the flax variables dict (or a matching ShapeDtypeStruct
    tree).
    """
    init_config = {k.rstrip("/"): dict(v)
                   for k, v in (init_config or {}).items()}
    flat = traverse_util.flatten_dict(shapes["params"])
    out = {}
    for path, leaf in flat.items():
        full = "/recognizer/" + "/".join(path)
        category = classify_param(path)
        chosen = None
        chosen_depth = -1
        for cfg_path, schemes in init_config.items():
            if not (full == cfg_path or full.startswith(cfg_path + "/")):
                continue
            for key in _CATEGORY_KEYS[category]:
                if key in schemes and cfg_path.count("/") > chosen_depth:
                    chosen = schemes[key]
                    chosen_depth = cfg_path.count("/")
                    break
        if chosen is None:
            chosen = _CATEGORY_DEFAULTS.get(category,
                                            inits.IsotropicGaussian(0.1))
        initializer = inits.get_initializer(chosen)
        shape = tuple(leaf.shape)
        if isinstance(initializer, inits.Orthogonal) and len(shape) != 2:
            initializer = inits.IsotropicGaussian(0.1)
        # stable per-path seed (python's hash() is salted per process,
        # which would make initialization irreproducible across runs)
        import zlib
        path_hash = zlib.crc32(full.encode())
        rng = np.random.RandomState((seed + path_hash) % (2 ** 31 - 1))
        out[path] = jnp.asarray(initializer.generate(rng, shape))
    return {"params": traverse_util.unflatten_dict(out)}


_COLLECTION_PREFIXES = {"params": "recognizer", "noise": "adaptive_noise"}


def param_path_dict(params) -> Dict[str, np.ndarray]:
    """Flatten params to ``{'/recognizer/a/b/leaf': array}`` (checkpoints).

    The trainable 'params' collection lives under ``/recognizer``; the
    adaptive-noise log-variances (collection 'noise') under
    ``/adaptive_noise`` (matching the reference's NoiseBrick naming,
    lvsr/graph.py:36).  Non-trainable collections (e.g. packed FST
    tables) are not checkpointed — they are rebuilt from their sources.
    """
    out = {}
    for collection, prefix in _COLLECTION_PREFIXES.items():
        if collection not in params:
            continue
        flat = traverse_util.flatten_dict(params[collection])
        out.update({f"/{prefix}/" + "/".join(k): np.asarray(v)
                    for k, v in flat.items()})
    return out


def params_from_path_dict(path_dict: Mapping[str, np.ndarray]):
    by_collection: Dict[str, Dict] = {}
    inverse = {p: c for c, p in _COLLECTION_PREFIXES.items()}
    for key, value in path_dict.items():
        parts = tuple(key.lstrip("/").split("/"))
        collection = inverse.get(parts[0])
        if collection is not None:
            parts = parts[1:]
        else:
            collection = "params"
        by_collection.setdefault(collection, {})[parts] = jnp.asarray(value)
    return {c: traverse_util.unflatten_dict(flat)
            for c, flat in by_collection.items()}


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

class SpeechRecognizer:
    """Owns the net + params; public surface of the reference recognizer."""

    def __init__(self, net_config: Mapping[str, Any], *,
                 init_config: Optional[Mapping] = None, seed: int = 1234,
                 params=None):
        self.net_config = dict(net_config)
        # decode-time compute dtype (not a network-architecture option)
        self.compute_dtype = self.net_config.pop("compute_dtype", None)
        self.net = RecognizerNet(**self.net_config)
        self.eos_label = self.net_config["eos_label"]
        self.num_phonemes = self.net_config["num_phonemes"]
        self.character_map = self.net_config.get("character_map")
        self.data_prepend_eos = self.net_config.get("data_prepend_eos", True)
        self.max_decoded_length_scale = self.net_config.get(
            "max_decoded_length_scale", 1.0)
        self._jit_cache: Dict[str, Any] = {}
        self._beam_search = None
        self.beam_size = None
        if params is not None:
            self.params = params
        else:
            self.params = self.init_params(init_config or {}, seed=seed)

    # -- parameters --------------------------------------------------------
    def _example_batch(self):
        bottom = self.net_config.get("bottom") or {"bottom_class": "speech"}
        kind = _canon(bottom.get("bottom_class", "speech"))
        B, T = 2, 12
        if kind in ("speech", "SpeechBottom"):
            F = self.net_config["input_dims"]["recordings"]
            inputs = jnp.zeros((B, T, F), jnp.float32)
        else:
            inputs = jnp.zeros((B, T), jnp.int32)
        inputs_mask = jnp.ones((B, T), jnp.float32)
        labels = jnp.zeros((B, 5), jnp.int32)
        labels_mask = jnp.ones((B, 5), jnp.float32)
        return inputs, inputs_mask, labels, labels_mask

    def init_params(self, init_config, seed=1234):
        example = self._example_batch()
        lm_conf = self.net_config.get("lm") or {}
        if lm_conf.get("path"):
            # a real init also materializes the non-trainable 'fst'
            # collection (packed LM tables); params are then re-generated
            # per the config below.
            variables = self.net.init(jax.random.PRNGKey(0), *example,
                                      method=self.net.cost)
            shapes = variables
        else:
            shapes = jax.eval_shape(
                functools.partial(self.net.init, method=self.net.cost),
                jax.random.PRNGKey(0), *example)
            variables = {}
        out = initialize_params(shapes, init_config, seed=seed)
        for collection, value in variables.items():
            if collection != "params":
                out[collection] = value
        return out

    def load_params(self, path):
        from attention_lvcsr_tpu.train.checkpoint import load_parameters
        loaded = params_from_path_dict(load_parameters(path))
        # keep non-trainable collections (e.g. packed FST tables)
        extras = {k: v for k, v in self.params.items() if k != "params"}
        self.params = {**extras, "params": loaded["params"]}
        self._jit_cache.clear()

    def save_params(self, path):
        from attention_lvcsr_tpu.train.checkpoint import save_parameters
        save_parameters(path, param_path_dict(self.params))

    # -- compiled entry points --------------------------------------------
    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def cost_fn(self):
        def fn(params, inputs, inputs_mask, labels, labels_mask):
            return self.net.apply(params, inputs, inputs_mask, labels,
                                  labels_mask, method=self.net.cost)
        return self._jitted("cost", fn)

    def analyze(self, inputs, inputs_mask, labels, labels_mask):
        """Per-utterance cost + alignment (recognizer.analyze:452-494)."""
        out = self.cost_fn()(self.params, inputs, inputs_mask, labels,
                             labels_mask)
        return {
            "costs": np.asarray(out["costs"]),
            "weights": np.asarray(out["weights"]),
            "energies": (np.asarray(out["energies"])
                         if out.get("energies") is not None else None),
        }

    # -- beam search -------------------------------------------------------
    def init_beam_search(self, beam_size, compute_dtype="default"):
        from attention_lvcsr_tpu.search.beam import BeamSearch
        if compute_dtype == "default":
            compute_dtype = self.compute_dtype
        if self._beam_search is not None and self.beam_size == beam_size \
                and self._beam_search.compute_dtype == compute_dtype:
            return
        self.beam_size = beam_size
        self._beam_search = BeamSearch(self, beam_size,
                                       compute_dtype=compute_dtype)

    def beam_search(self, inputs, inputs_mask=None,
                    pad_frames_multiple=100, pad_batch_multiple=8,
                    **kwargs):
        """Decode a single utterance or a batch; see search.beam.

        Inputs are zero-padded (with zero mask) to a small set of static
        shapes — time to a multiple of ``pad_frames_multiple`` frames and
        batch to a multiple of ``pad_batch_multiple`` — so per-utterance
        decoding does not recompile for every distinct length (the
        bucketed-shape discipline of SURVEY.md §5).  The decode-length cap
        uses the true (pre-padding) length; padded batch rows produce
        ignorable entries past the caller's batch size.
        """
        self.init_beam_search(self.beam_size or 10)
        # Device arrays stay on device: converting them to numpy here
        # would round-trip the (large) feature tensor host<->device on
        # every call, which dwarfs the decode itself on a tunneled chip.
        on_device = isinstance(inputs, jax.Array)
        if not on_device:
            inputs = np.asarray(inputs)
        if (inputs.ndim == 2 and np.issubdtype(inputs.dtype, np.floating)) \
                or inputs.ndim == 1:
            # single utterance: (T, F) floats or (T,) discrete tokens
            inputs = inputs[None]
        xp = jnp if on_device else np
        if inputs_mask is None:
            inputs_mask = xp.ones(inputs.shape[:2], np.float32)
        else:
            inputs_mask = xp.asarray(inputs_mask, np.float32)
        B, T = inputs.shape[:2]
        max_length = int(T / self.max_decoded_length_scale)

        def up(n, m):
            return -(-n // m) * m if m and m > 1 else n

        T_pad, B_pad = up(T, pad_frames_multiple), up(B, pad_batch_multiple)
        if B == 1:
            B_pad = 1  # the single-utterance path stays single
        if (T_pad, B_pad) != (T, B):
            widths = (((0, B_pad - B), (0, T_pad - T))
                      + ((0, 0),) * (inputs.ndim - 2))
            inputs = xp.pad(inputs, widths)
            inputs_mask = xp.pad(inputs_mask, widths[:2])
        return self._beam_search.search(
            self.params, inputs, inputs_mask, self.eos_label, max_length,
            ignore_first_eol=self.data_prepend_eos, **kwargs)

    def sample(self, inputs, inputs_mask=None, n_steps=None, rng=None):
        if inputs.ndim == 2:
            inputs = inputs[None]
        if inputs_mask is None:
            inputs_mask = np.ones(inputs.shape[:2], np.float32)
        if n_steps is None:
            n_steps = int(inputs.shape[1] / self.max_decoded_length_scale)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def fn(params, x, m, r):
            return self.net.apply(params, x, m, n_steps, r,
                                  method=self.net.generate)
        key = f"generate_{n_steps}"
        out = self._jitted(key, fn)(self.params, inputs, inputs_mask, rng)
        return {k: np.asarray(v) for k, v in out.items()}
