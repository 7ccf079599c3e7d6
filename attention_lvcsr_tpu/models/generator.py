"""Attention sequence-generator decoder: teacher-forced cost + one-step generate.

TPU-first re-design of the Blocks generation stack
(``blocks/bricks/sequence_generators.py``: BaseSequenceGenerator:48,
Readout:531, SoftmaxEmitter:751, LookupFeedback:820;
``blocks/bricks/attention.py``: AttentionRecurrent:479) and the lvsr
additions (``lvsr/bricks/language_models.py``: ShallowFusionReadout:74,
LMEmitter:147; ``lvsr/bricks/__init__.py``: RewardRegressionEmitter:119).

Scheduling (identical to the reference's evaluate/generate contract):

* step ``t`` readout uses the *pre-update* states ``s_t``, the glimpses
  ``g_{t+1}`` computed from ``s_t``/``g_t``, and feedback of the *previous*
  output (initial output at ``t==0``);
* the transition then consumes feedback of the *current* output together
  with ``g_{t+1}`` (added onto the fork projections through a bias-free
  "distribute" projection, blocks attention.py:558-563,656-660).

TPU-first re-design decisions:

* feedback + fork projections for the whole label sequence are batched
  matmuls outside the scan (MXU); the scan only carries state updates and
  glimpse computation;
* the readout/cost over all steps happens after the scan as one big
  ``(T*B, V)`` matmul block;
* for decoding, the step is split into ``score_step`` (glimpses + per-symbol
  costs) and ``advance_states`` (consume a chosen symbol) so the on-device
  beam search can insert its top-k between them.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from attention_lvcsr_tpu.models.attention import BaseAttention
from attention_lvcsr_tpu.models.cells import make_cell


# ---------------------------------------------------------------------------
# Feedback
# ---------------------------------------------------------------------------

class LookupFeedback(nn.Module):
    """Embeds integer outputs (blocks LookupFeedback:820)."""
    num_outputs: int
    feedback_dim: int

    @nn.compact
    def __call__(self, outputs):
        embed = nn.Embed(self.num_outputs, self.feedback_dim, name="lookup")
        return embed(outputs)


class OneOfNFeedback(nn.Module):
    """One-hot feedback (lvsr OneOfNFeedback, lvsr/bricks/__init__.py:86)."""
    num_outputs: int

    @nn.compact
    def __call__(self, outputs):
        return jax.nn.one_hot(outputs, self.num_outputs)


# ---------------------------------------------------------------------------
# Readout
# ---------------------------------------------------------------------------

class Readout(nn.Module):
    """Merge sources -> post-merge MLP -> logits.

    ``merge``: per-source bias-free linear into ``merged_dim``, summed
    (blocks Readout:594-612 with the default Merge).  ``post_merge``:
    ``Bias -> activation -> MLP(post_merge_dims -> readout_dim)`` when
    ``post_merge_dims`` is set (lvsr recognizer.py:305-319), otherwise just
    a bias.
    """
    source_names: Sequence[str]
    readout_dim: int
    post_merge_dims: Optional[Sequence[int]] = None
    post_merge_activation: str = "tanh"

    @property
    def merged_dim(self):
        return (self.post_merge_dims[0] if self.post_merge_dims
                else self.readout_dim)

    def setup(self):
        self.merge = {
            name: nn.Dense(self.merged_dim, use_bias=False,
                           name=f"merge_{name}")
            for name in self.source_names
        }
        self.merge_bias = self.param("merge_bias", nn.initializers.zeros,
                                     (self.merged_dim,))
        if self.post_merge_dims:
            dims = list(self.post_merge_dims[1:]) + [self.readout_dim]
            self.post_merge = [nn.Dense(d, name=f"post_merge_{i}")
                               for i, d in enumerate(dims)]
        else:
            self.post_merge = []

    def _activation(self, x):
        act = self.post_merge_activation
        if act == "tanh":
            return jnp.tanh(x)
        if act in ("relu", "rectifier"):
            return jax.nn.relu(x)
        if act in ("sigmoid", "logistic"):
            return jax.nn.sigmoid(x)
        if act == "identity":
            return x
        if act.startswith("maxout"):
            # max over groups of ``num_pieces`` units; shrinks the last dim
            # by that factor (blocks/bricks/simple.py:160-181 — the MLP dim
            # trick in lvsr recognizer.py:307-317 then feeds d//pieces to
            # the next layer, which flax infers automatically).
            pieces = int(act.split(":")[1]) if ":" in act else 2
            d = x.shape[-1]
            if d % pieces:
                raise ValueError(
                    f"maxout: last dim {d} not divisible by {pieces}")
            grouped = x.reshape(x.shape[:-1] + (d // pieces, pieces))
            return jnp.max(grouped, axis=-1)
        raise ValueError(act)

    def __call__(self, sources: Mapping[str, Any]):
        merged = self.merge_bias
        for name in self.source_names:
            merged = merged + self.merge[name](sources[name])
        if self.post_merge:
            x = self._activation(merged)
            for i, layer in enumerate(self.post_merge):
                x = layer(x)
                if i < len(self.post_merge) - 1:
                    x = self._activation(x)
            return x
        return merged


class ShallowFusionReadout(Readout):
    """AM/LM shallow fusion (lvsr/bricks/language_models.py:74-104).

    ``x = am_beta * AM + lm_weight * (-lm_add)`` with optional log-softmax
    normalization of each term and/or the sum.
    """
    lm_costs_name: str = "lm_add"
    lm_weight: float = 0.0
    normalize_am_weights: bool = True
    normalize_lm_weights: bool = False
    normalize_tot_weights: bool = False
    am_beta: float = 1.0

    def __call__(self, sources: Mapping[str, Any]):
        sources = dict(sources)
        lm_costs = -sources.pop(self.lm_costs_name)
        if self.normalize_lm_weights:
            lm_costs = jax.nn.log_softmax(lm_costs, axis=-1)
        am = self.am_beta * super().__call__(sources)
        if self.normalize_am_weights:
            am = jax.nn.log_softmax(am, axis=-1)
        x = am + self.lm_weight * lm_costs
        if self.normalize_tot_weights:
            x = jax.nn.log_softmax(x, axis=-1)
        return x


# ---------------------------------------------------------------------------
# Emitters (stateless strategies over readouts)
# ---------------------------------------------------------------------------

class SoftmaxEmitter:
    """Categorical emitter (blocks SoftmaxEmitter:751)."""

    def __init__(self, initial_output=0):
        self.initial_output = initial_output

    def emit(self, rng, readouts):
        return jax.random.categorical(rng, readouts, axis=-1)

    def cost(self, readouts, outputs):
        logp = jax.nn.log_softmax(readouts, axis=-1)
        return -jnp.take_along_axis(logp, outputs[..., None], axis=-1)[..., 0]

    def costs(self, readouts):
        return -jax.nn.log_softmax(readouts, axis=-1)

    def initial_outputs(self, batch_size):
        return jnp.full((batch_size,), self.initial_output, dtype=jnp.int32)


class LMEmitter:
    """No-op emitter when normalization lives in ShallowFusionReadout
    (lvsr/bricks/language_models.py:147-184)."""

    def __init__(self, initial_output=0):
        self.initial_output = initial_output

    def emit(self, rng, readouts):
        return jnp.argmax(readouts, axis=-1)

    def cost(self, readouts, outputs):
        return -jnp.take_along_axis(readouts, outputs[..., None],
                                    axis=-1)[..., 0]

    def costs(self, readouts):
        return -readouts

    def initial_outputs(self, batch_size):
        return jnp.full((batch_size,), self.initial_output, dtype=jnp.int32)


class RewardRegressionEmitter:
    """Readouts are per-symbol predicted gains; greedy emission
    (lvsr/bricks/__init__.py:119-202).  The MSE-vs-reward criterion itself
    is applied in ``SequenceGenerator.evaluate`` because it needs the
    host-computed reward/gain matrices."""

    def __init__(self, initial_output=0):
        self.initial_output = initial_output

    def emit(self, rng, readouts):
        return jnp.argmax(readouts, axis=-1)

    def cost(self, readouts, outputs):
        return jnp.take_along_axis(readouts, outputs[..., None],
                                   axis=-1)[..., 0]

    def costs(self, readouts):
        return -readouts

    def initial_outputs(self, batch_size):
        return jnp.zeros((batch_size,), dtype=jnp.int32)


# ---------------------------------------------------------------------------
# The generator
# ---------------------------------------------------------------------------

def _mask_mix(mask, new, old):
    if mask is None:
        return new
    return jax.tree.map(
        lambda n, o: jnp.where(
            mask.reshape(mask.shape + (1,) * (n.ndim - mask.ndim)) > 0, n, o),
        new, old)


class SequenceGenerator(nn.Module):
    """Decoder: stacked recurrent transition + attention + readout.

    Parameters (mirroring the lvsr config surface, recognizer.py:250-343):
    ``dec_transition`` cell type; ``dim_dec``; ``dec_stack`` layers with
    skip connections; an attention module; feedback/readout settings.
    """
    attention: BaseAttention
    readout: Readout
    num_outputs: int              # alphabet size (num_phonemes)
    dim_dec: int
    dec_transition: str = "gru"
    dec_stack: int = 1
    embed_outputs: bool = True
    dim_output_embedding: Optional[int] = None
    use_states_for_readout: bool = False
    criterion: str = "log_likelihood"
    min_reward: float = -1.0
    # Optional FST language model for shallow fusion; see models/lm.py.
    language_model: Optional[Any] = None

    def setup(self):
        feedback_dim = (self.dim_output_embedding or self.dim_dec)
        if self.embed_outputs:
            self.feedback = LookupFeedback(self.num_outputs + 1, feedback_dim,
                                           name="feedback")
        else:
            self.feedback = OneOfNFeedback(self.num_outputs + 1,
                                           name="feedback")

        cells = []
        forks = []
        distributes = []
        interlayer = []
        for layer in range(self.dec_stack):
            cell = make_cell(self.dec_transition, self.dim_dec,
                             name=f"transition_{layer}")
            cells.append(cell)
            dims = cell.sequence_dims()
            forks.append({
                seq: nn.Dense(d, name=f"fork_{layer}_{seq}")
                for seq, d in dims.items()})
            distributes.append({
                seq: nn.Dense(d, use_bias=False,
                              name=f"distribute_{layer}_{seq}")
                for seq, d in dims.items()})
            if layer > 0:
                interlayer.append({
                    seq: nn.Dense(d, use_bias=False,
                                  name=f"interlayer_{layer}_{seq}")
                    for seq, d in dims.items()})
        self.cells = cells
        self.forks = forks
        self.distributes = distributes
        self.interlayer = interlayer

    # -- naming ------------------------------------------------------------
    @property
    def state_names(self) -> Tuple[str, ...]:
        if self.dec_stack == 1:
            return ("states",)
        return tuple(f"states_{i}" for i in range(self.dec_stack))

    def _att_states(self, states):
        """States dict keyed the way the attention module expects."""
        return {name: states[i]["states"]
                for i, name in enumerate(self.state_names)}

    # -- pieces ------------------------------------------------------------
    def initial_states(self, batch_size, attended):
        states = [cell.initial_states(batch_size) for cell in self.cells]
        glimpses = self.attention.initial_glimpses(batch_size, attended)
        outputs = jnp.full((batch_size,), self.initial_output,
                           dtype=jnp.int32)
        carry = {"states": states, "glimpses": glimpses, "outputs": outputs}
        if self.language_model is not None:
            carry["lm"] = self.language_model.initial_states(batch_size)
        return carry

    @property
    def initial_output(self):
        # SoftmaxEmitter(initial_output=num_phonemes): the extra feedback
        # row.  The reward-regression emitter starts from zero
        # (lvsr/bricks/__init__.py:195-197).
        if self.criterion.startswith("mse"):
            return 0
        return self.num_outputs

    def emitter(self):
        if self.criterion.startswith("mse"):
            return RewardRegressionEmitter()
        if self.language_model is not None:
            return LMEmitter(initial_output=self.initial_output)
        return SoftmaxEmitter(initial_output=self.initial_output)

    def _fork_all(self, feedback):
        """Fork projections for every layer; feedback (..., Fd)."""
        return [{seq: fork(feedback) for seq, fork in layer.items()}
                for layer in self.forks]

    def _compute_states(self, states, forked, wa, mask=None):
        """One transition step for the whole stack (with skip connections)."""
        new_states = []
        below = None
        for layer in range(self.dec_stack):
            seqs = {}
            for seq in self.forks[layer]:
                val = forked[layer][seq] + self.distributes[layer][seq](wa)
                if layer > 0:
                    val = val + self.interlayer[layer - 1][seq](below)
                seqs[seq] = val
            updated = self.cells[layer].one_step(states[layer], seqs,
                                                 mask=mask)
            new_states.append(updated)
            below = updated["states"]
        return new_states

    def _readout_sources(self, states, glimpses, feedback, lm_state=None):
        sources = {}
        if self.use_states_for_readout:
            for i, name in enumerate(self.state_names):
                sources[name] = states[i]["states"]
        sources["weighted_averages"] = glimpses["weighted_averages"]
        if "feedback" in self.readout.source_names:
            sources["feedback"] = feedback
        if self.language_model is not None and lm_state is not None:
            sources["lm_add"] = lm_state["add"]
        return sources

    # -- teacher-forced evaluation ----------------------------------------
    def evaluate(self, attended, attended_mask, outputs, mask=None,
                 groundtruth=None):
        """Teacher-forced pass.

        Parameters
        ----------
        attended : (B, L, D); attended_mask : (B, L)
        outputs : (T, B) int labels (the fed-back prediction)
        mask : (T, B) or None
        groundtruth : (T, B) or None — used by the mse criteria; defaults
            to ``outputs`` (reference recognizer.get_cost_graph:437-449).

        Returns
        -------
        dict with ``costs`` (T, B), ``weights`` (T, B, L), ``energies``,
        ``readouts``, final states.
        """
        T, B = outputs.shape
        preprocessed = self.attention.preprocess(attended)

        feedback_seq = self.feedback(outputs)                  # (T, B, Fd)
        forked_seq = self._fork_all(feedback_seq)              # big matmuls

        init_states = [cell.initial_states(B) for cell in self.cells]
        init_glimpses = self.attention.initial_glimpses(B, attended)

        fused_mode = self._fused_train_mode(
            B=B, T=T, L=attended.shape[1], D=attended.shape[2])
        if fused_mode is not None:
            pre_states, glimpses_seq, final_states, final_glimpses = \
                self._evaluate_fused(
                    attended, preprocessed, attended_mask, forked_seq,
                    mask, init_states, init_glimpses, T, B,
                    interpret=fused_mode == "interpret")
        else:
            pre_states, glimpses_seq, final_states, final_glimpses = \
                self._evaluate_scan(
                    attended, preprocessed, attended_mask, forked_seq,
                    mask, init_states, init_glimpses, T, B)

        # Rolled feedback: position t sees feedback of outputs[t-1];
        # t==0 sees the initial output.
        init_feedback = self.feedback(
            jnp.full((1, B), self.initial_output, jnp.int32))[0]
        rolled_feedback = jnp.concatenate(
            [init_feedback[None], feedback_seq[:-1]], axis=0)

        lm_states_seq = None
        if self.language_model is not None:
            lm_states_seq = self.language_model.evaluate(outputs, mask)

        return self._finish_evaluate(
            pre_states, glimpses_seq, final_states, final_glimpses,
            rolled_feedback, lm_states_seq, outputs, mask, groundtruth)

    def _fused_train_mode(self, B=None, T=None, L=None, D=None):
        """'compile'/'interpret' to route evaluate through the fused
        Pallas decoder scan (ops/pallas/decoder_train.py), else None.

        With shapes given, oversize (B, T, L) configurations whose
        working set has no VMEM-fitting batch block route to the XLA
        scan instead of RESOURCE_EXHAUSTED-failing in Mosaic (the
        round-3 B=64 crash: 179.31 MB scoped VMEM wanted on a ~128 MB
        chip).  The reference trains at any batch size — Theano's scan
        simply spills (lvsr/main.py:286-683)."""
        import os

        from attention_lvcsr_tpu.models.attention import \
            SequenceContentAndConvAttention
        from attention_lvcsr_tpu.models.attention import \
            SequenceContentAttention
        att = self.attention
        is_conv = isinstance(att, SequenceContentAndConvAttention)
        supported = (
            self.dec_stack <= 4
            and str(self.dec_transition).rsplit(".", 1)[-1].lower()
            in ("gru", "gatedrecurrent")
            and (isinstance(att, SequenceContentAttention)
                 or (is_conv
                     and att.conv_num_filters <= 16
                     and att.energy_normalizer in
                     ("softmax", "logistic", "relu")))
            and self.language_model is None
            and not os.environ.get("LVSR_NO_TRAIN_DECODER"))
        if not supported:
            return None
        if B is not None:
            from attention_lvcsr_tpu.ops.pallas.decoder_train import \
                fused_train_fits
            n_filters = att.conv_num_filters if is_conv else 0
            if not fused_train_fits(B, T, L, att.match_dim, D,
                                    self.dim_dec, self.dec_stack,
                                    n_filters):
                return None
        if att.use_pallas == "interpret":
            return "interpret"
        if att.use_pallas == "never":
            return None
        from attention_lvcsr_tpu.parallel.mesh import \
            pallas_train_kernels_allowed
        if pallas_train_kernels_allowed():
            return "compile"
        return None

    def _evaluate_fused(self, attended, preprocessed, attended_mask,
                        forked_seq, mask, init_states, init_glimpses,
                        T, B, interpret):
        from attention_lvcsr_tpu.ops.pallas.decode_score import \
            toeplitz_band
        from attention_lvcsr_tpu.ops.pallas.decoder_train import \
            decoder_scan_train
        att = self.attention
        L = attended.shape[1]
        D = attended.shape[2]
        S = self.dim_dec
        N = self.dec_stack
        dtype = attended.dtype

        st = jnp.concatenate(
            [att.state_trans[name](jnp.eye(S, dtype=dtype))
             for name in self.state_names], axis=0)   # (N*S, M)
        M = st.shape[1]
        if not hasattr(att, "conv_filters"):
            # content-only attention: no conv term, full window
            n_filters = 0
            normalizer = "softmax"
            hand = jnp.zeros((1, M), dtype)
            toep = jnp.zeros((L, L), jnp.float32)
            e_b = jnp.zeros((1, 1), jnp.float32)
            v = att.energy(jnp.eye(M, dtype=dtype))[:, 0]
        else:
            n_filters = att.conv_num_filters
            normalizer = att.energy_normalizer
            conv_f = att.conv_filters.astype(jnp.float32)
            if n_filters == 1:
                hand = att.filter_handler(jnp.ones((1, 1), dtype))[0]
                toep = toeplitz_band(conv_f, L)
            else:
                hand = att.filter_handler(
                    jnp.eye(n_filters, dtype=dtype))
                toep = jnp.concatenate(
                    [toeplitz_band(conv_f[f], L)
                     for f in range(n_filters)], axis=1)
            if normalizer != "softmax":
                e_b = att.energy(
                    jnp.zeros((1, M), dtype))[0, 0].reshape(1, 1)
            else:
                e_b = jnp.zeros((1, 1), jnp.float32)
            v = att.energy(jnp.eye(M, dtype=dtype))[:, 0] - e_b[0, 0]
        eyeD = jnp.eye(D, dtype=dtype)
        cat = lambda xs, ax=1: (xs[0] if len(xs) == 1
                                else jnp.concatenate(xs, axis=ax))
        dxm = cat([self.distributes[ly]["inputs"](eyeD)
                   for ly in range(N)])
        dgm = cat([self.distributes[ly]["gate_inputs"](eyeD)
                   for ly in range(N)])
        wss = cat([self.cells[ly].state_to_state for ly in range(N)])
        wsg = cat([self.cells[ly].state_to_gates for ly in range(N)])
        inter_in = inter_gate = None
        if N > 1:
            eyeS = jnp.eye(S, dtype=dtype)
            inter_in = jnp.concatenate(
                [lay["inputs"](eyeS) for lay in self.interlayer],
                axis=1)
            inter_gate = jnp.concatenate(
                [lay["gate_inputs"](eyeS) for lay in self.interlayer],
                axis=1)

        amask = (attended_mask if attended_mask is not None
                 else jnp.ones((B, L), dtype))
        # content attention has NO window: the synthetic expanding
        # prior must cover every attended position (not a literal that
        # long-form audio could exceed)
        prior = (att._prior() if hasattr(att, "_prior")
                 else {"type": "expanding", "initial_begin": 0,
                       "initial_end": float(L), "min_speed": 0,
                       "max_speed": 0})
        fx_all = cat([forked_seq[ly]["inputs"] for ly in range(N)],
                     ax=2)
        fg_all = cat([forked_seq[ly]["gate_inputs"] for ly in range(N)],
                     ax=2)
        h0_all = cat([init_states[ly]["states"] for ly in range(N)])
        h_seq, w_seq, wa_seq, e_seq = decoder_scan_train(
            fx_all, fg_all,
            mask, preprocessed, attended, amask,
            h0_all, init_glimpses["weights"],
            init_glimpses["weighted_averages"],
            toep, st, hand, v, wss, wsg, dxm, dgm,
            prior=prior, e_bias=e_b, normalizer=normalizer,
            n_filters=n_filters, dec_stack=N, inter_in=inter_in,
            inter_gate=inter_gate, interpret=interpret)
        pre_states = []
        for ly in range(N):
            h0_ly = init_states[ly]["states"].astype(h_seq.dtype)
            h_ly = h_seq[:, :, ly * S:(ly + 1) * S]
            pre_states.append({"states": jnp.concatenate(
                [h0_ly[None], h_ly[:-1]], axis=0)})
        mask_arr = (mask if mask is not None
                    else jnp.ones((T, B), jnp.float32))
        glimpses_seq = {"weights": w_seq,
                        "weighted_averages": wa_seq}
        final_states = [
            {"states": h_seq[-1, :, ly * S:(ly + 1) * S]}
            for ly in range(N)]
        final_glimpses = {"weights": w_seq[-1],
                          "weighted_averages": wa_seq[-1]}
        if n_filters:
            # conv attention's glimpse set includes energies + step;
            # content-only attention has neither (attention.py
            # glimpse_names) and the structures must match the XLA scan
            step_final = jnp.sum(mask_arr, axis=0).astype(jnp.int32)
            glimpses_seq["energies"] = e_seq
            final_glimpses["energies"] = e_seq[-1]
            final_glimpses["step"] = step_final
        return pre_states, glimpses_seq, final_states, final_glimpses

    def _evaluate_scan(self, attended, preprocessed, attended_mask,
                       forked_seq, mask, init_states, init_glimpses,
                       T, B):
        def step(mdl, carry, inp):
            states, glimpses = carry
            forked_t, mask_t = inp
            g_new = mdl.attention.take_glimpses(
                attended, preprocessed, attended_mask, glimpses,
                mdl._att_states(states))
            new_states = mdl._compute_states(
                states, forked_t, g_new["weighted_averages"])
            # recurrent-decorator masking over states AND glimpses
            if mask is not None:
                new_states = _mask_mix(mask_t, new_states, states)
                g_carry = _mask_mix(mask_t, g_new, glimpses)
            else:
                g_carry = g_new
            return (new_states, g_carry), (states, g_carry)

        xs = (forked_seq, mask if mask is not None
              else jnp.ones((T, B), attended.dtype))
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        (final_states, final_glimpses), (pre_states, glimpses_seq) = \
            scan(self, (init_states, init_glimpses), xs)
        return pre_states, glimpses_seq, final_states, final_glimpses

    def _finish_evaluate(self, pre_states, glimpses_seq, final_states,
                         final_glimpses, rolled_feedback, lm_states_seq,
                         outputs, mask, groundtruth):
        sources = {}
        if self.use_states_for_readout:
            for i, name in enumerate(self.state_names):
                sources[name] = pre_states[i]["states"]
        sources["weighted_averages"] = glimpses_seq["weighted_averages"]
        if "feedback" in self.readout.source_names:
            sources["feedback"] = rolled_feedback
        if self.language_model is not None:
            sources["lm_add"] = lm_states_seq["add"]

        readouts = self.readout(sources)                       # (T, B, V)

        emitter = self.emitter()
        if self.criterion.startswith("mse"):
            costs, aux = self._mse_costs(readouts, outputs, mask, groundtruth)
        else:
            costs = emitter.cost(readouts, outputs)
            aux = {}
        if mask is not None:
            costs = costs * mask

        result = {
            "costs": costs,
            "readouts": readouts,
            "weights": glimpses_seq.get("weights"),
            "energies": glimpses_seq.get("energies"),
            "final_states": final_states,
            "final_glimpses": final_glimpses,
        }
        result.update(aux)
        return result

    def _mse_costs(self, readouts, outputs, mask, groundtruth):
        """Task-loss MSE criteria (lvsr/bricks/__init__.py:134-182)."""
        from attention_lvcsr_tpu.ops.reward_op import reward_and_gain
        if groundtruth is None:
            groundtruth = outputs
        rewards, gains = reward_and_gain(groundtruth, outputs,
                                         self.num_outputs)
        gains = jnp.maximum(gains.astype(readouts.dtype), self.min_reward)
        rewards = rewards.astype(readouts.dtype)

        T, B = outputs.shape
        predicted_gains = jnp.take_along_axis(
            readouts, outputs[..., None], axis=-1)[..., 0]      # (T, B)
        predicted_gains = jnp.concatenate(
            [jnp.zeros((1, B), readouts.dtype), predicted_gains[1:]], axis=0)
        predicted_rewards = readouts + jnp.cumsum(
            predicted_gains, axis=0)[..., None]

        gain_mse_matrix = ((readouts - gains) ** 2).sum(axis=-1)
        reward_mse_matrix = ((predicted_rewards - rewards) ** 2).sum(axis=-1)
        aux = {
            "gain_mse_loss": gain_mse_matrix.sum(),
            "reward_mse_loss": reward_mse_matrix.sum(),
            "gain_matrix": gains,
            "reward_matrix": rewards,
        }
        if self.criterion == "mse_gain":
            return gain_mse_matrix, aux
        return reward_mse_matrix, aux

    # -- one-step decode interface ----------------------------------------
    def fused_score_supported(self):
        """Whether the one-kernel Pallas score step covers this config
        (ops/pallas/decode_score.py)."""
        from attention_lvcsr_tpu.models.attention import \
            SequenceContentAndConvAttention
        att = self.attention
        return (isinstance(att, SequenceContentAndConvAttention)
                and att.conv_num_filters == 1
                and att.energy_normalizer == "softmax"
                and not self.use_states_for_readout
                and self.language_model is None
                and self.dec_stack == 1
                and type(self.readout) is Readout
                and self.readout.post_merge_dims is not None
                and len(self.readout.post_merge_dims) == 1
                and self.readout.post_merge_activation == "tanh"
                and "feedback" not in self.readout.source_names)

    def fused_score_tables(self, length, dtype):
        """Extract the dense tables the fused kernel needs.

        Parameters are pulled through identity-input calls so the flax
        parameter tree stays identical to the XLA path; XLA hoists these
        loop-invariant extractions out of the decode loop (they are
        computed once per search in decode_contexts)."""
        from attention_lvcsr_tpu.ops.pallas.decode_score import toeplitz_band
        att = self.attention
        M = att.match_dim
        S = self.dim_dec
        D = att.attended_dim
        merge = self.readout.merge["weighted_averages"]
        post = self.readout.post_merge[0]
        R = self.readout.merged_dim
        # maxout shrinks the activation before the post-merge MLP
        act = self.readout.post_merge_activation
        pieces = (int(act.split(":")[1]) if act.startswith("maxout")
                  and ":" in act else (2 if act.startswith("maxout")
                                       else 1))
        Ra = R // pieces
        post_b = post(jnp.zeros((1, Ra), dtype))[0]
        if not hasattr(att, "conv_filters"):
            # content-only attention (TIMIT nips_baseline): no conv
            # term, no window prior, unbiased energy — the kernel skips
            # the conv matmul (n_filters=0) and the zero tables only
            # keep the input layout uniform
            e_b = jnp.zeros((), dtype)
            handler_t = jnp.zeros((1, M), dtype)
            toep_t = jnp.zeros((length, length), jnp.float32)
        else:
            # non-softmax normalizers use a biased energy projection
            # (models/attention.py:186)
            if att.energy_normalizer != "softmax":
                e_b = att.energy(jnp.zeros((1, M), dtype))[0, 0]
            else:
                e_b = jnp.zeros((), dtype)
            # multi-filter conv attention (wsj_mean_maxout: 10
            # filters): handler rows are the Dense (Fc -> M) weight,
            # and the Toeplitz band is stacked filter-major along the
            # lanes (L, Fc*L) so ONE matmul computes every filter's
            # convolution
            Fc = att.conv_num_filters
            conv_f = att.conv_filters.astype(jnp.float32)
            if Fc == 1:
                handler_t = att.filter_handler(
                    jnp.ones((1, 1), dtype))[0]
                toep_t = toeplitz_band(conv_f, length)
            else:
                handler_t = att.filter_handler(jnp.eye(Fc, dtype=dtype))
                toep_t = jnp.concatenate(
                    [toeplitz_band(conv_f[f], length)
                     for f in range(Fc)],
                    axis=1)
        return {
            # row-stacked over the decoder stack: the attention's
            # state_sum over all layers is ONE (R, stack*S) x
            # (stack*S, M) matmul in the kernel
            "state_trans": jnp.concatenate(
                [att.state_trans[name](jnp.eye(S, dtype=dtype))
                 for name in self.state_names], axis=0),
            "handler": handler_t,
            "v": att.energy(jnp.eye(M, dtype=dtype))[:, 0] - e_b,
            "energy_b": e_b.reshape(1, 1),
            "merge_k": merge(jnp.eye(D, dtype=dtype)),
            "merge_b": self.readout.merge_bias.astype(dtype),
            "post_k": post(jnp.eye(Ra, dtype=dtype)) - post_b[None, :],
            "post_b": post_b,
            "toeplitz": toep_t,
            "tri": jnp.triu(jnp.ones((length, length), jnp.float32)),
        }

    def loop_decode_tables(self, length, dtype):
        """Dense weight tables for the whole-loop decode kernel
        (ops/pallas/beam_loop.py): the fused score tables plus the
        decoder-advance weights (feedback embedding, fork/distribute
        projections, GRU matrices).  Extracted through identity-input
        calls so the flax parameter tree stays identical to the XLA
        path."""
        t = self.fused_score_tables(length, dtype)
        Vf = self.num_outputs + 1
        embed = self.feedback(jnp.arange(Vf)).astype(dtype)     # (Vf, F)
        F = embed.shape[-1]
        S = self.dim_dec
        D = self.attention.attended_dim
        eyeF = jnp.eye(F, dtype=dtype)
        eyeD = jnp.eye(D, dtype=dtype)
        # per-layer decoder tables, LANE-stacked (layer-major) so the
        # stack=1 layout is byte-identical to the single-layer one and
        # the shared-input projections (feedback fork, wa distribute)
        # stay single matmuls for any stack depth
        fin_ws, fin_bs, fg_ws, fg_bs = [], [], [], []
        din_ws, dg_ws, wsgs, wsss, h0s = [], [], [], [], []
        for layer in range(self.dec_stack):
            cell = self.cells[layer]
            fin = self.forks[layer]["inputs"]
            fgate = self.forks[layer]["gate_inputs"]
            fin_b = fin(jnp.zeros((1, F), dtype))[0]
            fgate_b = fgate(jnp.zeros((1, F), dtype))[0]
            fin_ws.append(fin(eyeF) - fin_b[None, :])
            fin_bs.append(fin_b)
            fg_ws.append(fgate(eyeF) - fgate_b[None, :])
            fg_bs.append(fgate_b)
            din_ws.append(self.distributes[layer]["inputs"](eyeD))
            dg_ws.append(self.distributes[layer]["gate_inputs"](eyeD))
            wsgs.append(cell.state_to_gates.astype(dtype))
            wsss.append(cell.state_to_state.astype(dtype))
            h0s.append(cell.initial_state.astype(dtype))
        cat = lambda xs, ax: (xs[0] if len(xs) == 1
                              else jnp.concatenate(xs, axis=ax))
        t.update({
            "embed": embed,
            "fork_in_w": cat(fin_ws, 1),
            "fork_in_b": cat(fin_bs, 0),
            "fork_gate_w": cat(fg_ws, 1),
            "fork_gate_b": cat(fg_bs, 0),
            "dist_in_w": cat(din_ws, 1),
            "dist_gate_w": cat(dg_ws, 1),
            "wsg": cat(wsgs, 1),
            "wss": cat(wsss, 1),
            "h0": cat(h0s, 0),
        })
        if self.dec_stack > 1:
            eyeS = jnp.eye(S, dtype=dtype)
            t["inter_in_w"] = jnp.concatenate(
                [lay["inputs"](eyeS) for lay in self.interlayer], axis=1)
            t["inter_gate_w"] = jnp.concatenate(
                [lay["gate_inputs"](eyeS) for lay in self.interlayer],
                axis=1)
        if self.use_states_for_readout:
            eyeS = jnp.eye(S, dtype=dtype)
            t["merge_states_k"] = jnp.concatenate(
                [self.readout.merge[name](eyeS)
                 for name in self.state_names], axis=0)
        # NOTE: no LM tables here — LM-fused decode always runs on the
        # XLA path (search/beam.py _search_core) against the
        # load-densified HBM tables in models/lm.py; the round-2..4
        # in-kernel fusion was removed (Mosaic compile minutes-to-never
        # past ~250 states, no measured win below — see
        # ops/pallas/beam_loop.py module docstring).
        return t

    def _fused_score(self, carry, contexts, beam, interpret):
        from attention_lvcsr_tpu.ops.pallas.decode_score import \
            fused_decode_score
        att = self.attention
        p = att._prior()
        t = contexts["fused_tables"]
        g = carry["glimpses"]
        costs, wnew, energies, wa = fused_decode_score(
            contexts["preprocessed"], contexts["attended"],
            contexts["attended_mask"], g["weights"], g["step"],
            carry["states"][0]["states"], t["toeplitz"], t["tri"],
            t["state_trans"], t["handler"], t["v"], t["merge_k"],
            t["merge_b"], t["post_k"], t["post_b"], beam=beam,
            prior=p.get("type", "expanding"),
            before=float(p.get("before", 0.0)),
            after=float(p.get("after", 0.0)),
            initial_begin=float(p.get("initial_begin", 0.0)),
            initial_end=float(p.get("initial_end", 1e4)),
            min_speed=float(p.get("min_speed", 0.0)),
            max_speed=float(p.get("max_speed", 0.0)),
            interpret=interpret)
        g_new = {"weighted_averages": wa, "weights": wnew,
                 "energies": energies, "step": g["step"] + 1}
        return g_new, costs, None

    def score_step(self, carry, contexts, beam=1):
        """Glimpses + per-symbol continuation costs for the current step.

        ``contexts`` = dict(attended, preprocessed, attended_mask).  With
        ``beam > 1`` the contexts are per-utterance (U, ...) while the
        carry rows are per-hypothesis (U*beam, ...) — the attention
        broadcasts instead of reading K copies of the attended.
        Returns (glimpses, costs (B, V), readouts).
        """
        if beam > 1 and "fused_tables" in contexts:
            mode = getattr(self.attention, "_pallas_mode", lambda: None)()
            if mode is not None:
                return self._fused_score(carry, contexts, beam,
                                         interpret=mode == "interpret")
        g_new = self.attention.take_glimpses(
            contexts["attended"], contexts["preprocessed"],
            contexts["attended_mask"], carry["glimpses"],
            self._att_states(carry["states"]), beam=beam)
        feedback_prev = self.feedback(carry["outputs"])
        sources = self._readout_sources(
            carry["states"], g_new, feedback_prev, carry.get("lm"))
        readouts = self.readout(sources)
        costs = self.emitter().costs(readouts)
        return g_new, costs, readouts

    def advance_states(self, carry, g_new, chosen_outputs, contexts):
        """Consume chosen symbols: transition + LM update."""
        feedback_new = self.feedback(chosen_outputs)
        forked = self._fork_all(feedback_new)
        new_states = self._compute_states(
            carry["states"], forked, g_new["weighted_averages"])
        new_carry = {"states": new_states, "glimpses": g_new,
                     "outputs": chosen_outputs}
        if self.language_model is not None:
            new_carry["lm"] = self.language_model.one_step(
                carry["lm"], chosen_outputs)
        return new_carry

    def generate_step(self, carry, contexts, rng):
        """Full generation step: score, emit, advance (reference
        BaseSequenceGenerator.generate, sequence_generators.py:329-377)."""
        g_new, costs, readouts = self.score_step(carry, contexts)
        emitter = self.emitter()
        outputs = emitter.emit(rng, readouts)
        step_costs = emitter.cost(readouts, outputs)
        new_carry = self.advance_states(carry, g_new, outputs, contexts)
        return new_carry, {"outputs": outputs, "costs": step_costs,
                           "weights": g_new.get("weights"),
                           "readouts": readouts}

    def generate(self, attended, attended_mask, n_steps, rng):
        """Sample sequences with a `lax.scan` over generate_step."""
        B = attended.shape[0]
        contexts = {
            "attended": attended,
            "preprocessed": self.attention.preprocess(attended),
            "attended_mask": attended_mask,
        }
        carry = self.initial_states(B, attended)
        rngs = jax.random.split(rng, n_steps)

        def step(mdl, c, r):
            new_c, out = mdl.generate_step(c, contexts, r)
            return new_c, out

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        final, outs = scan(self, carry, rngs)
        return outs
