"""Monitoring: averaged train records, validation evaluation, beam-search PER.

Counterparts of the Blocks monitoring stack
(``blocks/extensions/monitoring.py:43-143``,
``blocks/monitoring/aggregation.py``, ``blocks/monitoring/evaluators.py``)
and the reference's validation-time beam-search error rate
(``PhonemeErrorRate``, ``lvsr/main.py:68-125``):

* primary train observables come back from the jitted train step itself
  (zero extra forward passes) and land in the log via the main loop;
* :class:`AveragedTrainMonitoring` re-aggregates them every N batches
  under an ``average_`` prefix;
* :class:`DataStreamMonitoring` runs a jitted eval function over a
  validation stream with weighted-mean aggregation;
* :class:`BeamSearchErrorRate` decodes the validation set with the
  batched on-device beam search and scores CER/WER — batched, unlike the
  reference's one-utterance-at-a-time host loop.
"""
from __future__ import annotations

import sys
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from attention_lvcsr_tpu.ops.error_rate import wer
from attention_lvcsr_tpu.train.extensions import SimpleExtension


class AveragedTrainMonitoring(SimpleExtension):
    """Mean of selected log records since the last fire, written with a
    prefix (the reference's every-10-batches 'average_' channel,
    lvsr/main.py:587-590)."""

    def __init__(self, record_names, prefix="average", **kwargs):
        self.record_names = list(record_names)
        self.prefix = prefix
        self._acc: Dict[str, List[float]] = {}
        self._last_time = 0          # last log row already accumulated
        kwargs.setdefault("every_n_batches", 10)
        super().__init__(**kwargs)

    def dispatch(self, callback_name, *args):
        if callback_name == "after_batch":
            # read the PREVIOUS iteration's row: the loop converts
            # device monitors one batch late (train/loop.py delayed
            # flush) so reading the current row would find nothing —
            # and forcing a flush here would stall the device pipeline
            # every batch
            log = self.main_loop.log
            t_prev = log.status["iterations_done"] - 1
            if t_prev > self._last_time:
                row = log[t_prev]
                for name in self.record_names:
                    value = row.get(name)
                    if value is not None and isinstance(
                            value, (int, float, np.floating, np.integer)):
                        self._acc.setdefault(name, []).append(
                            float(value))
                self._last_time = t_prev
        super().dispatch(callback_name, *args)

    def do(self, which_callback, *args):
        # close the window exactly on this batch: flush the pending
        # (delayed) monitors — one device sync every N batches only —
        # and fold the current row in
        flush = getattr(self.main_loop, "_flush_pending_monitors", None)
        if flush is not None:
            flush()
        log = self.main_loop.log
        t = log.status["iterations_done"]
        # row is written below even when no new iteration happened (a
        # second trigger firing at the same t must not raise NameError)
        row = log.current_row
        if t > self._last_time:
            for name in self.record_names:
                value = row.get(name)
                if value is not None and isinstance(
                        value, (int, float, np.floating, np.integer)):
                    self._acc.setdefault(name, []).append(float(value))
            self._last_time = t
        for name, values in self._acc.items():
            if values:
                row[f"{self.prefix}_{name}"] = float(np.mean(values))
        self._acc = {}

    def record_name(self, name):
        return f"{self.prefix}_{name}"


class DataStreamMonitoring(SimpleExtension):
    """Weighted-mean aggregation of an eval function over a stream.

    ``eval_fn(batch) -> dict`` where values are either floats (weighted by
    ``num_examples``) or ``(value_sum, weight)`` pairs aggregated as
    ``sum(value_sum)/sum(weight)``.
    """

    def __init__(self, eval_fn: Callable, stream_factory: Callable,
                 prefix="valid", **kwargs):
        self.eval_fn = eval_fn
        self.stream_factory = stream_factory
        self.prefix = prefix
        super().__init__(**kwargs)

    def record_name(self, name):
        return f"{self.prefix}_{name}"

    def do(self, which_callback, *args):
        sums: Dict[str, float] = {}
        weights: Dict[str, float] = {}
        for batch in self.stream_factory():
            results = self.eval_fn(batch)
            for name, value in results.items():
                if isinstance(value, tuple):
                    vsum, w = value
                else:
                    vsum, w = value, 1.0
                sums[name] = sums.get(name, 0.0) + float(vsum)
                weights[name] = weights.get(name, 0.0) + float(w)
        row = self.main_loop.log.current_row
        for name in sums:
            row[self.record_name(name)] = sums[name] / max(weights[name],
                                                           1e-12)


class BeamSearchErrorRate(SimpleExtension):
    """Validation-time CER via batched beam search (PhonemeErrorRate role).

    Keeps the reference's guard rails: decoding errors count as error 1.0,
    and after 10 examples with mean error > 0.8 the evaluation bails out
    early (hopeless untrained model, lvsr/main.py:98-100).
    """

    def __init__(self, recognizer, data, stream_factory, beam_size,
                 char_discount=None, round_to_inf=None, stop_on=None,
                 prefix="valid", record_name="per", max_examples=None,
                 **kwargs):
        self.recognizer = recognizer
        self.data = data
        self.stream_factory = stream_factory
        self.beam_size = beam_size
        self.search_kwargs = {}
        if char_discount is not None:
            self.search_kwargs["char_discount"] = char_discount
        if round_to_inf is not None:
            self.search_kwargs["round_to_inf"] = round_to_inf
        if stop_on is not None:
            self.search_kwargs["stop_on"] = stop_on
        # dataset-provided dictionary constraint (lvsr/main.py:109-110)
        validate = getattr(getattr(data, "info_dataset", data),
                           "validate_solution", None)
        if validate is not None:
            self.search_kwargs["validate_solution_function"] = validate
        self.prefix = prefix
        self._record = record_name
        self.max_examples = max_examples
        super().__init__(**kwargs)

    @property
    def record_name_full(self):
        return f"{self.prefix}_{self._record}"

    def record_name(self, _=None):
        return self.record_name_full

    def do(self, which_callback, *args):
        from attention_lvcsr_tpu.search.beam import CandidateNotFoundError
        if self.main_loop is not None and \
                getattr(self.main_loop, "algorithm", None) is not None:
            # stay in sync with the live (donated) training parameters
            self.recognizer.params = self.main_loop.algorithm.params
        self.recognizer.init_beam_search(self.beam_size)
        total_errors = 0.0
        total_length = 0.0
        num_examples = 0
        for batch in self.stream_factory():
            inputs = batch["recordings"] if "recordings" in batch \
                else batch["inputs"]
            mask_key = ("recordings_mask" if "recordings_mask" in batch
                        else "inputs_mask")
            try:
                out = self.recognizer.beam_search(
                    inputs, batch[mask_key], as_arrays=True,
                    **self.search_kwargs)
                best = np.where(out["done_valid"].any(axis=1),
                                np.argmin(out["done_adjusted"], axis=1), -1)
            except CandidateNotFoundError:
                best = None
            B = inputs.shape[0]
            for b in range(B):
                if batch["labels_mask"] is not None:
                    L = int(batch["labels_mask"][b].sum())
                else:
                    L = batch["labels"].shape[1]
                groundtruth = self.data.decode(batch["labels"][b, :L])
                if not groundtruth:
                    continue
                error = 1.0
                if best is not None and best[b] >= 0:
                    k = int(best[b])
                    n = int(out["done_len"][b, k])
                    recognized = self.data.decode(out["done_out"][b, k, :n])
                    error = min(1.0, wer(groundtruth, recognized))
                total_errors += error * len(groundtruth)
                total_length += len(groundtruth)
                num_examples += 1
            if num_examples > 10 and total_errors / max(total_length, 1) > 0.8:
                total_errors, total_length = 1.0, 1.0
                break
            if self.max_examples and num_examples >= self.max_examples:
                break
        mean_error = total_errors / max(total_length, 1e-12)
        self.main_loop.log.current_row[self.record_name_full] = mean_error
