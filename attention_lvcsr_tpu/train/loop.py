"""The main training loop: epochs, batches, extensions, graceful stops.

Counterpart of ``blocks/main_loop.py:47-312``: epoch/iteration loop with
extension callback dispatch, SIGINT/SIGTERM graceful finishing (first
signal -> finish after the current epoch/batch, second -> raise), an
``on_error`` path, and a hierarchical wall-time profile printed at the end
(``blocks/utils/profile.py`` role).
"""
from __future__ import annotations

import signal
import sys
import time
import traceback
from collections import defaultdict
from typing import Callable, Iterable, Optional, Sequence

from attention_lvcsr_tpu.train.log import TrainingLog


class Profile:
    """Hierarchical wall-clock accumulator."""

    def __init__(self):
        self.total = defaultdict(float)
        self.stack = []

    def enter(self, name):
        self.stack.append((name, time.time()))

    def exit(self):
        name, t0 = self.stack.pop()
        key = "/".join([n for n, _ in self.stack] + [name])
        self.total[key] += time.time() - t0

    def report(self, file=sys.stderr):
        print("Training profile:", file=file)
        for key in sorted(self.total):
            print(f"  {key:50s} {self.total[key]:10.3f}s", file=file)


class TrainingFinish(Exception):
    pass


class MainLoop:
    """Drives the algorithm over a data stream with extensions."""

    def __init__(self, algorithm, data_stream_factory: Callable[[], Iterable],
                 log: Optional[TrainingLog] = None, extensions=(),
                 profile_enabled=False):
        self.algorithm = algorithm
        self.data_stream_factory = data_stream_factory
        self.log = log or TrainingLog()
        self.extensions = list(extensions)
        self.profile = Profile()
        self.profile_enabled = profile_enabled
        for ext in self.extensions:
            ext.main_loop = self
        self._old_handlers = {}

    # -- signals (main_loop.py:285-305) ------------------------------------
    def _install_signal_handlers(self):
        def handler(signum, frame):
            if signum == signal.SIGINT and \
                    self.log.status["batch_interrupt_received"]:
                raise KeyboardInterrupt
            self.log.current_row["training_finish_requested"] = True
            if signum == signal.SIGINT:
                self.log.status["batch_interrupt_received"] = True
            else:
                self.log.status["epoch_interrupt_received"] = True
            print("Stop requested: will finish gracefully "
                  "(repeat Ctrl-C to force).", file=sys.stderr)
        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                self._old_handlers[sig] = signal.signal(sig, handler)
            except ValueError:
                pass  # not main thread

    def _restore_signal_handlers(self):
        for sig, old in self._old_handlers.items():
            signal.signal(sig, old)

    # -- extension dispatch ------------------------------------------------
    def _run_extensions(self, callback_name, *args):
        if self.profile_enabled:
            self.profile.enter(f"extensions/{callback_name}")
        for ext in self.extensions:
            ext.dispatch(callback_name, *args)
        if self.profile_enabled:
            self.profile.exit()

    def find_extension(self, cls):
        for ext in self.extensions:
            if isinstance(ext, cls):
                return ext
        return None

    def _finish_requested(self):
        return bool(self.log.current_row.get("training_finish_requested"))

    # -- the loop ----------------------------------------------------------
    def run(self):
        self._install_signal_handlers()
        self.log.status["training_started"] = True
        error = None
        try:
            self._run_extensions("before_training")
            if self.log.status.get("resumed_from"):
                self._run_extensions("on_resumption")
            # a resumed log may carry the previous run's finish flag
            self.log.record(self.log.status["iterations_done"],
                            "training_finish_requested", False)
            while not self._finish_requested():
                self._run_epoch()
        except KeyboardInterrupt:
            self._run_extensions("on_interrupt")
        except TrainingFinish:
            pass
        except Exception as exc:
            error = exc
            try:
                self._run_extensions("on_error", exc)
            except Exception:
                traceback.print_exc()
        finally:
            try:
                self._flush_pending_monitors()
            except Exception:
                traceback.print_exc()
            try:
                self._run_extensions("after_training")
            except Exception:
                traceback.print_exc()
            self._restore_signal_handlers()
            if self.profile_enabled:
                self.profile.report()
        if error is not None:
            raise error

    def _run_epoch(self):
        self.log.status["epoch_started"] = True
        self._run_extensions("before_epoch")
        if self.profile_enabled:
            self.profile.enter("epoch")
        try:
            iterator = iter(self.data_stream_factory())
            while True:
                if self.profile_enabled:
                    self.profile.enter("read_data")
                try:
                    batch = next(iterator)
                except StopIteration:
                    break
                finally:
                    if self.profile_enabled:
                        self.profile.exit()
                self._run_iteration(batch)
                if self._finish_requested():
                    break
        finally:
            if self.profile_enabled:
                self.profile.exit()
        self._flush_pending_monitors()
        self.log.status["epoch_started"] = False
        self.log.status["epochs_done"] += 1
        self.log.status["_epoch_ends"].append(
            self.log.status["iterations_done"])
        self._run_extensions("after_epoch")

    def _run_iteration(self, batch):
        self._run_extensions("before_batch", batch)
        if self.profile_enabled:
            self.profile.enter("train")
        monitors = self.algorithm.process_batch(batch)
        if self.profile_enabled:
            self.profile.exit()
        self.log.status["iterations_done"] += 1
        # One-step-DELAYED monitor conversion: converting this step's
        # device scalars to host floats would block until the step
        # finishes, serializing host and device (a fixed dispatch
        # round-trip per step — measured ~2x throughput loss on the
        # tunneled chip).  The PREVIOUS step's monitors are complete by
        # now (this step was dispatched after them), so converting them
        # costs a tiny D2H copy, not a pipeline stall.  Per-batch log
        # readers (the NaN-gradient stop) therefore see values one
        # batch late; epoch-boundary readers see everything (flush
        # below).
        self._flush_pending_monitors()
        self._pending_monitors = (self.log.status["iterations_done"],
                                  _pack_monitors(monitors))
        self._run_extensions("after_batch", batch)

    def _flush_pending_monitors(self):
        pending = getattr(self, "_pending_monitors", None)
        if pending is None:
            return
        self._pending_monitors = None
        t, (names, stacked, rest) = pending
        if stacked is not None:
            # ONE device-to-host transfer for all scalar monitors —
            # per-scalar pulls each pay a full transfer round-trip
            # (~25 ms on the tunneled chip: 30 monitors would cost more
            # than the train step itself)
            import numpy as np
            values = np.asarray(stacked).tolist()
            for name, value in zip(names, values):
                self.log.record(t, name, float(value))
        for name, value in rest.items():
            self.log.record(t, name, _to_python(value))


def _pack_monitors(monitors):
    """Normalize monitors to (names, stacked_device_array, rest).

    The algorithm packs on device inside its jitted step
    (``train/algorithm.py PackedMonitors``) — NO eager device ops may
    happen here: each one costs a dispatch round-trip per batch on a
    tunneled chip.  Plain dicts (mock algorithms, host-side metrics)
    pass through as ``rest``.
    """
    if monitors is None:
        return (), None, {}
    names = getattr(monitors, "names", None)
    values = getattr(monitors, "values", None)
    if names is not None and values is not None \
            and not callable(values):
        return names, values, {}
    return (), None, dict(monitors)


def _to_python(value):
    try:
        import numpy as np
        arr = np.asarray(value)
        if arr.ndim == 0:
            return arr.item()
        return arr
    except Exception:
        return value
