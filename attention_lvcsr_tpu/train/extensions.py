"""Training extension (callback) framework and the standard extensions.

Counterpart of the Blocks extension system
(``blocks/extensions/__init__.py``: TrainingExtension:19,
SimpleExtension:173, FinishAfter:369, Printing:421, Timing:558;
``blocks/extensions/training.py``: TrackTheBest:48;
``blocks/extensions/saveload.py``: Checkpoint:16, Load:105;
``lvsr/extensions.py``: AdaptiveClipping:64, Patience:157, CodeVersion:36)
re-shaped around a host loop that drives a jitted train step: extensions
see the log and the algorithm (params/opt-state owner), never a Theano
graph.
"""
from __future__ import annotations

import math
import os
import signal
import subprocess
import sys
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

CALLBACKS = ("before_training", "before_epoch", "before_batch",
             "after_batch", "after_epoch", "after_training",
             "on_interrupt", "on_resumption", "on_error")


class TrainingExtension:
    """Base: overridable callback methods, access to the main loop."""
    main_loop = None

    @property
    def log(self):
        return self.main_loop.log

    def dispatch(self, callback_name, *args):
        getattr(self, callback_name, lambda *a: None)(*args)

    def before_training(self): pass
    def before_epoch(self): pass
    def before_batch(self, batch): pass
    def after_batch(self, batch): pass
    def after_epoch(self): pass
    def after_training(self): pass
    def on_interrupt(self): pass
    def on_resumption(self): pass
    def on_error(self, exc): pass


class SimpleExtension(TrainingExtension):
    """Condition-triggered extension: subclasses implement ``do``.

    Trigger kwargs: ``before_training``, ``before_first_epoch``,
    ``before_epoch``, ``after_epoch``, ``after_batch``,
    ``after_training``, ``every_n_batches``, ``every_n_epochs``,
    ``after_n_batches``, ``after_n_epochs``, ``on_interrupt``.
    """

    def __init__(self, **conditions):
        self._conditions: List[tuple] = []
        self._extra_conditions: List[tuple] = []
        self.set_conditions(**conditions)

    def set_conditions(self, **conditions):
        self._conditions = [(k, v) for k, v in conditions.items() if v]
        return self

    def add_condition(self, callback_names, predicate=None, arguments=()):
        for name in callback_names:
            self._extra_conditions.append((name, predicate, tuple(arguments)))
        return self

    def do(self, which_callback, *args):
        raise NotImplementedError

    # -- dispatch ----------------------------------------------------------
    def dispatch(self, callback_name, *args):
        status = self.main_loop.log.status
        fired = False
        for cond, value in self._conditions:
            if fired:
                break
            if cond == callback_name and value is True:
                fired = True
            elif cond == "before_first_epoch" and \
                    callback_name == "before_epoch" and \
                    status["epochs_done"] == 0 and value:
                fired = True
            elif cond == "every_n_batches" and callback_name == "after_batch" \
                    and value and status["iterations_done"] > 0 \
                    and status["iterations_done"] % value == 0:
                fired = True
            elif cond == "every_n_epochs" and callback_name == "after_epoch" \
                    and value and status["epochs_done"] > 0 \
                    and status["epochs_done"] % value == 0:
                fired = True
            elif cond == "after_n_batches" and callback_name == "after_batch" \
                    and value and status["iterations_done"] >= value:
                fired = True
            elif cond == "after_n_epochs" and callback_name == "after_epoch" \
                    and value and status["epochs_done"] >= value:
                fired = True
        if fired:
            self.do(callback_name, *args)
        for name, predicate, arguments in self._extra_conditions:
            if name == callback_name and (predicate is None or
                                          predicate(self.main_loop.log)):
                self.do(callback_name, *(args + arguments))


class FinishAfter(SimpleExtension):
    """Request loop termination (blocks FinishAfter:369)."""

    def __init__(self, **kwargs):
        kwargs.setdefault("after_n_batches", None)
        super().__init__(**kwargs)

    def do(self, which_callback, *args):
        self.main_loop.log.current_row["training_finish_requested"] = True


class Timing(TrainingExtension):
    """Per-batch/epoch wall times into the log (blocks Timing:558)."""

    def before_training(self):
        self._batch_start = None
        self._epoch_start = None

    def before_epoch(self):
        self._epoch_start = time.time()

    def before_batch(self, batch):
        self._batch_start = time.time()

    def after_batch(self, batch):
        if self._batch_start is not None:
            self.log.current_row["time_train_this_batch"] = (
                time.time() - self._batch_start)

    def after_epoch(self):
        if self._epoch_start is not None:
            self.log.current_row["time_train_this_epoch"] = (
                time.time() - self._epoch_start)


class Printing(SimpleExtension):
    """Console dump of the current log row (blocks Printing:421)."""

    def __init__(self, hide_regex=None, **kwargs):
        kwargs.setdefault("after_epoch", True)
        kwargs.setdefault("on_interrupt", True)
        super().__init__(**kwargs)
        import re
        self._hide = re.compile(hide_regex) if hide_regex else None

    def do(self, which_callback, *args):
        log = self.main_loop.log
        t = log.status["iterations_done"]
        if which_callback == "after_batch" and t > 1:
            # monitors are flushed one batch late (train/loop.py
            # delayed conversion): the newest COMPLETE row is t-1
            t = t - 1
        row = log[t]
        print("-" * 70)
        print(f"Log records from iteration {t}, "
              f"epoch {log.status['epochs_done']}:")
        for key in sorted(row):
            if self._hide and self._hide.match(key):
                continue
            value = row[key]
            if isinstance(value, float):
                value = f"{value:.6g}"
            print(f"\t {key}: {value}")
        sys.stdout.flush()


class ProgressBar(TrainingExtension):
    """Minimal stderr progress indicator."""

    def before_epoch(self):
        self._count = 0
        self._t0 = time.time()

    def after_batch(self, batch):
        self._count += 1
        if self._count % 10 == 0:
            rate = self._count / (time.time() - self._t0 + 1e-9)
            print(f"\r  batch {self._count} ({rate:.1f} it/s)",
                  end="", file=sys.stderr)

    def after_epoch(self):
        print("", file=sys.stderr)


class TrackTheBest(SimpleExtension):
    """Track the minimum of a log record (blocks TrackTheBest:48)."""

    def __init__(self, record_name, choose_best=min, **kwargs):
        self.record_name = record_name
        self.best_name = "best_" + record_name
        self.notification_name = self.best_name
        self.choose_best = choose_best
        kwargs.setdefault("after_epoch", True)
        super().__init__(**kwargs)

    def do(self, which_callback, *args):
        log = self.main_loop.log
        value = log.current_row.get(self.record_name)
        if value is None:
            value = log.last_value(self.record_name)
        if value is None:
            return
        best = log.status.get(self.best_name)
        if best is None or self.choose_best(value, best) == value \
                and value != best:
            log.status[self.best_name] = value
            log.current_row[self.notification_name] = True


class Patience(FinishAfter):
    """Multiplicative-patience early stopping (lvsr Patience:157-234).

    Waits until ``patience_factor * iterations_at_last_improvement``
    (at least ``min_iterations`` / ``min_epochs``) before finishing.
    """

    def __init__(self, min_iterations=None, min_epochs=None,
                 patience_factor=1.5, patience_log_record=None,
                 notification_names=None, **kwargs):
        if (min_iterations is None) == (min_epochs is None):
            raise ValueError("provide exactly one of min_iterations, "
                             "min_epochs")
        self.min_iterations = min_iterations
        self.min_epochs = min_epochs
        self.patience_factor = patience_factor
        self.notification_names = list(notification_names or [])
        self.last_best_iter = 0
        self.last_best_epoch = 0
        self.patience_log_record = patience_log_record or "patience"
        kwargs.setdefault("after_batch", True)
        kwargs.setdefault("after_epoch", True)
        super().__init__(**kwargs)

    def update_best(self):
        log = self.main_loop.log
        for name in self.notification_names:
            if log.current_row.get(name):
                self.last_best_iter = log.status["iterations_done"]
                self.last_best_epoch = log.status["epochs_done"]

    def do(self, which_callback, *args):
        self.update_best()
        log = self.main_loop.log
        if self.min_iterations is not None:
            patience = max(self.min_iterations,
                           int(self.last_best_iter * self.patience_factor))
            log.current_row[self.patience_log_record] = patience
            if log.status["iterations_done"] >= patience:
                super().do(which_callback, *args)
        else:
            patience = max(self.min_epochs,
                           int(math.ceil(
                               self.last_best_epoch * self.patience_factor)))
            log.current_row[self.patience_log_record] = patience
            if log.status["epochs_done"] >= patience \
                    and which_callback == "after_epoch":
                super().do(which_callback, *args)


class SwitchOffLengthFilter(SimpleExtension):
    """Disable the max-length data filter mid-training
    (lvsr/main.py:128-136)."""

    def __init__(self, length_filter, **kwargs):
        self.length_filter = length_filter
        super().__init__(**kwargs)

    def do(self, which_callback, *args):
        self.length_filter.max_length = None
        self.main_loop.log.current_row["length_filter_switched"] = True


class Checkpoint(SimpleExtension):
    """Atomic checkpoint with best-record aliases
    (blocks Checkpoint:16-103 + lvsr/main.py:650-663)."""

    def __init__(self, path, save_separately_params=True, **kwargs):
        self.path = path
        self.save_separately_params = save_separately_params
        super().__init__(**kwargs)

    def do(self, which_callback, *args):
        from attention_lvcsr_tpu.train.checkpoint import (save_checkpoint,
                                                          save_parameters)
        loop = self.main_loop
        path = args[-1] if args and isinstance(args[-1], str) else self.path
        meta = {
            "iterations_done": loop.log.status["iterations_done"],
            "epochs_done": loop.log.status["epochs_done"],
        }
        save_checkpoint(path, loop.algorithm.parameter_dict(),
                        opt_state=loop.algorithm.opt_state,
                        log_state=loop.log.state_dict(), meta=meta)
        if self.save_separately_params:
            root, ext = os.path.splitext(path)
            save_parameters(root + "_params.npz",
                            loop.algorithm.parameter_dict())
        loop.log.current_row["saved_to"] = path


class Load(TrainingExtension):
    """Resume params (+ optionally iteration state and log) from a
    checkpoint (blocks Load:105-162)."""

    def __init__(self, path, load_iteration_state=False, load_log=False):
        self.path = path
        self.load_iteration_state = load_iteration_state
        self.load_log = load_log

    def before_training(self):
        from attention_lvcsr_tpu.train.checkpoint import load_checkpoint
        from attention_lvcsr_tpu.train.log import TrainingLog
        if not os.path.exists(self.path):
            print(f"Load: no checkpoint at {self.path}", file=sys.stderr)
            return
        state = load_checkpoint(self.path)
        loop = self.main_loop
        loop.algorithm.set_parameters(state["parameters"])
        if self.load_iteration_state and state.get("opt_state") is not None:
            loop.algorithm.set_opt_state(state["opt_state"])
        if self.load_log and state.get("log_state") is not None:
            loop.log = TrainingLog.from_state_dict(state["log_state"])
            loop.log.status["resumed_from"] = self.path
            loop.log.status["epoch_started"] = False


class LoadLog(TrainingExtension):
    """Log-only resumption (lvsr/main.py:139-176)."""

    def __init__(self, path):
        self.path = path

    def before_training(self):
        from attention_lvcsr_tpu.train.checkpoint import load_checkpoint
        from attention_lvcsr_tpu.train.log import TrainingLog
        if not os.path.exists(self.path):
            print(f"LoadLog: no checkpoint at {self.path}", file=sys.stderr)
            return
        state = load_checkpoint(self.path)
        if state.get("log_state"):
            self.main_loop.log = TrainingLog.from_state_dict(
                state["log_state"])
            self.main_loop.log.status["resumed_from"] = None
            self.main_loop.log.status["epoch_started"] = False


class CodeVersion(TrainingExtension):
    """Record the git commit of the framework into the log
    (lvsr CodeVersion:36-55)."""

    def __init__(self, repo_dir=None):
        self.repo_dir = repo_dir or os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def before_training(self):
        try:
            commit = subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=self.repo_dir,
                stderr=subprocess.DEVNULL).decode().strip()
            self.main_loop.log.status["code_version"] = commit
        except Exception:
            self.main_loop.log.status["code_version"] = "unknown"


class CompilationStatistics(TrainingExtension):
    """Log compile/trace cost of the train step (the CGStatistics role,
    lvsr/extensions.py:21-33: the reference counted scan nodes; we record
    the jaxpr equation count and compile time)."""

    def before_training(self):
        algo = self.main_loop.algorithm
        stats = getattr(algo, "compile_stats", None)
        if stats:
            self.main_loop.log.status.update(stats)


class LogInputs(SimpleExtension):
    """Debug dump of training batches (and predicted gains for the
    task-loss criterion) — lvsr LogInputs/LogInputsGains,
    lvsr/extensions.py:94-154."""

    def __init__(self, data, dump_path=None, with_gains=False, **kwargs):
        self.data = data
        self.dump_path = dump_path
        self.with_gains = with_gains
        kwargs.setdefault("every_n_batches", 100)
        super().__init__(**kwargs)

    def do(self, which_callback, *args):
        batch = args[0] if args else None
        if batch is None or "labels" not in batch:
            return
        out = sys.stderr if not self.dump_path else open(self.dump_path, "a")
        it = self.main_loop.log.status["iterations_done"]
        print(f"--- inputs at iteration {it} ---", file=out)
        labels = batch["labels"]
        mask = batch.get("labels_mask")
        for b in range(min(4, len(labels))):
            L = int(mask[b].sum()) if mask is not None else labels.shape[1]
            print(" ", self.data.pretty_print(labels[b][:L], None),
                  file=out)
        if self.with_gains:
            gains = self.main_loop.log.current_row.get("min_gain")
            if gains is not None:
                print(f"  min_gain={gains}", file=out)
        if self.dump_path:
            out.close()


class Plot(SimpleExtension):
    """Live training-curve plots written to disk every N batches.

    The blocks-extras bokeh-server ``Plot`` role
    (blocks_extras/extensions/plot.py:24-213) without a server: channel
    groups are rendered to a PNG (and the raw series to a JSON file) so
    any file viewer / web server can follow training.
    """

    def __init__(self, path, channels, **kwargs):
        self.path = path
        self.channels = channels
        kwargs.setdefault("every_n_batches", 100)
        kwargs.setdefault("after_epoch", True)
        super().__init__(**kwargs)

    def do(self, which_callback, *args):
        import json
        from attention_lvcsr_tpu.utils.notebook import plot_channels
        log = self.main_loop.log
        try:
            plot_channels(log, self.channels, save_to=self.path + ".png")
        except Exception as exc:  # plotting must never kill training
            print(f"Plot: {exc}", file=sys.stderr)
        series = {}
        for group in self.channels:
            for name in group:
                times, values = log.channel(name)
                series[name] = [
                    [t, float(v)] for t, v in zip(times, values)
                    if isinstance(v, (int, float))]
        with open(self.path + ".json", "w") as f:
            json.dump(series, f)


class PlotServer(TrainingExtension):
    """Live training-curve view over HTTP (the blocks-extras bokeh-server
    ``Plot`` role, blocks_extras/extensions/plot.py:24-213, without the
    bokeh dependency): a stdlib HTTP server on a background thread serves
    an auto-refreshing page that draws the log channels client-side.

    ``GET /`` -> HTML page (one chart per channel group, canvas-drawn,
    refreshed every few seconds); ``GET /data.json`` -> the raw series.

    Caveat: the handler thread shares the GIL with the training process,
    so fetches stall during long pure-Python tracing windows (first
    compile of a new batch shape); during steady-state training the jit
    step releases the GIL and the server is responsive.
    """

    PAGE = """<!doctype html><html><head><title>{title}</title><style>
    body{{font-family:sans-serif;background:#fafafa;margin:20px}}
    .chart{{display:inline-block;margin:10px;background:#fff;
            border:1px solid #ddd;padding:8px}}
    h3{{margin:4px 0;font-size:14px}}</style></head><body>
    <h2>{title}</h2><div id="charts"></div><script>
    const palette=['#1f77b4','#ff7f0e','#2ca02c','#d62728','#9467bd'];
    async function refresh(){{
      const groups=await (await fetch('data.json')).json();
      const root=document.getElementById('charts');root.innerHTML='';
      groups.forEach(function(group,gi){{
        const div=document.createElement('div');div.className='chart';
        const names=Object.keys(group);
        div.innerHTML='<h3>'+names.join(' / ')+'</h3>';
        const cv=document.createElement('canvas');
        cv.width=420;cv.height=220;div.appendChild(cv);root.appendChild(div);
        const ctx=cv.getContext('2d');
        let xs=[],ys=[];
        names.forEach(n=>group[n].forEach(p=>{{xs.push(p[0]);ys.push(p[1]);}}));
        if(!xs.length)return;
        const x0=Math.min(...xs),x1=Math.max(...xs)||1;
        const y0=Math.min(...ys),y1=Math.max(...ys);
        const sx=t=>10+400*(t-x0)/Math.max(x1-x0,1e-9);
        const sy=v=>205-190*(v-y0)/Math.max(y1-y0,1e-9);
        names.forEach(function(n,i){{
          ctx.strokeStyle=palette[i%palette.length];ctx.beginPath();
          group[n].forEach(function(p,k){{
            k?ctx.lineTo(sx(p[0]),sy(p[1])):ctx.moveTo(sx(p[0]),sy(p[1]));
          }});ctx.stroke();
          ctx.fillStyle=palette[i%palette.length];
          ctx.fillText(n+' '+(group[n].length?
            group[n][group[n].length-1][1].toPrecision(4):''),15,12+12*i);
        }});
        ctx.fillStyle='#888';
        ctx.fillText(y1.toPrecision(3),350,14);
        ctx.fillText(y0.toPrecision(3),350,215);
      }});
    }}
    refresh();setInterval(refresh,5000);</script></body></html>"""

    def __init__(self, channels, port=0, title="training"):
        self.channels = channels
        self.port = port
        self.title = title
        self._httpd = None

    def _series(self):
        log = self.main_loop.log
        groups = []
        for group in self.channels:
            data = {}
            for name in group:
                times, values = log.channel(name)
                data[name] = [[int(t), float(v)]
                              for t, v in zip(times, values)
                              if isinstance(v, (int, float))
                              and math.isfinite(float(v))]
            groups.append(data)
        return groups

    def before_training(self):
        import http.server
        import json
        import threading

        ext = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                if self.path.rstrip("/") in ("", "/index.html"):
                    body = ext.PAGE.format(title=ext.title).encode()
                    ctype = "text/html"
                elif self.path.lstrip("/") == "data.json":
                    body = json.dumps(ext._series()).encode()
                    ctype = "application/json"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = http.server.ThreadingHTTPServer(
            ("0.0.0.0", self.port), Handler)
        self.port = self._httpd.server_address[1]
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        print(f"PlotServer: live plots at http://localhost:{self.port}/",
              file=sys.stderr)

    def after_training(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None


class NanGuard(TrainingExtension):
    """Abort loudly on non-finite monitored values.

    The Theano ``NanGuardMode`` role
    (theano/compile/nanguardmode.py:179) at the training-loop level: the
    step-rule chain already neutralizes non-finite updates
    (RemoveNotFinite), and the driver's FinishAfter condition stops on a
    NaN gradient norm; this extension additionally raises immediately
    when any monitored scalar goes non-finite, for debugging.  For
    op-level tracing use ``JAX_DEBUG_NANS=1`` (jax.config.debug_nans).
    """

    def __init__(self, fields=("train_cost", "total_gradient_norm")):
        self.fields = fields

    def after_batch(self, batch):
        # monitors land in the log one batch late (train/loop.py delayed
        # flush keeps the device pipeline full), so check the latest
        # recorded value: a NaN aborts one step after it appears
        log = self.main_loop.log
        for name in self.fields:
            value = log.last_value(name)
            if value is None:
                value = log.current_row.get(name)
            if isinstance(value, float) and not math.isfinite(value):
                raise FloatingPointError(
                    f"non-finite {name}={value} at iteration "
                    f"{self.main_loop.log.status['iterations_done']}")

    def after_training(self):
        # the one-batch-late check would otherwise never inspect the
        # FINAL batch's monitors (flushed in run()'s finally); raising
        # here aborts the remaining after_training extensions — the
        # final checkpoint is not written with non-finite parameters
        self.after_batch(None)


class JaxProfiler(TrainingExtension):
    """Capture a profiler trace of a window of training steps
    (the Theano function-profiling / BLOCKS_PROFILE role at the device
    level; view with xprof/tensorboard)."""

    def __init__(self, logdir, start_batch=10, num_batches=5):
        self.logdir = logdir
        self.start_batch = start_batch
        self.stop_batch = start_batch + num_batches
        self._running = False

    def before_batch(self, batch):
        import jax
        it = self.main_loop.log.status["iterations_done"]
        if it == self.start_batch and not self._running:
            jax.profiler.start_trace(self.logdir)
            self._running = True

    def after_batch(self, batch):
        import jax
        it = self.main_loop.log.status["iterations_done"]
        if self._running and it >= self.stop_batch:
            jax.profiler.stop_trace()
            self._running = False

    def after_training(self):
        import jax
        if self._running:
            jax.profiler.stop_trace()
            self._running = False


class EmbedShell(TrainingExtension):
    """SIGUSR1 -> drop into pdb inside the running loop (the EmbedIPython
    role, blocks-extras embed_ipython.py:9-36, without requiring a TTY
    hijack)."""

    def before_training(self):
        def handler(signum, frame):
            import pdb
            pdb.Pdb().set_trace(frame)
        try:
            signal.signal(signal.SIGUSR1, handler)
        except ValueError:
            pass  # not in main thread
