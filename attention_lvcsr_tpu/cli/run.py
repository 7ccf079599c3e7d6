"""Command-line front end: train / test / init_norm / search / sample /
show_data.

Counterpart of ``bin/run.py:16-154``: same subcommands, YAML config path +
``path value`` dotted-path override pairs, dispatching into
:mod:`attention_lvcsr_tpu.train.driver`.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys


class ParseChanges(argparse.Action):
    """Collect trailing ``path value`` pairs into (path, value) tuples."""

    def __call__(self, parser, namespace, values, option_string=None):
        if len(values) % 2:
            raise ValueError(
                "config changes must come in (path, value) pairs")
        setattr(namespace, self.dest,
                list(zip(values[::2], values[1::2])))


def prepare_config(args):
    from attention_lvcsr_tpu.config import Configuration
    return Configuration(args.config_path,
                         schema_path=getattr(args, "schema", None),
                         config_changes=args.config_changes or [])


def build_parser():
    parser = argparse.ArgumentParser(
        description="Fully neural speech recognition (TPU-native)")
    parser.add_argument("--logging", default="INFO",
                        help="logging level (DEBUG/INFO/WARNING)")
    subparsers = parser.add_subparsers(dest="mode", required=True)

    def add_common(sub, with_save=False, with_params=True):
        if with_save:
            sub.add_argument("save_path", help="where to save the model")
        sub.add_argument("config_path", help="experiment YAML")
        if with_params:
            sub.add_argument("--params", default=None,
                             help="load parameters from this checkpoint")
        sub.add_argument("config_changes", nargs="*", action=ParseChanges,
                         default=[],
                         help="trailing (dotted.path value) override pairs")

    t = subparsers.add_parser("train", help="train a model")
    add_common(t, with_save=True)
    t.add_argument("--fast-start", action="store_true",
                   help="skip initial validation/search")
    t.add_argument("--use-load-ext", action="store_true",
                   help="resume full state (iteration + log)")
    t.add_argument("--load-log", action="store_true",
                   help="load only the log from --params")
    t.add_argument("--start-stage", default=None)
    t.add_argument("--final-stage", default=None)
    t.add_argument("--profile", action="store_true")

    te = subparsers.add_parser("test", help="evaluate on the test set")
    add_common(te)

    n = subparsers.add_parser("init_norm",
                              help="estimate feature normalization")
    add_common(n, with_save=True, with_params=False)

    s = subparsers.add_parser("search", help="beam-search decode")
    add_common(s)
    s.add_argument("--part", default="valid")
    s.add_argument("--report", default=None,
                   help="directory for report.txt + alignment plots")
    s.add_argument("--decoded-save", default=None)
    s.add_argument("--decode-only", default=None,
                   help="python expression for utterance numbers")
    s.add_argument("--nll-only", action="store_true")
    s.add_argument("--seed", type=int, default=None)

    sa = subparsers.add_parser("sample", help="sample from the model")
    add_common(sa)
    sa.add_argument("--part", default="valid")

    sd = subparsers.add_parser("show_data",
                               help="print a batch of training data")
    add_common(sd, with_params=False)

    sv = subparsers.add_parser("serve", help="HTTP decode endpoint with "
                               "micro-batching")
    add_common(sv)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--beam-size", type=int, default=None)
    sv.add_argument("--max-batch", type=int, default=8)
    sv.add_argument("--batch-wait-ms", type=float, default=20.0)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, args.logging.upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    # Honor JAX_PLATFORMS even in environments whose sitecustomize
    # pre-registers a platform plugin (the env var alone loses that race).
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if os.environ.get("LVSR_COMPILE_CACHE"):
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["LVSR_COMPILE_CACHE"])
    config = prepare_config(args)

    from attention_lvcsr_tpu.train import driver
    if args.mode == "train":
        return driver.train_multistage(
            config, args.save_path, params_path=args.params,
            start_stage=args.start_stage, final_stage=args.final_stage,
            fast_start=args.fast_start, use_load_ext=args.use_load_ext,
            load_log=args.load_log, profile=args.profile)
    if args.mode == "test":
        return driver.test(config)
    if args.mode == "init_norm":
        return driver.init_norm(config, args.save_path)
    if args.mode == "search":
        decode_only = eval(args.decode_only) if args.decode_only else None
        return driver.search(
            config, args.params, part=args.part, decode_only=decode_only,
            report=args.report, decoded_save=args.decoded_save,
            nll_only=args.nll_only, seed=args.seed)
    if args.mode == "sample":
        return driver.sample(config, args.params, part=args.part)
    if args.mode == "show_data":
        return driver.show_data(config)
    if args.mode == "serve":
        from attention_lvcsr_tpu.serve import serve
        return serve(config, args.params, host=args.host, port=args.port,
                     beam_size=args.beam_size, max_batch=args.max_batch,
                     batch_wait_ms=args.batch_wait_ms)
    raise ValueError(args.mode)


if __name__ == "__main__":
    main()
