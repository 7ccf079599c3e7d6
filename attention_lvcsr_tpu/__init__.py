"""attention_lvcsr_tpu — a TPU-native attention-based LVCSR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Theano/Blocks-era ``rizar/attention-lvcsr`` stack (reference layout described
in /root/repo/SURVEY.md): YAML-configured multistage training of
bidirectional-GRU encoders with location-aware (convolutional, window-prior)
attention decoders over HDF5 speech data, fully batched on-device beam-search
decoding with optional FST n-gram LM shallow fusion, task-loss (edit-distance
reward regression) training, CER/WER scoring, checkpoint/resume and training
monitoring.

Layer map (TPU-native):

* ``ops``      — numeric primitives: edit-distance/reward DP, attention
                 expressions, FST tables + on-device transition, Pallas kernels.
* ``models``   — the model family: encoder, location-aware attention,
                 sequence-generator decoder, recognizer assembly (flax.linen).
* ``search``   — batched on-device beam search (`lax.while_loop` + `top_k`).
* ``data``     — HDF5 datasets + bucketed/padded streaming pipelines.
* ``train``    — main loop, extensions, monitoring, logs, checkpoints, optax
                 step rules (the Blocks MainLoop/algorithms equivalents).
* ``parallel`` — device mesh, sharding rules, multi-chip train step.
* ``config``   — YAML configs with parent chains, overrides, schema, stages.
* ``cli``      — run.py-style train/search/sample/test drivers.
"""

__version__ = "0.1.0"
