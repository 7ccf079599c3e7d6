"""Numeric primitives: edit-distance/reward DP, attention expressions, FST."""
from attention_lvcsr_tpu.ops import error_rate, expressions  # noqa: F401
