"""Shared helper: build a RecognizerNet dataclass from a shipped
experiment YAML (the routing-regression tests classify every config
through the decode / train kernel gates)."""
import glob
import os

from attention_lvcsr_tpu.config import Configuration
from attention_lvcsr_tpu.models.recognizer import RecognizerNet


def shipped_config_paths():
    root = os.path.join(os.path.dirname(__file__), os.pardir)
    return sorted(
        glob.glob(os.path.join(root, "exp", "*", "configs", "*.yaml")))


def build_net_from_config(path, drop_lm=False, **overrides):
    """RecognizerNet (no params) from a config's net section, with
    placeholder data-derived fields; None when the config has no net
    section.  ``drop_lm`` strips the decode-time shallow-fusion config
    (whose FST file only exists at decode time)."""
    config = Configuration(path)
    net_config = dict(config.get("net") or {})
    if not net_config:
        return None
    net_config.pop("input_sources", None)
    net_config.pop("compute_dtype", None)
    if drop_lm:
        net_config.pop("lm", None)
    bottom = net_config.get("bottom", {"bottom_class": "speech"})
    kind = str(bottom.get("bottom_class", "speech")).rsplit(".", 1)[-1]
    if kind in ("speech", "SpeechBottom"):
        dims = {"input_dims": {"recordings": 123}, "input_num_chars": {}}
    else:
        dims = {"input_dims": {}, "input_num_chars": {"inputs": 32}}
    return RecognizerNet(**dict(
        net_config, **dims, eos_label=31, num_phonemes=32, **overrides))
