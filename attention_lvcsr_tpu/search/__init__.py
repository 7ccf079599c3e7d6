"""On-device batched beam search."""
from attention_lvcsr_tpu.search.beam import (  # noqa: F401
    BeamSearch, CandidateNotFoundError)
