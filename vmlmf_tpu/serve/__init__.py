"""Serving: autoregressive decode for the LM (prefill + sampled generation)
and session-based next-item ranking over a sharded item table."""

from vmlmf_tpu.serve.decoder import Decoder
from vmlmf_tpu.serve.ranker import SessionRanker

__all__ = ["Decoder", "SessionRanker"]
