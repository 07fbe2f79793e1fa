"""Serving: autoregressive decode for the LM (prefill + sampled generation)."""

from vmlmf_tpu.serve.decoder import Decoder

__all__ = ["Decoder"]
