"""vmlmf_tpu — a TPU-native compressed-RNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
snudm-starlab/VMLMF (low-rank + learned-diagonal "vector-multiplication on
low-rank matrix factorization" compression of LSTM/GRU cells), built TPU-first:

- cells are pure functions over parameter pytrees; the time-parallel input
  projection is hoisted out of the recurrence as one large MXU matmul,
- the recurrence runs under ``lax.scan`` (optionally as a single fused Pallas
  kernel that keeps the recurrent factors in VMEM across all timesteps),
- the weight-only diagonal corrections of the VMLMF math are precomputed once
  per training step instead of being re-sliced every timestep,
- training steps are ``jit``/``pjit`` compiled over a named device mesh
  (data-parallel HAR training; vocab-sharded embedding/softmax for the LM).

Reference behavior map (see SURVEY.md):
  cells        <- rnn_compression_factorization_vmlmf/src/models/{vmlmf,vmlmf_group,vmlmf_lm}.py
                  rnn_compression_factorization/src/module/{compressed_lstm,compressed_gru}.py
  models       <- .../models/vmlmf.py:319 (Net), vmlmf_lm.py:363 (Model),
                  rnn_compression_factorization/src/OPP_test.py:116 (BDNet),
                  .../module/compressed_deepConv.py:25 (DeepConvLSTM)
  data         <- .../utils/{oppdataloader,ucidataloader,sliding_window}.py, preprocess_opp.py
  train        <- .../train_test/{train,test,lm_test}.py
  analytics    <- .../utils/compression_cal.py
"""

__version__ = "0.1.0"

from vmlmf_tpu.cells import (  # noqa: F401
    LSTMCell,
    VMLMFCell,
    VMLMFGroupCell,
    GRUCell,
    GRUGroupCell,
    LSTMGroupCell,
    DualDiagonalLSTMCell,
    DiagonalLSTMCell,
)
from vmlmf_tpu.nn.recurrence import RNN  # noqa: F401
from vmlmf_tpu.nn.models import HARNet, BDNet, DeepConvNet, LMModel  # noqa: F401
from vmlmf_tpu.serve import Decoder  # noqa: F401
