from vmlmf_tpu.ops.lowrank import (  # noqa: F401
    lowrank_proj,
    gate_diag_rowsum,
    group_diag_rowsum,
    group_lowrank_proj,
    dense_from_lowrank,
    dense_from_group,
)
from vmlmf_tpu.ops.pipeline import (  # noqa: F401
    pipelined_available,
    pipelined_lstm_scan,
)
