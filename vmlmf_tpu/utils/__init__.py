from vmlmf_tpu.utils.analytics import (  # noqa: F401
    count_params,
    lstm_cell_flops,
    model_flops,
    compression_report,
)
from vmlmf_tpu.utils.timer import Timer  # noqa: F401
