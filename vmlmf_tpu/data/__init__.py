from vmlmf_tpu.data.batching import batch_iterator  # noqa: F401
from vmlmf_tpu.data.sliding_window import sliding_window  # noqa: F401
