from vmlmf_tpu.parallel.mesh import make_mesh  # noqa: F401
from vmlmf_tpu.parallel.sharding import (  # noqa: F401
    replicated,
    batch_sharding,
    lm_param_sharding,
    har_param_sharding,
    shard_params,
)
from vmlmf_tpu.parallel.pipeline_parallel import (  # noqa: F401
    pipeline_parallel_scan,
)
