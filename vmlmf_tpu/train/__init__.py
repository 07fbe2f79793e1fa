from vmlmf_tpu.train.har import HARTrainer, evaluate as har_evaluate  # noqa: F401
from vmlmf_tpu.train.lm import LMTrainer, perplexity  # noqa: F401
from vmlmf_tpu.train.checkpoint import save_checkpoint, load_checkpoint, run_name  # noqa: F401
