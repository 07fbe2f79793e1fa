from vmlmf_tpu.cells.base import Cell, lstm_update, reinit_uniform  # noqa: F401
from vmlmf_tpu.cells.lstm import LSTMCell  # noqa: F401
from vmlmf_tpu.cells.vmlmf import VMLMFCell  # noqa: F401
from vmlmf_tpu.cells.group import VMLMFGroupCell, LSTMGroupCell  # noqa: F401
from vmlmf_tpu.cells.gru import GRUCell, GRUGroupCell  # noqa: F401
from vmlmf_tpu.cells.legacy import DualDiagonalLSTMCell, DiagonalLSTMCell  # noqa: F401
