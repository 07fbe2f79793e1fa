"""Config system: every reference CLI flag as a typed dataclass field.

The reference scatters argparse definitions across entry scripts
(`main.py:43-82`, `main_total.py:47-88`, `lm_test.py:40-80`, legacy
`OPP_test.py:52-65`); here the union of those flags lives in two dataclasses
so every reference experiment grid (demo.sh, test_HAR.sh) is expressible, and
the CLIs are thin argparse shims over them.
"""

from __future__ import annotations

import dataclasses

from vmlmf_tpu.cells import (
    DiagonalLSTMCell,
    DualDiagonalLSTMCell,
    GRUCell,
    GRUGroupCell,
    LSTMCell,
    LSTMGroupCell,
    VMLMFCell,
    VMLMFGroupCell,
)
from vmlmf_tpu.nn.models import BDNet, DeepConvNet, HARNet, LMModel


@dataclasses.dataclass
class HARConfig:
    # model
    model: str = "mylstm"          # mylstm | vmmodel | vmmodel_group2 | mygru |
                                   # mygru_group | mylstm_group | dualdiag | diag
    layer_sizes: tuple = (180,)
    w_rank: int | None = None
    u_ranks: tuple | None = None   # single-element tuple for non-group cells
    groups: int = 2
    bidirectional: bool = False
    merge: str = "concat"          # BDNet merge: concat | sum | avg
    deepconv: bool = False
    # data
    data: str = "OPP"              # OPP | UCI
    dataset_folder: str | None = None
    num_classes: int = 18          # reference hardcodes 18 for both datasets
    channels: int = 77             # OPP variant: 77 (challenge) | 113 (legacy,
                                   # `OPP_test.py:175` / preprocess_Opportunity.py)
    task: str = "gestures"         # gestures | locomotion (113-ch pipeline only)
    # training
    lr: float = 2e-3
    batch_size: int = 81
    max_epochs: int = 100
    seed: int = 3
    is_train: bool = True
    # execution: "xla" (lax.scan) | "pallas" (fused whole-scan kernel — the
    # measured winner at every config).  The wavefront schedules
    # ("pipelined" / "pallas_pipelined") are retired experiment knobs
    # gated on VMLMF_EXPERIMENTAL_WAVEFRONT=1 — docs/wavefront.md.
    backend: str = "xla"

    @property
    def input_size(self):
        return self.channels if self.data.lower() == "opp" else 9

    def _u_scalar(self):
        if self.u_ranks is None:
            return None
        return self.u_ranks[-1] if len(self.u_ranks) < 2 else self.u_ranks[0]

    def cell_factory(self):
        name = self.model.lower()
        w, u = self.w_rank, self._u_scalar()
        if ("group" in name) and self.u_ranks is None:
            raise ValueError(
                f"model {self.model!r} needs per-tier recurrent ranks: pass "
                f"--uRanks r0 r1 ... (one per group, e.g. --uRanks 2 4)")
        if name in ("vmmodel", "vmlmf"):
            return lambda n, h: VMLMFCell(n, h, w_rank=w, u_rank=u)
        if name in ("vmmodel_group2", "vmlmf_group2", "vmgroup"):
            return lambda n, h: VMLMFGroupCell(
                n, h, w_rank=w, u_ranks=tuple(self.u_ranks), groups=self.groups)
        if name in ("vmgroup_novm",):
            return lambda n, h: VMLMFGroupCell(
                n, h, w_rank=w, u_ranks=tuple(self.u_ranks), groups=self.groups,
                use_vm=False)
        if name == "mylstm":
            return lambda n, h: LSTMCell(n, h, w_rank=w, u_rank=u)
        if name == "mylstm_group":
            return lambda n, h: LSTMGroupCell(
                n, h, w_rank=w, u_ranks=tuple(self.u_ranks), groups=self.groups)
        if name == "mygru":
            return lambda n, h: GRUCell(n, h, w_rank=w, u_rank=u)
        if name == "mygru_group":
            return lambda n, h: GRUGroupCell(
                n, h, w_rank=w, u_ranks=tuple(self.u_ranks), groups=self.groups)
        if name == "dualdiag":
            return lambda n, h: DualDiagonalLSTMCell(n, h, w_rank=w, u_rank=u)
        if name == "diag":
            return lambda n, h: DiagonalLSTMCell(n, h)
        raise ValueError(f"unsupported cell model {self.model!r}")

    def build_model(self):
        factory = self.cell_factory()
        if self.deepconv:
            return DeepConvNet(self.input_size, tuple(self.layer_sizes),
                               cell_factory=factory, num_classes=self.num_classes,
                               backend=self.backend)
        if self.bidirectional:
            return BDNet(self.input_size, tuple(self.layer_sizes),
                         cell_factory=factory, num_classes=self.num_classes,
                         merge=self.merge, backend=self.backend)
        return HARNet(self.input_size, tuple(self.layer_sizes),
                      cell_factory=factory, num_classes=self.num_classes,
                      backend=self.backend)


@dataclasses.dataclass
class LMConfig:
    # model (`lm_test.py:46-79`)
    lstm_type: str = "vmlmf"       # custom | vmlmf | vmgroup  (pytorch -> custom)
    layer_num: int = 2
    hidden_size: int = 650
    dropout: float = 0.5
    winit: float = 0.05
    w_rank: int = 300
    u_ranks: tuple = (300,)
    groups: int = 2
    tie_embeddings: bool = False
    head_bf16: bool = False        # bf16 softmax-projection matmul (f32 accum)
    # training
    batch_size: int = 20
    seq_length: int = 35
    learning_rate: float = 1.0
    total_epochs: int = 39
    factor_epoch: int = 6
    factor: float = 1.2
    max_grad_norm: float = 5.0
    seed: int = 0
    data_dir: str | None = "./data"
    # execution: "xla" | "pallas" ("pallas" is the measured winner at the
    # PTB flagship config — BASELINE.md; wavefront knobs see
    # HARConfig.backend / docs/wavefront.md)
    backend: str = "xla"

    def cell_factory(self):
        t = self.lstm_type.lower()
        u = self.u_ranks[-1] if len(self.u_ranks) < 2 else self.u_ranks[0]
        if t in ("custom", "pytorch", "lstm"):
            return lambda n, h: LSTMCell(n, h)
        if t == "vmlmf":
            return lambda n, h: VMLMFCell(n, h, w_rank=self.w_rank, u_rank=u)
        if t in ("vmgroup", "vm_group"):
            return lambda n, h: VMLMFGroupCell(
                n, h, w_rank=self.w_rank, u_ranks=tuple(self.u_ranks),
                groups=self.groups)
        raise ValueError(f"unsupported lstm_type {self.lstm_type!r}")

    def build_model(self, vocab_size):
        return LMModel(
            vocab_size, self.hidden_size, self.layer_num,
            cell_factory=self.cell_factory(), dropout_rate=self.dropout,
            winit=self.winit, tie_embeddings=self.tie_embeddings,
            backend=self.backend, head_bf16=self.head_bf16,
        )
