"""CLI + config system: flag parity with the reference entry scripts.

Covers the argparse -> config -> model dispatch chain for every model name the
reference grids use (`main.py:114-124`, `lm_test.py:390-401`,
`test_HAR.sh:12-66`), plus tiny end-to-end runs on synthetic data.
"""

import jax.numpy as jnp
import pytest

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
from vmlmf_tpu.config import HARConfig, LMConfig


class TestHARConfigDispatch:
    @pytest.mark.parametrize("name,cls,u_ranks", [
        ("mylstm", LSTMCell, (6,)),
        ("vmmodel", VMLMFCell, (6,)),
        ("vmlmf", VMLMFCell, (6,)),
        ("vmmodel_group2", VMLMFGroupCell, (2, 4)),
        ("vmlmf_group2", VMLMFGroupCell, (2, 4)),
        ("vmgroup_novm", VMLMFGroupCell, (2, 4)),
        ("mylstm_group", LSTMGroupCell, (12, 6)),
        ("mygru", GRUCell, (6,)),
        ("mygru_group", GRUGroupCell, (2, 4)),
        ("dualdiag", DualDiagonalLSTMCell, (6,)),
        ("diag", DiagonalLSTMCell, None),
    ])
    def test_model_names(self, name, cls, u_ranks):
        cfg = HARConfig(model=name, w_rank=8, u_ranks=u_ranks)
        cell = cfg.cell_factory()(77, 180)
        assert isinstance(cell, cls)

    def test_group_without_uranks_raises(self):
        with pytest.raises(ValueError, match="per-tier"):
            HARConfig(model="vmmodel_group2", u_ranks=None).cell_factory()

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="unsupported"):
            HARConfig(model="nope").cell_factory()

    def test_input_size_by_dataset(self):
        assert HARConfig(data="OPP").input_size == 77
        assert HARConfig(data="UCI").input_size == 9

    def test_build_variants(self):
        from vmlmf_tpu.nn.models import BDNet, DeepConvNet, HARNet

        base = dict(model="vmmodel", w_rank=8, u_ranks=(6,), layer_sizes=(32,))
        assert isinstance(HARConfig(**base).build_model(), HARNet)
        assert isinstance(HARConfig(**base, bidirectional=True).build_model(), BDNet)
        assert isinstance(HARConfig(**base, deepconv=True).build_model(), DeepConvNet)


class TestLMConfigDispatch:
    @pytest.mark.parametrize("t,cls", [
        ("custom", LSTMCell), ("pytorch", LSTMCell),
        ("vmlmf", VMLMFCell), ("vmgroup", VMLMFGroupCell),
    ])
    def test_lstm_types(self, t, cls):
        cfg = LMConfig(lstm_type=t, w_rank=16, u_ranks=(16, 8) if t == "vmgroup" else (16,))
        assert isinstance(cfg.cell_factory()(64, 64), cls)

    def test_build_model(self):
        cfg = LMConfig(lstm_type="vmlmf", hidden_size=32, w_rank=8, u_ranks=(8,))
        m = cfg.build_model(vocab_size=50)
        params = m.init(__import__("jax").random.PRNGKey(0))
        states = m.state0(4)
        ids = jnp.zeros((5, 4), jnp.int32)
        logits, _ = m.apply(params, ids, states, train=False)
        assert logits.shape == (5, 4, 50)


class TestEndToEndCLI:
    def test_har_main_synthetic(self, capsys, tmp_path):
        from vmlmf_tpu.cli.har_main import main

        main(["--synthetic", "--total", "--max_epochs", "1", "--model", "vmmodel",
              "--layer_sizes", "32", "--wRank", "4", "--uRanks", "4",
              "--ckpt_dir", str(tmp_path)])
        out = capsys.readouterr().out
        assert "Test accuracy" in out and "Number of params" in out

    def test_lm_main_synthetic(self, capsys):
        from vmlmf_tpu.cli.lm_main import main

        main(["--synthetic", "--total_epochs", "1", "--hidden_size", "32",
              "--layer_num", "1", "--batch_size", "4", "--seq_length", "8",
              "--vocab_size", "64", "--wRank", "8", "--uRanks", "8"])
        out = capsys.readouterr().out
        assert "perplexity" in out.lower()
