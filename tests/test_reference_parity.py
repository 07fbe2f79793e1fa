"""Ground-truth parity vs the ACTUAL reference implementation (PyTorch CPU).

Every oracle in `test_cells.py` is a self-derived dense reconstruction — if
the reference math had been misread, implementation and oracle would be wrong
together.  These tests close that gap: they import the reference modules from
/root/reference (read-only), transplant identical weights into them, and
assert equivalence at three levels:

  1. single-step cell outputs           (atol ~1e-5, fp32)
  2. gradients through one step         (atol ~1e-4)
  3. full training trajectories         (optimizer-step param parity +
                                         end-of-training metric band)

Gate-order mapping (the reference mixes THREE chunk orders between files; the
framework standardizes on (i, f, g, o) — see `cells/base.py:lstm_update`):

  reference layout                                        -> perm to (i,f,g,o)
  ------------------------------------------------------------------------
  (i, f, o, n) chunks — `vmlmf.py:113-114` (both sides),     PX_IFON = (0,1,3,2)
     `vmlmf_lm.py:260-261` (both sides), and the x-side of
     `vmlmf_group.py:113`
  (f, i, n, o) chunks — the h-side of the group cell         PH_FINO = (1,0,2,3)
     (`vmlmf_group.py:134,142`) and BOTH sides of the no-vm
     ablation (`vmlmf_group.py:211,239`)
  (i, f, o, c) per-gate params — `MyLSTMCell` w1..w4/u1..u4  P_IFOC  = (0,1,3,2)
     (`vmlmf.py:223-232`)
  (f, i, c, o) param lists — `myDualDiagonalLSTMCell.Ws`     P_FICO  = (1,0,2,3)
     (`compressed_lstm.py:44-46`)

Each permutation is a pure relabeling of independently-initialized blocks, so
transplanting with the permutation applied must reproduce the reference
function exactly.  Note the group cell genuinely CROSSES orders between its
x-side and h-side — chunk 0 of gx feeds the input gate while chunk 0 of gh
feeds the forget gate — which these tests reproduce faithfully.

NOT transplant-testable (documented divergence): `MyVMLSTMGroup`
(`vmlmf_lm.py:53-174`).  Its recurrent output is flattened GROUP-major
(`lstm_step` line 135: [B, g, 4k] -> [B, 4h]) while its vm terms and x-side
are gate-major, so each gate nonlinearity consumes a (group, gate)-scrambled
mix of blocks whose input-group connectivity differs per position — not a
parameter relabeling of any coherent group cell (on top of the hardcoded
batch-40 scratch buffers at `vmlmf_lm.py:112-113` that crash every other
batch size).  The framework's `VMLMFGroupCell` implements the coherent
gate-major wiring for the LM, matching the HAR group cell it was derived
from; capability (not bug-for-bug) parity, per SURVEY.md §7.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(),
    reason="reference checkout not present (standalone install) — "
           "the dense-reconstruction oracles in test_cells.py still run",
)
REF_MODELS = REF / "rnn_compression_factorization_vmlmf/src/models"
REF_TRAIN = REF / "rnn_compression_factorization_vmlmf/src/train_test"
REF_LEGACY = REF / "rnn_compression_factorization/src/module"

PX_IFON = (0, 1, 3, 2)
PH_FINO = (1, 0, 2, 3)
P_IFOC = (0, 1, 3, 2)
P_FICO = (1, 0, 2, 3)


def _load(path, name):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_vmlmf():
    return _load(REF_MODELS / "vmlmf.py", "ref_vmlmf")


@pytest.fixture(scope="module")
def ref_group():
    return _load(REF_MODELS / "vmlmf_group.py", "ref_vmlmf_group")


@pytest.fixture(scope="module")
def ref_lm():
    return _load(REF_MODELS / "vmlmf_lm.py", "ref_vmlmf_lm")


@pytest.fixture(scope="module")
def ref_gru():
    return _load(REF_LEGACY / "compressed_gru.py", "ref_compressed_gru")


@pytest.fixture(scope="module")
def ref_lstm_legacy():
    return _load(REF_LEGACY / "compressed_lstm.py", "ref_compressed_lstm")


@pytest.fixture(scope="module")
def ref_train():
    return _load(REF_TRAIN / "train.py", "ref_train")


@pytest.fixture(scope="module")
def ref_lm_test(ref_lm):
    # lm_test.py does `from models.vmlmf_lm import Model`; satisfy it with the
    # already-loaded reference module under an alias package.
    if "models" not in sys.modules:
        sys.modules["models"] = types.ModuleType("models")
    sys.modules["models.vmlmf_lm"] = ref_lm
    sys.modules["models"].vmlmf_lm = ref_lm
    return _load(REF_TRAIN / "lm_test.py", "ref_lm_test")


def t2n(t):
    # .copy() is load-bearing: .numpy() shares memory with the torch tensor,
    # the reference train loops update params IN PLACE, and jax.numpy.asarray
    # on CPU can be zero-copy — without the copy, "initial" transplants would
    # silently track the reference's training.
    return t.detach().cpu().numpy().copy()


def perm_gates(a, block, perm, axis=0):
    """Relabel the stacked-gate axis: [.., G*block, ..] ref chunk layout ->
    framework (i,f,g,o)/(r,z,n) layout (framework gate k = ref chunk perm[k])."""
    a = np.asarray(a)
    shape = a.shape
    g = len(perm)
    assert shape[axis] == g * block
    exp = a.reshape(shape[:axis] + (g, block) + shape[axis + 1 :])
    exp = np.take(exp, perm, axis=axis)
    return np.ascontiguousarray(exp.reshape(shape))


def assert_close(a, b, atol=2e-5, rtol=2e-5, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol,
                               err_msg=msg)


def _grad_parity(jax_loss_fn, params, ref_grads_mapped, atol=2e-4):
    grads = jax.grad(jax_loss_fn)(params)
    for k, g_ref in ref_grads_mapped.items():
        assert_close(grads[k], g_ref, atol=atol, rtol=2e-4, msg=f"grad[{k}]")


# ---------------------------------------------------------------------------
# 1. VMLMF HAR cell (`vmlmf.py:78-125`)
# ---------------------------------------------------------------------------

def _vmlmf_params_from_ref(rc, h):
    return {
        "u_x": t2n(rc.u_x),
        "u_h": t2n(rc.u_h),
        "v_x": perm_gates(t2n(rc.v_x), h, PX_IFON),
        "v_h": perm_gates(t2n(rc.v_h), h, PX_IFON),
        "b_x": perm_gates(t2n(rc.b_x), h, PX_IFON),
        "b_h": perm_gates(t2n(rc.b_h), h, PX_IFON),
        "d_x": t2n(rc.dia_x)[0],
        "d_h": t2n(rc.dia_h)[0],
    }


@pytest.mark.parametrize("n,h", [(7, 12), (12, 12)])
def test_vmlmf_cell_step_parity(ref_vmlmf, n, h):
    from vmlmf_tpu.cells.vmlmf import VMLMFCell

    wr, ur, b = 4, 3, 5
    torch.manual_seed(0)
    rc = ref_vmlmf.MyVMLMFCell(n, h, w_rank=wr, u_ranks=ur)
    x = torch.randn(b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    h1, c1 = rc(x, (h0, c0))

    cell = VMLMFCell(n, h, w_rank=wr, u_rank=ur)
    params = jax.tree_util.tree_map(jnp.asarray, _vmlmf_params_from_ref(rc, h))
    (h1j, c1j), _ = cell.apply_step(params, jnp.asarray(t2n(x)),
                                    (jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))))
    assert_close(h1j, t2n(h1), msg="h'")
    assert_close(c1j, t2n(c1), msg="c'")


def test_vmlmf_cell_gradient_parity(ref_vmlmf):
    from vmlmf_tpu.cells.vmlmf import VMLMFCell

    n, h, wr, ur, b = 7, 12, 4, 3, 5
    torch.manual_seed(1)
    rc = ref_vmlmf.MyVMLMFCell(n, h, w_rank=wr, u_ranks=ur)
    x = torch.randn(b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    h1, c1 = rc(x, (h0, c0))
    (h1.sum() + c1.sum()).backward()

    cell = VMLMFCell(n, h, w_rank=wr, u_rank=ur)
    params = jax.tree_util.tree_map(jnp.asarray, _vmlmf_params_from_ref(rc, h))
    xj, h0j, c0j = jnp.asarray(t2n(x)), jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))

    def loss(p):
        (h1j, c1j), _ = cell.apply_step(p, xj, (h0j, c0j))
        return h1j.sum() + c1j.sum()

    ref_grads = {
        "u_x": t2n(rc.u_x.grad),
        "u_h": t2n(rc.u_h.grad),
        "v_x": perm_gates(t2n(rc.v_x.grad), h, PX_IFON),
        "v_h": perm_gates(t2n(rc.v_h.grad), h, PX_IFON),
        "b_x": perm_gates(t2n(rc.b_x.grad), h, PX_IFON),
        "b_h": perm_gates(t2n(rc.b_h.grad), h, PX_IFON),
        "d_x": t2n(rc.dia_x.grad)[0],
        "d_h": t2n(rc.dia_h.grad)[0],
    }
    _grad_parity(loss, params, ref_grads)


def test_vmlmf_net_forward_parity(ref_vmlmf):
    """Full HAR network: 2-layer MyLSTM(MyVMLMFCell) + Linear head vs HARNet."""
    from vmlmf_tpu.cells.vmlmf import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet

    n, h, wr, ur, b, t = 9, 16, 4, 3, 6, 11
    torch.manual_seed(2)
    net = ref_vmlmf.Net(n, layer_sizes=[h, h], w_rank=wr, u_rank=[ur],
                        model=ref_vmlmf.MyLSTM, cell=ref_vmlmf.MyVMLMFCell)
    net.eval()
    x = torch.randn(b, t, n)
    with torch.no_grad():
        out_ref = net(x)

    model = HARNet(n, (h, h), cell_factory=lambda i, o: VMLMFCell(i, o, wr, ur))
    params = {
        "rnn": [
            jax.tree_util.tree_map(jnp.asarray, _vmlmf_params_from_ref(c, h))
            for c in net.rnn.rnncells
        ],
        "head": {"w": jnp.asarray(t2n(net.lin.weight).T),
                 "b": jnp.asarray(t2n(net.lin.bias))},
    }
    out = model.apply(params, jnp.asarray(t2n(x)))
    assert_close(out, t2n(out_ref), atol=5e-5, msg="Net logits")


# ---------------------------------------------------------------------------
# 2. Group VMLMF cell (`vmlmf_group.py:85-155`) — crossed gate orders
# ---------------------------------------------------------------------------

def _group_params_from_ref(rc, h, g, n_tiers, use_vm=True):
    k = h // g
    ly = rc.layers
    px = PX_IFON if use_vm else PH_FINO  # the no-vm ablation chunks x as (f,i,n,o)
    p = {
        "u_x": t2n(ly["u_x"]),
        "v_x": perm_gates(t2n(ly["v_x"]), h, px),
        "b_x": perm_gates(t2n(ly["bias_x"])[0], h, px),
        "b_h": perm_gates(t2n(ly["bias_h"])[0], h, PH_FINO),
    }
    if use_vm:
        p["d_x"] = t2n(ly["dia_x"])[0]
        p["d_h"] = t2n(ly["dia_h"])[0]
    for i in range(n_tiers):
        p[f"u_h_{i}"] = t2n(ly[f"u_h_{i}"])
        p[f"v_h_{i}"] = perm_gates(t2n(ly[f"v_h_{i}"]), k, PH_FINO, axis=2)
    return p


@pytest.mark.parametrize("use_vm", [True, False])
def test_group_cell_step_parity(ref_group, use_vm):
    from vmlmf_tpu.cells.group import VMLMFGroupCell

    n, h, wr, urs, g, b = 5, 8, 3, (2, 3), 2, 4
    torch.manual_seed(3)
    cls = ref_group.MyVMLMFCellg2 if use_vm else ref_group.MyVMLMFgCellg2
    rc = cls(n, h, w_rank=wr, u_ranks=list(urs), g=g)
    x = torch.randn(b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    h1, c1 = rc(x, (h0, c0))

    cell = VMLMFGroupCell(n, h, w_rank=wr, u_ranks=urs, groups=g, use_vm=use_vm)
    params = jax.tree_util.tree_map(
        jnp.asarray, _group_params_from_ref(rc, h, g, len(urs), use_vm))
    (h1j, c1j), _ = cell.apply_step(params, jnp.asarray(t2n(x)),
                                    (jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))))
    assert_close(h1j, t2n(h1), msg="group h'")
    assert_close(c1j, t2n(c1), msg="group c'")


def test_group_cell_gradient_parity(ref_group):
    from vmlmf_tpu.cells.group import VMLMFGroupCell

    n, h, wr, urs, g, b = 5, 8, 3, (2, 3), 2, 4
    k = h // g
    torch.manual_seed(4)
    rc = ref_group.MyVMLMFCellg2(n, h, w_rank=wr, u_ranks=list(urs), g=g)
    x = torch.randn(b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    h1, c1 = rc(x, (h0, c0))
    (h1.sum() + c1.sum()).backward()

    cell = VMLMFGroupCell(n, h, w_rank=wr, u_ranks=urs, groups=g, use_vm=True)
    params = jax.tree_util.tree_map(
        jnp.asarray, _group_params_from_ref(rc, h, g, len(urs), True))
    xj, h0j, c0j = jnp.asarray(t2n(x)), jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))

    def loss(p):
        (h1j, c1j), _ = cell.apply_step(p, xj, (h0j, c0j))
        return h1j.sum() + c1j.sum()

    ly = rc.layers
    ref_grads = {
        "u_x": t2n(ly["u_x"].grad),
        "v_x": perm_gates(t2n(ly["v_x"].grad), h, PX_IFON),
        "b_x": perm_gates(t2n(ly["bias_x"].grad)[0], h, PX_IFON),
        "b_h": perm_gates(t2n(ly["bias_h"].grad)[0], h, PH_FINO),
        "d_x": t2n(ly["dia_x"].grad)[0],
        "d_h": t2n(ly["dia_h"].grad)[0],
    }
    for i in range(len(urs)):
        ref_grads[f"u_h_{i}"] = t2n(ly[f"u_h_{i}"].grad)
        ref_grads[f"v_h_{i}"] = perm_gates(t2n(ly[f"v_h_{i}"].grad), k, PH_FINO, axis=2)
    _grad_parity(loss, params, ref_grads)


# ---------------------------------------------------------------------------
# 3. LM VMLMF layer (`vmlmf_lm.py:222-280`) — step + own time loop
# ---------------------------------------------------------------------------

def _fill_uniform(module, lo=-0.08, hi=0.08):
    """The LM layer declares empty `torch.Tensor` params (`vmlmf_lm.py:200-213`,
    normally overwritten by `Model.reset_parameters`); fill deterministically."""
    with torch.no_grad():
        for p in module.parameters():
            p.uniform_(lo, hi)


def test_lm_vmlstm_layer_parity(ref_lm):
    from vmlmf_tpu.cells.vmlmf import VMLMFCell
    from vmlmf_tpu.nn.recurrence import scan_layer

    n = h = 10
    wr, ur, b, t = 4, 3, 5, 7
    torch.manual_seed(5)
    layer = ref_lm.MyVMLSTM(n, h, w_rank=wr, u_ranks=ur)
    _fill_uniform(layer)
    xs = torch.randn(t, b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    with torch.no_grad():
        ys_ref, (hT, cT) = layer(xs, (h0, c0))

    cell = VMLMFCell(n, h, w_rank=wr, u_rank=ur)
    params = {
        "u_x": t2n(layer.u_x),
        "u_h": t2n(layer.u_h),
        "v_x": perm_gates(t2n(layer.w_x), h, PX_IFON),
        "v_h": perm_gates(t2n(layer.w_h), h, PX_IFON),
        "b_x": perm_gates(t2n(layer.b_x), h, PX_IFON),
        "b_h": perm_gates(t2n(layer.b_h), h, PX_IFON),
        "d_x": t2n(layer.dia_x)[0],
        "d_h": t2n(layer.dia_h)[0],
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    prep = cell.prepare(params)
    ys, (hTj, cTj) = scan_layer(cell, prep, jnp.asarray(t2n(xs)),
                                (jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))))
    assert_close(ys, t2n(ys_ref), atol=5e-5, msg="LM layer outputs over T")
    assert_close(hTj, t2n(hT), atol=5e-5)
    assert_close(cTj, t2n(cT), atol=5e-5)


# ---------------------------------------------------------------------------
# 4. Vanilla / LMF LSTM cell (`vmlmf.py:188-238`), gate params in (i,f,o,c)
# ---------------------------------------------------------------------------

def _lstm_params_from_ref(rc, low_rank):
    bias = np.concatenate([t2n(rc.bias_i)[0], t2n(rc.bias_f)[0],
                           t2n(rc.bias_c)[0], t2n(rc.bias_o)[0]])
    # mat_val_{i,f,o,c} use w1,w2,w3,w4 — concat per framework order (i,f,g,o)
    ws = [t2n(rc.w1), t2n(rc.w2), t2n(rc.w4), t2n(rc.w3)]
    us = [t2n(rc.u1), t2n(rc.u2), t2n(rc.u4), t2n(rc.u3)]
    if low_rank:
        return {
            "w_fac": t2n(rc.w), "w_proj": np.concatenate(ws, axis=1),
            "u_fac": t2n(rc.u), "u_proj": np.concatenate(us, axis=1),
            "b": bias,
        }
    return {"w": np.concatenate(ws, axis=1), "u": np.concatenate(us, axis=1),
            "b": bias}


@pytest.mark.parametrize("low_rank", [False, True])
def test_mylstm_cell_parity(ref_vmlmf, low_rank):
    from vmlmf_tpu.cells.lstm import LSTMCell

    n, h, b = 6, 9, 4
    wr, ur = (3, 2) if low_rank else (None, None)
    torch.manual_seed(6)
    rc = ref_vmlmf.MyLSTMCell(n, h, w_rank=wr, u_ranks=ur)
    x = torch.randn(b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    h1, c1 = rc(x, (h0, c0))

    cell = LSTMCell(n, h, w_rank=wr, u_rank=ur)
    params = jax.tree_util.tree_map(jnp.asarray, _lstm_params_from_ref(rc, low_rank))
    (h1j, c1j), _ = cell.apply_step(params, jnp.asarray(t2n(x)),
                                    (jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))))
    assert_close(h1j, t2n(h1))
    assert_close(c1j, t2n(c1))


# ---------------------------------------------------------------------------
# 5. Legacy GRU (`compressed_gru.py:80-117`) and group GRU g2 (:192-251)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("low_rank", [False, True])
def test_legacy_gru_cell_parity(ref_gru, low_rank):
    from vmlmf_tpu.cells.gru import GRUCell

    n, h, b = 6, 8, 4
    wr, ur = (3, 2) if low_rank else (None, None)
    torch.manual_seed(7)
    rc = ref_gru.myGRUCell(n, h, wRank=wr, uRank=ur)
    x = torch.randn(b, n)
    h0 = torch.randn(b, h)
    h1 = rc(x, h0)

    cell = GRUCell(n, h, w_rank=wr, u_rank=ur)
    bias = np.concatenate([t2n(rc.bias_r)[0], t2n(rc.bias_gate)[0],
                           t2n(rc.bias_update)[0]])
    if low_rank:
        params = {
            "w_fac": t2n(rc.W),
            "w_proj": np.concatenate([t2n(rc.W1), t2n(rc.W2), t2n(rc.W3)], axis=1),
            "u_fac": t2n(rc.U),
            "u_proj_rz": np.concatenate([t2n(rc.U1), t2n(rc.U2)], axis=1),
            "u_proj_n": t2n(rc.U3),
            "b": bias,
        }
    else:
        params = {
            "w": np.concatenate([t2n(rc.W1), t2n(rc.W2), t2n(rc.W3)], axis=1),
            "u_rz": np.concatenate([t2n(rc.U1), t2n(rc.U2)], axis=1),
            "u_n": t2n(rc.U3),
            "b": bias,
        }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    h1j, _ = cell.apply_step(params, jnp.asarray(t2n(x)), jnp.asarray(t2n(h0)))
    assert_close(h1j, t2n(h1), msg="GRU h'")


def test_legacy_gru_group3_parity(ref_gru):
    """Three rotation tiers (`compressed_gru.py:333-419`) — validates the
    parametric `groups` generalization beyond g=2."""
    from vmlmf_tpu.cells.gru import GRUGroupCell

    n, h, g, b = 5, 9, 3, 4
    urs = (3, 2, 2)
    torch.manual_seed(15)
    rc = ref_gru.myGRUCell_group3(n, h, wRank=None, uRanks=list(urs), g=g)
    x = torch.randn(b, n)
    h0 = torch.randn(b, h)
    h1 = rc(x, h0)

    cell = GRUGroupCell(n, h, w_rank=None, u_ranks=urs, groups=g)
    params = {
        "w": np.concatenate([t2n(rc.W1), t2n(rc.W2), t2n(rc.W3)], axis=1),
        "b": np.concatenate([t2n(rc.bias_r)[0], t2n(rc.bias_gate)[0],
                             t2n(rc.bias_update)[0]]),
        "u_h_0": t2n(rc.U),
        "v_h_0": np.concatenate([t2n(rc.U1), t2n(rc.U2), t2n(rc.U3)], axis=2),
        "u_h_1": t2n(rc.UU),
        "v_h_1": np.concatenate([t2n(rc.UU1), t2n(rc.UU2), t2n(rc.UU3)], axis=2),
        "u_h_2": t2n(rc.UUU),
        "v_h_2": np.concatenate([t2n(rc.UUU1), t2n(rc.UUU2), t2n(rc.UUU3)], axis=2),
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    h1j, _ = cell.apply_step(params, jnp.asarray(t2n(x)), jnp.asarray(t2n(h0)))
    assert_close(h1j, t2n(h1), msg="group-3 GRU h'")


@pytest.mark.parametrize("low_rank", [False, True])
def test_legacy_lstm_group_cell_parity(ref_lstm_legacy, low_rank):
    """`myLSTMGroupCell` (`compressed_lstm.py:287-422`): per-gate USE order is
    (f, i, o, c) — forward calls Ws[0]/Ugate[+0] for forget, Ws[1]/+1 input,
    Ws[2]/+2 output, Ws[3]/+3 candidate (`:328-402`) — despite the ctor
    comment claiming (f, i, c, o).  Framework (i,f,g,o) <- use indices
    (1, 0, 3, 2)."""
    from vmlmf_tpu.cells.group import LSTMGroupCell

    n, h, g, b = 5, 8, 2, 4
    urs = (3, 2)
    wr = 3 if low_rank else None
    torch.manual_seed(16)
    rc = ref_lstm_legacy.myLSTMGroupCell(n, h, wRank=wr, uRanks=list(urs), g=g)
    x = torch.randn(b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    h1, c1 = rc(x, (h0, c0), torch.device("cpu"))

    cell = LSTMGroupCell(n, h, w_rank=wr, u_ranks=urs, groups=g)
    use = (1, 0, 3, 2)  # my (i,f,g,o) <- reference use order (f,i,o,c)
    ws = np.concatenate([t2n(rc.Ws[j]) for j in use], axis=1)
    bias = np.concatenate([t2n(rc.bias_i)[0], t2n(rc.bias_f)[0],
                           t2n(rc.bias_c)[0], t2n(rc.bias_o)[0]])
    params = {"b": bias}
    if low_rank:
        params["w_fac"] = t2n(rc.W)
        params["w_proj"] = ws
    else:
        params["w"] = ws
    for i in range(g):
        params[f"u_h_{i}"] = t2n(rc.Us[i])
        params[f"v_h_{i}"] = np.concatenate(
            [t2n(rc.Ugate[i * 4 + j]) for j in use], axis=2)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    (h1j, c1j), _ = cell.apply_step(params, jnp.asarray(t2n(x)),
                                    (jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))))
    assert_close(h1j, t2n(h1), msg="legacy group LSTM h'")
    assert_close(c1j, t2n(c1), msg="legacy group LSTM c'")


def test_legacy_gru_group2_parity(ref_gru):
    from vmlmf_tpu.cells.gru import GRUGroupCell

    n, h, g, b = 5, 8, 2, 4
    urs = (3, 2)
    torch.manual_seed(8)
    rc = ref_gru.myGRUCell_group2(n, h, wRank=None, uRanks=list(urs), g=g)
    x = torch.randn(b, n)
    h0 = torch.randn(b, h)
    h1 = rc(x, h0)

    cell = GRUGroupCell(n, h, w_rank=None, u_ranks=urs, groups=g)
    params = {
        "w": np.concatenate([t2n(rc.W1), t2n(rc.W2), t2n(rc.W3)], axis=1),
        "b": np.concatenate([t2n(rc.bias_r)[0], t2n(rc.bias_gate)[0],
                             t2n(rc.bias_update)[0]]),
        # tier 0: U [g,k,r0] with per-gate V's U1,U2,U3 [g,r0,k] -> [g,r0,3k]
        "u_h_0": t2n(rc.U),
        "v_h_0": np.concatenate([t2n(rc.U1), t2n(rc.U2), t2n(rc.U3)], axis=2),
        "u_h_1": t2n(rc.UU),
        "v_h_1": np.concatenate([t2n(rc.UU1), t2n(rc.UU2), t2n(rc.UU3)], axis=2),
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    h1j, _ = cell.apply_step(params, jnp.asarray(t2n(x)), jnp.asarray(t2n(h0)))
    assert_close(h1j, t2n(h1), msg="group GRU h'")


def test_legacy_gru_stack_forward_parity(ref_gru):
    """Multi-layer recurrence: the legacy `myGRU` wrapper (2-layer stack,
    zero-init per call, batch-first Python time loop, `compressed_gru.py:
    1083-1147`) vs the framework's `RNN` over the same transplanted cells."""
    from vmlmf_tpu.cells.gru import GRUCell
    from vmlmf_tpu.nn.recurrence import RNN

    n, h, b, t_len = 6, 8, 4, 9
    wr, ur = 3, 2
    torch.manual_seed(17)
    wrapper = ref_gru.myGRU(n, hidden_layer_sizes=[h, h], batch_first=True,
                            wRank=wr, uRank=ur)
    x = torch.randn(b, t_len, n)
    with torch.no_grad():
        ys_ref, _ = wrapper(x)

    def xplant(rc):
        return jax.tree_util.tree_map(jnp.asarray, {
            "w_fac": t2n(rc.W),
            "w_proj": np.concatenate([t2n(rc.W1), t2n(rc.W2), t2n(rc.W3)], axis=1),
            "u_fac": t2n(rc.U),
            "u_proj_rz": np.concatenate([t2n(rc.U1), t2n(rc.U2)], axis=1),
            "u_proj_n": t2n(rc.U3),
            "b": np.concatenate([t2n(rc.bias_r)[0], t2n(rc.bias_gate)[0],
                                 t2n(rc.bias_update)[0]]),
        })

    rnn = RNN((GRUCell(n, h, w_rank=wr, u_rank=ur),
               GRUCell(h, h, w_rank=wr, u_rank=ur)))
    params = [xplant(c) for c in wrapper.rnncells]
    ys, _ = rnn(params, jnp.asarray(t2n(x)))  # batch-major like the wrapper
    assert_close(ys, t2n(ys_ref), atol=5e-5, msg="GRU stack outputs")


# ---------------------------------------------------------------------------
# 6. Legacy dual-diagonal proto-VMLMF (`compressed_lstm.py:49-81`)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("low_rank", [False, True])
def test_dual_diagonal_cell_parity(ref_lstm_legacy, low_rank):
    from vmlmf_tpu.cells.legacy import DualDiagonalLSTMCell

    n, h, b = 5, 8, 4
    wr, ur = (3, 2) if low_rank else (None, None)
    torch.manual_seed(9)
    rc = ref_lstm_legacy.myDualDiagonalLSTMCell(n, h, wRank=wr, uRanks=ur)
    x = torch.randn(b, n)
    h0, c0 = torch.randn(b, h), torch.randn(b, h)
    h1, c1 = rc(x, (h0, c0), torch.device("cpu"))

    cell = DualDiagonalLSTMCell(n, h, w_rank=wr, u_rank=ur)
    # Ws/Us/biases are ParameterLists in (f,i,c,o) order -> framework (i,f,g,o)
    ws = [t2n(rc.Ws[j]) for j in P_FICO]
    us = [t2n(rc.Us[j]) for j in P_FICO]
    bias = np.concatenate([t2n(rc.biases[j])[0] for j in P_FICO])
    if low_rank:
        params = {
            "w_fac": t2n(rc.W), "w_proj": np.concatenate(ws, axis=1),
            "u_fac": t2n(rc.U), "u_proj": np.concatenate(us, axis=1),
            "b": bias,
        }
    else:
        params = {"w": np.concatenate(ws, axis=1), "u": np.concatenate(us, axis=1),
                  "b": bias}
    params = jax.tree_util.tree_map(jnp.asarray, params)
    (h1j, c1j), _ = cell.apply_step(params, jnp.asarray(t2n(x)),
                                    (jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0))))
    assert_close(h1j, t2n(h1), msg="dual-diag h'")
    assert_close(c1j, t2n(c1), msg="dual-diag c'")


# ---------------------------------------------------------------------------
# 6b. DeepConv feature stack (`compressed_deepConv.py:78-105`)
# ---------------------------------------------------------------------------

def test_deepconv_features_parity():
    """Transplant the 4 Conv2d layers into ConvFeatures and compare outputs.

    Layout notes: torch is NCHW/OIHW cross-correlation; ConvFeatures is
    NHWC/HWIO (TPU-native) — kernels transplant as permute(2,3,1,0).  The
    reference flattens channel-major (`permute(0,2,1,3)` then reshape ->
    [B, T', C*F], `compressed_deepConv.py:102-103`) while ConvFeatures
    flattens feature-major ([B, T', F*C]) — the same feature SET in a
    different order, equivalent up to an input permutation of the (learned)
    downstream projection; the comparison reorders accordingly."""
    import torch.nn as torch_nn

    from vmlmf_tpu.nn.layers import ConvFeatures

    b, t, f, c = 3, 24, 9, 64
    torch.manual_seed(13)
    convs = [torch_nn.Conv2d(1, c, (5, 1))] + [
        torch_nn.Conv2d(c, c, (5, 1)) for _ in range(3)]
    x = torch.randn(b, t, f)
    with torch.no_grad():
        y = x.unsqueeze(1)
        for conv in convs:
            y = conv(y)
        y = y.permute(0, 2, 1, 3)             # [B, T', C, F]
        ref = y.reshape(b, y.size(1), c * f)  # channel-major flatten

    cf = ConvFeatures(channels=c)  # activation=False default = reference
    params = {}
    for i, conv in enumerate(convs):
        params[f"k{i}"] = jnp.asarray(
            t2n(conv.weight).transpose(2, 3, 1, 0))  # OIHW -> HWIO
        params[f"b{i}"] = jnp.asarray(t2n(conv.bias))
    out = cf(params, jnp.asarray(t2n(x)))  # [B, T', F*C] feature-major
    tp = t - 16
    # reorder feature-major (f, c) -> channel-major (c, f)
    out_cm = np.asarray(out).reshape(b, tp, f, c).transpose(0, 1, 3, 2).reshape(
        b, tp, c * f)
    assert_close(out_cm, t2n(ref), atol=1e-4, rtol=1e-4, msg="conv features")


# ---------------------------------------------------------------------------
# 6c. torch nn.LSTM (the LM's lstm_type="pytorch", `vmlmf_lm.py:395-396`)
# ---------------------------------------------------------------------------

def test_torch_nn_lstm_parity():
    """The reference's 'pytorch' LM type is plain nn.LSTM; its gate layout
    (W_ii|W_if|W_ig|W_io) matches this framework's (i,f,g,o) directly —
    transplant W_ih/W_hh (transposed) with b = b_ih + b_hh."""
    import torch.nn as torch_nn

    from vmlmf_tpu.cells.lstm import LSTMCell
    from vmlmf_tpu.nn.recurrence import scan_layer

    n = h = 12
    t_len, b = 7, 4
    torch.manual_seed(14)
    ref = torch_nn.LSTM(n, h)  # time-major
    xs = torch.randn(t_len, b, n)
    h0, c0 = torch.randn(1, b, h), torch.randn(1, b, h)
    with torch.no_grad():
        ys_ref, (hT, cT) = ref(xs, (h0, c0))

    cell = LSTMCell(n, h)
    params = {
        "w": jnp.asarray(t2n(ref.weight_ih_l0).T),
        "u": jnp.asarray(t2n(ref.weight_hh_l0).T),
        "b": jnp.asarray(t2n(ref.bias_ih_l0) + t2n(ref.bias_hh_l0)),
    }
    prep = cell.prepare(params)
    ys, (hTj, cTj) = scan_layer(cell, prep, jnp.asarray(t2n(xs)),
                                (jnp.asarray(t2n(h0)[0]), jnp.asarray(t2n(c0)[0])))
    assert_close(ys, t2n(ys_ref), atol=5e-5, msg="nn.LSTM outputs")
    assert_close(hTj, t2n(hT)[0], atol=5e-5)
    assert_close(cTj, t2n(cT)[0], atol=5e-5)


# ---------------------------------------------------------------------------
# 7. Training trajectories — the reference's OWN train loops
# ---------------------------------------------------------------------------

def test_har_training_trajectory_parity(ref_vmlmf, ref_train):
    """Transplant a VMLMF HAR net, run the reference `train()` (`train.py:36-78`,
    torch Adam + cross-entropy) and the framework's jitted Adam train step over
    the identical batch sequence, and compare logits + params at the end."""
    from vmlmf_tpu.cells.vmlmf import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet
    from vmlmf_tpu.train.har import HARTrainer

    n, h, wr, ur, b, t, ncls = 9, 16, 4, 3, 8, 11, 18
    steps = 12  # 2 epochs x 6 batches
    torch.manual_seed(10)
    net = ref_vmlmf.Net(n, layer_sizes=[h], w_rank=wr, u_rank=[ur],
                        model=ref_vmlmf.MyLSTM, cell=ref_vmlmf.MyVMLMFCell)
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((6, b, t, n), dtype=np.float32)
    ys = rng.integers(0, ncls, size=(6, b)).astype(np.int64)
    batches = [(torch.tensor(xs[i]), torch.tensor(ys[i])) for i in range(6)]

    model = HARNet(n, (h,), cell_factory=lambda i, o: VMLMFCell(i, o, wr, ur))
    params = {
        "rnn": [jax.tree_util.tree_map(
            jnp.asarray, _vmlmf_params_from_ref(net.rnn.rnncells[0], h))],
        "head": {"w": jnp.asarray(t2n(net.lin.weight).T),
                 "b": jnp.asarray(t2n(net.lin.bias))},
    }
    trainer = HARTrainer(model, learning_rate=2e-3, batch_size=b, fuse_batches=1)
    opt_state = trainer.opt.init(params)

    args = types.SimpleNamespace(lr=2e-3, max_epochs=steps // 6,
                                 log_iteration=-1, log_epoch=-1)
    ref_train.train(net, batches, args, cuda=False, device=torch.device("cpu"))

    for _ in range(steps // 6):
        for i in range(6):
            params, opt_state, _ = trainer._train_step(params, opt_state, xs[i],
                                                       ys[i].astype(np.int32))

    # end-of-training logits on a held-out batch must agree within a drift band
    x_hold = rng.standard_normal((b, t, n), dtype=np.float32)
    net.eval()
    with torch.no_grad():
        ref_logits = t2n(net(torch.tensor(x_hold)))
    logits = np.asarray(model.apply(params, x_hold))
    assert_close(logits, ref_logits, atol=1e-3, rtol=1e-3,
                 msg="logits after 12 identical Adam steps")

    # and the trained cell parameters themselves
    trained_ref = _vmlmf_params_from_ref(net.rnn.rnncells[0], h)
    for k, v in trained_ref.items():
        assert_close(params["rnn"][0][k], v, atol=1e-3, rtol=1e-3,
                     msg=f"trained param {k}")


def test_lm_sgd_step_parity(ref_lm, ref_lm_test):
    """One manual-SGD step (nll_loss + global-norm clip + `param -= lr*grad`,
    `lm_test.py:196-209`) against the framework's jitted `_train_step`."""
    from vmlmf_tpu.cells.vmlmf import VMLMFCell
    from vmlmf_tpu.nn.models import LMModel
    from vmlmf_tpu.train.lm import LMTrainer

    vocab, h, layers, b, t, wr, ur = 50, 12, 2, 4, 6, 5, 4
    torch.manual_seed(11)
    ref_model = ref_lm.Model(vocab, h, layers, dropout=0.0, winit=0.05,
                             w_rank=wr, u_ranks=[ur], lstm_type="vmlmf")
    model = LMModel(vocab, h, layers, dropout_rate=0.0, winit=0.05,
                    cell_factory=lambda i, o: VMLMFCell(i, o, wr, ur))
    params = _lm_params_from_ref(ref_model, h, layers)
    trainer = LMTrainer(model, batch_size=b, seq_length=t, learning_rate=1.0,
                        max_grad_norm=5.0, fuse_chunks=1)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, vocab, size=(t + 1, b)).astype(np.int64)
    x_t, y_t = torch.tensor(ids[:-1]), torch.tensor(ids[1:])

    # reference: one manual SGD step (mirrors lm_test.py train() inner loop)
    states = ref_model.state_init(b)
    scores, states = ref_model(x_t, states)
    loss_ref = ref_lm_test.nll_loss(scores, y_t)
    loss_ref.backward()
    with torch.no_grad():
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 5.0)
        for p in ref_model.parameters():
            p -= 1.0 * p.grad

    # framework: one jitted train step
    st0 = trainer.state0(b)
    params2, _, loss_j, _ = trainer._train_step(
        params, st0, ids[:-1].astype(np.int32), ids[1:].astype(np.int32),
        jnp.float32(1.0), jax.random.PRNGKey(0))

    assert abs(float(loss_j) - float(loss_ref.detach())) < 1e-3
    trained_ref = _lm_params_from_ref(ref_model, h, layers)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(params2)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(trained_ref)
    for (pa, a), (pb, bv) in zip(flat_a, flat_b):
        assert_close(a, bv, atol=5e-5, rtol=5e-4,
                     msg=f"post-SGD param {jax.tree_util.keystr(pa)}")


def _lm_params_from_ref(ref_model, h, layers):
    params = {
        "embed": {"w": jnp.asarray(t2n(ref_model.embed.w))},
        "rnn": [],
        "fc": {"w": jnp.asarray(t2n(ref_model.fc.w).T),
               "b": jnp.asarray(t2n(ref_model.fc.b))},
    }
    for i in range(layers):
        ly = ref_model.rnns[i]
        params["rnn"].append(jax.tree_util.tree_map(jnp.asarray, {
            "u_x": t2n(ly.u_x),
            "u_h": t2n(ly.u_h),
            "v_x": perm_gates(t2n(ly.w_x), h, PX_IFON),
            "v_h": perm_gates(t2n(ly.w_h), h, PX_IFON),
            "b_x": perm_gates(t2n(ly.b_x), h, PX_IFON),
            "b_h": perm_gates(t2n(ly.b_h), h, PX_IFON),
            "d_x": t2n(ly.dia_x)[0],
            "d_h": t2n(ly.dia_h)[0],
        }))
    return params


@pytest.mark.slow
def test_har_trajectory_parity_protocol_scale(ref_vmlmf, ref_train):
    """Trajectory parity at the ACTUAL reference protocol scale
    (`script/demo.sh:7`): layers [180], w_rank 8, u_ranks 6, 77 inputs,
    batch 81, window 24, 18 classes — 3 epochs x 79 batches (a full OPP
    demo epoch: 6400 train windows / 81 with drop_last) of the reference's
    own Adam `train()` vs the framework's jitted step on identical
    synthetic batches — 237 identical Adam steps, enough for drift to
    accumulate if the math diverged.  Measured bands recorded in
    docs/parity.md."""
    from vmlmf_tpu.cells.vmlmf import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet
    from vmlmf_tpu.train.har import HARTrainer

    n, h, wr, ur, b, t, ncls = 77, 180, 8, 6, 81, 24, 18
    epochs, nb = 3, 79
    torch.manual_seed(30)
    net = ref_vmlmf.Net(n, layer_sizes=[h], w_rank=wr, u_rank=[ur],
                        model=ref_vmlmf.MyLSTM, cell=ref_vmlmf.MyVMLMFCell)
    rng = np.random.default_rng(30)
    xs = rng.standard_normal((nb, b, t, n), dtype=np.float32)
    ys = rng.integers(0, ncls, size=(nb, b)).astype(np.int64)
    batches = [(torch.tensor(xs[i]), torch.tensor(ys[i])) for i in range(nb)]

    model = HARNet(n, (h,), cell_factory=lambda i, o: VMLMFCell(i, o, wr, ur))
    params = {
        "rnn": [jax.tree_util.tree_map(
            jnp.asarray, _vmlmf_params_from_ref(net.rnn.rnncells[0], h))],
        "head": {"w": jnp.asarray(t2n(net.lin.weight).T),
                 "b": jnp.asarray(t2n(net.lin.bias))},
    }
    trainer = HARTrainer(model, learning_rate=2e-3, batch_size=b, fuse_batches=1)
    opt_state = trainer.opt.init(params)

    args = types.SimpleNamespace(lr=2e-3, max_epochs=epochs,
                                 log_iteration=-1, log_epoch=-1)
    ref_train.train(net, batches, args, cuda=False, device=torch.device("cpu"))
    for _ in range(epochs):
        for i in range(nb):
            params, opt_state, _ = trainer._train_step(
                params, opt_state, xs[i], ys[i].astype(np.int32))

    x_hold = rng.standard_normal((b, t, n), dtype=np.float32)
    net.eval()
    with torch.no_grad():
        ref_logits = t2n(net(torch.tensor(x_hold)))
    logits = np.asarray(model.apply(params, x_hold))
    # measured band (2026-08-20, full 79-batch epochs): see docs/parity.md;
    # dominated by torch-CPU threading nondeterminism between runs
    print(f"\n[band] HAR protocol-scale ({epochs * nb} Adam steps): "
          f"max|logit diff|={np.abs(logits - ref_logits).max():.2e}")
    assert_close(logits, ref_logits, atol=5e-3, rtol=5e-3,
                 msg=f"protocol-scale logits after {epochs * nb} Adam steps")
    # prediction agreement on the held-out batch (the metric the protocol
    # reports is argmax accuracy); measured 0.988-1.0 across runs
    agree = (logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    print(f"[band] HAR protocol-scale: held-out argmax agreement={agree}")
    assert agree >= 0.95, f"held-out argmax agreement {agree}"
    trained_ref = _vmlmf_params_from_ref(net.rnn.rnncells[0], h)
    pmax = max(float(jnp.abs(params["rnn"][0][k] - v).max())
               for k, v in trained_ref.items())
    print(f"[band] HAR protocol-scale: max|trained param diff|={pmax:.2e}")
    for k, v in trained_ref.items():
        assert_close(params["rnn"][0][k], v, atol=1e-2, rtol=1e-2,
                     msg=f"protocol-scale trained param {k}")


@pytest.mark.slow
def test_lm_trajectory_parity_protocol_scale(ref_lm, ref_lm_test):
    """Trajectory parity at the PTB flagship shape (`lm_test.py:46-79`):
    2 layers x hidden 650, w_rank = u_ranks = 300, vocab 10000, batch 20,
    BPTT 35, manual SGD lr 1.0 + clip 5.0 — TWO full epochs of the
    reference's own `train()` on a shared synthetic corpus vs
    `LMTrainer.fit`, with the LR-decay branch (`lm_test.py:194-195`)
    actually taken in epoch 2 (threshold 0); perplexities computed by each
    side's OWN function.  Measured bands recorded in docs/parity.md."""
    from vmlmf_tpu.cells.vmlmf import VMLMFCell
    from vmlmf_tpu.nn.models import LMModel
    from vmlmf_tpu.train.lm import LMTrainer

    vocab, h, layers, b, t, wr, ur = 10000, 650, 2, 20, 35, 300, 300
    n_chunks = 12
    torch.manual_seed(31)
    ref_model = ref_lm.Model(vocab, h, layers, dropout=0.0, winit=0.05,
                             w_rank=wr, u_ranks=[ur], lstm_type="vmlmf")
    model = LMModel(vocab, h, layers, dropout_rate=0.0, winit=0.05,
                    cell_factory=lambda i, o: VMLMFCell(i, o, wr, ur))
    params = _lm_params_from_ref(ref_model, h, layers)

    rng = np.random.default_rng(31)
    corpus = rng.integers(0, vocab, size=(b * (n_chunks * t + 1), 1))
    trn_ref = ref_lm_test.minibatch(corpus, b, t)
    vld_ref = ref_lm_test.minibatch(corpus[: b * (4 * t + 1)], b, t)
    assert len(trn_ref) >= n_chunks - 1  # reference drop-last semantics
    to_np = lambda chunks: [(x.numpy().astype(np.int32), y.numpy().astype(np.int32))
                            for x, y in chunks]
    trn, vld = to_np(trn_ref), to_np(vld_ref)

    epochs, thresh, lr, factor, max_norm = 2, 0, 1.0, 1.2, 5.0
    ref_lm_test.train((trn_ref, vld_ref, vld_ref), ref_model, epochs, thresh,
                      lr, factor, max_norm, b)
    ref_val_ppl = ref_lm_test.perplexity(vld_ref, ref_model, b)

    trainer = LMTrainer(model, batch_size=b, seq_length=t, learning_rate=lr,
                        factor_epoch=thresh, factor=factor,
                        max_grad_norm=max_norm, fuse_chunks=1)
    params, hist = trainer.fit(params, (trn, vld, vld), epochs=epochs,
                               log_fn=None)
    # the decay branch must actually run in epoch 2 (epoch index 1 > thresh 0)
    assert hist[1]["lr"] == pytest.approx(lr / factor), hist
    my_val_ppl = trainer.perplexity(params, vld)

    print(f"\n[band] LM flagship-scale ({epochs} epochs, decay taken): "
          f"ppl rel diff={abs(my_val_ppl - ref_val_ppl) / ref_val_ppl:.2e}")
    assert abs(my_val_ppl - ref_val_ppl) / ref_val_ppl < 1e-2, (
        f"flagship-scale val ppl diverged: ref {ref_val_ppl:.4f} "
        f"vs {my_val_ppl:.4f}")
    trained_ref = _lm_params_from_ref(ref_model, h, layers)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(trained_ref)
    pmax = max(float(jnp.abs(a - bv).max())
               for (_, a), (_, bv) in zip(flat_a, flat_b))
    print(f"[band] LM flagship-scale: max|trained param diff|={pmax:.2e}")
    for (pa, a), (pb, bv) in zip(flat_a, flat_b):
        assert_close(a, bv, atol=5e-3, rtol=5e-3,
                     msg=f"flagship-scale trained param {jax.tree_util.keystr(pa)}")


def test_lm_training_trajectory_parity(ref_lm, ref_lm_test):
    """Multi-epoch TBPTT run: the reference `train()` (`lm_test.py:173-228`,
    incl. LR decay schedule and per-epoch state reset) vs `LMTrainer.fit` on
    an identical synthetic corpus; final val/test perplexity must agree, each
    computed by its OWN framework's perplexity function."""
    from vmlmf_tpu.cells.vmlmf import VMLMFCell
    from vmlmf_tpu.nn.models import LMModel
    from vmlmf_tpu.train.lm import LMTrainer

    vocab, h, layers, b, t, wr, ur = 40, 10, 2, 4, 5, 4, 3
    torch.manual_seed(12)
    ref_model = ref_lm.Model(vocab, h, layers, dropout=0.0, winit=0.05,
                             w_rank=wr, u_ranks=[ur], lstm_type="vmlmf")
    model = LMModel(vocab, h, layers, dropout_rate=0.0, winit=0.05,
                    cell_factory=lambda i, o: VMLMFCell(i, o, wr, ur))
    params = _lm_params_from_ref(ref_model, h, layers)

    rng = np.random.default_rng(2)
    corpus = rng.integers(0, vocab, size=(b * 121, 1))
    trn_ref = ref_lm_test.minibatch(corpus, b, t)
    vld_ref = ref_lm_test.minibatch(corpus[: b * 40], b, t)
    assert len(trn_ref) >= 20
    to_np = lambda chunks: [(x.numpy().astype(np.int32), y.numpy().astype(np.int32))
                            for x, y in chunks]
    trn, vld = to_np(trn_ref), to_np(vld_ref)

    epochs, thresh, lr, factor, max_norm = 3, 0, 1.0, 1.2, 5.0
    ref_lm_test.train((trn_ref, vld_ref, vld_ref), ref_model, epochs, thresh,
                      lr, factor, max_norm, b)
    ref_val_ppl = ref_lm_test.perplexity(vld_ref, ref_model, b)

    trainer = LMTrainer(model, batch_size=b, seq_length=t, learning_rate=lr,
                        factor_epoch=thresh, factor=factor,
                        max_grad_norm=max_norm, fuse_chunks=1)
    params, history = trainer.fit(params, (trn, vld, vld), epochs=epochs,
                                  log_fn=None)
    my_val_ppl = trainer.perplexity(params, vld)

    assert abs(my_val_ppl - ref_val_ppl) / ref_val_ppl < 5e-3, (
        f"val ppl diverged: ref {ref_val_ppl:.4f} vs {my_val_ppl:.4f}")
    # trained params stay in a tight band after 3 epochs x ~24 chunks of SGD
    trained_ref = _lm_params_from_ref(ref_model, h, layers)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(trained_ref)
    for (pa, a), (pb, bv) in zip(flat_a, flat_b):
        assert_close(a, bv, atol=5e-3, rtol=5e-3,
                     msg=f"trained param {jax.tree_util.keystr(pa)}")
