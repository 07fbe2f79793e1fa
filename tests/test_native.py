"""Native C++ data-runtime parity vs the NumPy reference implementations.

Every kernel in native/vmlmf_native.cpp must produce bit-identical (or
fp-tolerance) results to the pure-NumPy fallbacks in vmlmf_tpu.data._native /
opp_preprocess.  Skipped when no compiler is available (lib builds on demand).
"""

import io

import numpy as np
import pytest

from vmlmf_tpu.data import _native

pytestmark = pytest.mark.skipif(_native.get_lib() is None,
                                reason="native library unavailable")

RNG = np.random.default_rng(0)


class TestLoadtxt:
    def test_matrix_parity(self):
        m = RNG.normal(size=(50, 7)) * np.power(10.0, RNG.integers(-8, 8, (50, 7)))
        m[RNG.random((50, 7)) < 0.1] = np.nan
        txt = "\n".join(" ".join(f"{v:.10g}" for v in row) for row in m).encode()
        ours = _native.loadtxt(txt)
        ref = np.loadtxt(io.BytesIO(txt))
        np.testing.assert_allclose(ours, ref, rtol=1e-14, equal_nan=True)

    def test_formats(self):
        txt = b"1 2.5 -3e2\n+4.25E-3 NaN inf\n-inf 0 007\n"
        ref = np.loadtxt(io.BytesIO(txt))
        np.testing.assert_allclose(_native.loadtxt(txt), ref, equal_nan=True)

    def test_blank_lines_and_crlf(self):
        txt = b"1 2\r\n\r\n3 4\n\n5 6\n"
        np.testing.assert_allclose(_native.loadtxt(txt), [[1, 2], [3, 4], [5, 6]])

    def test_single_row_stays_2d_ambiguity(self):
        # one row -> 1-D (np.loadtxt squeezes); we mirror that
        assert _native.loadtxt(b"1 2 3\n").shape == np.loadtxt(io.BytesIO(b"1 2 3\n")).shape


class TestSlidingWindow:
    @pytest.mark.parametrize("n,f,w,s", [(100, 77, 24, 12), (24, 3, 24, 12),
                                         (23, 3, 24, 12), (128, 9, 128, 64)])
    def test_parity(self, n, f, w, s):
        x = RNG.normal(size=(n, f)).astype(np.float32)
        from vmlmf_tpu.data.sliding_window import sliding_window
        np.testing.assert_array_equal(_native.sliding_window_f32(x, w, s),
                                      sliding_window(x, w, s))


class TestInterpNan:
    def test_parity(self):
        from vmlmf_tpu.data.opp_preprocess import interpolate_nan
        x = RNG.normal(size=(200, 11)).astype(np.float32)
        x[RNG.random(x.shape) < 0.3] = np.nan
        x[:5, 0] = np.nan          # leading
        x[-5:, 1] = np.nan         # trailing
        x[:, 2] = np.nan           # all-NaN channel
        np.testing.assert_allclose(_native.interp_nan_f32(x), interpolate_nan(x),
                                   rtol=1e-5, atol=1e-6)

    def test_no_nan_identity(self):
        x = RNG.normal(size=(50, 4)).astype(np.float32)
        np.testing.assert_array_equal(_native.interp_nan_f32(x), x)


class TestGatherNorm:
    def test_gather_f32(self):
        src = RNG.normal(size=(100, 24, 77)).astype(np.float32)
        idx = RNG.permutation(100)[:81]
        np.testing.assert_array_equal(_native.gather_rows(src, idx), src[idx])

    def test_gather_i32(self):
        src = RNG.integers(0, 18, (100,)).astype(np.int32).reshape(100, 1)
        idx = RNG.permutation(100)[:33]
        np.testing.assert_array_equal(_native.gather_rows(src, idx), src[idx])

    def test_norm_clamp(self):
        from vmlmf_tpu.data.opp_preprocess import NORM_MAX, NORM_MIN, normalize
        x = (RNG.normal(size=(64, 77)) * 4000).astype(np.float32)
        np.testing.assert_allclose(
            _native.norm_clamp_f32(x, np.asarray(NORM_MIN, np.float32),
                                   np.asarray(NORM_MAX, np.float32)),
            normalize(x), rtol=1e-6, atol=1e-7)


def test_gather_rows_accepts_jax_arrays():
    """Trainers may hand jax arrays to the batch iterator; the native gather
    must fall back to fancy indexing rather than assume numpy."""
    import jax.numpy as jnp

    src = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    idx = np.array([3, 1])
    out = _native.gather_rows(src, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[idx])
