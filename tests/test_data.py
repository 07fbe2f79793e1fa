"""Data-pipeline tests on tiny synthetic fixtures (no downloads in CI,
mirroring SURVEY.md §4's test-plan note)."""

import numpy as np
import pytest

from vmlmf_tpu.data.batching import batch_iterator, pad_last_batch
from vmlmf_tpu.data.har import synthetic_har
from vmlmf_tpu.data.opp_preprocess import (
    EXCLUDED_COLUMNS,
    GESTURE_LABEL_MAP,
    NORM_MAX,
    NORM_MIN,
    process_file,
)
from vmlmf_tpu.data.ptb import minibatch, synthetic_corpus
from vmlmf_tpu.data.sliding_window import (
    norm_shape,
    sliding_window,
    sliding_window_nd,
    window_series,
)


class TestSlidingWindow:
    def test_window_shapes_opp_protocol(self):
        x = np.arange(100 * 77, dtype=np.float32).reshape(100, 77)
        w = sliding_window(x, 24, 12)
        # windows at offsets 0,12,24,...,72 -> 7 windows
        assert w.shape == (7, 24, 77)
        np.testing.assert_array_equal(w[1], x[12:36])

    def test_label_is_last_of_window(self):
        x = np.zeros((48, 3), np.float32)
        y = np.arange(48)
        xw, yw = window_series(x, y, 24, 12)
        np.testing.assert_array_equal(yw, [23, 35, 47])

    def test_short_input(self):
        assert sliding_window(np.zeros((10, 3)), 24, 12).shape == (0, 24, 3)

    def test_nd_matches_bruteforce_oracle(self):
        """General per-dimension ws/ss windows vs an explicit loop oracle
        (reference capability `sliding_window.py:57-110`)."""
        rng = np.random.default_rng(0)
        a = rng.normal(size=(13, 9)).astype(np.float32)
        ws, ss = (4, 3), (2, 2)
        got = sliding_window_nd(a, ws, ss, flatten=False)
        n0 = (a.shape[0] - ws[0]) // ss[0] + 1
        n1 = (a.shape[1] - ws[1]) // ss[1] + 1
        assert got.shape == (n0, n1, *ws)
        for i in range(n0):
            for j in range(n1):
                np.testing.assert_array_equal(
                    got[i, j],
                    a[i * ss[0]: i * ss[0] + ws[0], j * ss[1]: j * ss[1] + ws[1]])

    def test_nd_flatten_squeezes_and_defaults(self):
        a = np.arange(12, dtype=np.float32)
        # 1-d input, int ws, default ss=ws (non-overlapping)
        got = sliding_window_nd(a, 4)
        assert got.shape == (3, 4)
        np.testing.assert_array_equal(got[1], a[4:8])
        # full-width window over dim 1 -> flatten squeezes the singleton axis
        b = np.arange(20, dtype=np.float32).reshape(5, 4)
        got = sliding_window_nd(b, (2, 4), (1, 4))
        assert got.shape == (4, 2, 4)
        np.testing.assert_array_equal(got[2], b[2:4])
        assert norm_shape(5) == (5,)
        assert norm_shape((2, 3)) == (2, 3)

    def test_nd_validation(self):
        with pytest.raises(ValueError):
            sliding_window_nd(np.zeros((4, 4)), (5, 2))
        with pytest.raises(ValueError):
            sliding_window_nd(np.zeros((4, 4)), (2, 2), (1, 1, 1))
        with pytest.raises(TypeError):
            norm_shape("abc")


class TestOppPreprocess:
    def test_exclusion_list_matches_reference_cardinality(self):
        # 172 excluded of raw 250 -> 77 sensors + label at position 77
        assert len(EXCLUDED_COLUMNS) == 172
        assert len(set(EXCLUDED_COLUMNS)) == 172
        assert max(EXCLUDED_COLUMNS) == 248  # label column 249 survives

    def test_norm_tables(self):
        assert len(NORM_MAX) == 77 and len(NORM_MIN) == 77
        assert all(a > b for a, b in zip(NORM_MAX, NORM_MIN))

    def test_process_file_pipeline(self):
        rng = np.random.default_rng(0)
        raw = rng.normal(scale=100.0, size=(50, 250))
        raw[:, 249] = 0.0
        raw[5:10, 249] = 406516  # gesture -> class 1
        raw[3, 40] = np.nan  # row with NaN dropped
        x, y = process_file(raw)
        assert x.shape == (49, 77)
        assert (x >= 0).all() and (x <= 1.0).all()
        assert set(np.unique(y)) <= {0, 1}
        assert (y == 1).sum() == 5

    def test_113_channel_pipeline(self):
        """Legacy OPP variant (`preprocess_Opportunity.py`): 113 channels,
        locomotion/gestures label columns, no NaN-row dropping."""
        from vmlmf_tpu.data.opp_preprocess import (
            EXCLUDED_COLUMNS_113,
            NORM_MAX_113,
            NORM_MIN_113,
        )

        assert len(EXCLUDED_COLUMNS_113) == 250 - 116
        assert len(NORM_MAX_113) == 113 and len(NORM_MIN_113) == 113
        rng = np.random.default_rng(1)
        raw = rng.normal(scale=100.0, size=(40, 250))
        raw[:, 243] = 0.0
        raw[4:9, 243] = 4     # locomotion 'sit' -> class 3
        raw[:, 249] = 0.0
        raw[10:12, 249] = 406516  # gesture -> class 1
        raw[3, 40] = np.nan   # NOT dropped in the legacy pipeline
        x, y = process_file(raw.copy(), task="locomotion", channels=113)
        assert x.shape == (40, 113)
        assert (x >= 0).all() and (x <= 1.0).all()
        assert (y == 3).sum() == 5 and set(np.unique(y)) <= {0, 3}
        xg, yg = process_file(raw.copy(), task="gestures", channels=113)
        assert (yg == 1).sum() == 2 and set(np.unique(yg)) <= {0, 1}

    def test_113_tables_match_legacy_reference(self):
        """Tables and column selection cross-checked against the installed
        legacy reference module (`preprocess_Opportunity.py:59-106`)."""
        import importlib
        import importlib.util
        import sys

        from vmlmf_tpu.data.opp_preprocess import (
            EXCLUDED_COLUMNS_113,
            NORM_MAX_113,
            NORM_MIN_113,
        )

        import os

        import pytest

        path = ("/root/reference/rnn_compression_factorization/src/"
                "preprocess_Opportunity.py")
        if not os.path.exists(path):
            pytest.skip("reference checkout not present")
        # the legacy module does `from sliding_window import sliding_window`;
        # satisfy it with this framework's module (fetched via import_module —
        # the package __init__ re-export shadows the submodule attribute)
        sw = importlib.import_module("vmlmf_tpu.data.sliding_window")
        sys.modules.setdefault("sliding_window", sw)
        spec = importlib.util.spec_from_file_location("ref_prep_opp", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert list(NORM_MAX_113) == list(mod.NORM_MAX_THRESHOLDS)
        assert list(NORM_MIN_113) == list(mod.NORM_MIN_THRESHOLDS)
        raw = np.arange(3 * 250, dtype=np.float64).reshape(3, 250)
        ours = np.delete(raw, EXCLUDED_COLUMNS_113, axis=1)
        np.testing.assert_array_equal(ours, mod.select_columns_opp(raw))
        # and the full per-file pipeline output (locomotion task)
        rng = np.random.default_rng(2)
        raw = rng.normal(scale=100.0, size=(30, 250))
        raw[:, 243] = 0.0
        raw[5:8, 243] = 5  # lie -> class 4
        x_ref, y_ref = mod.process_dataset_file(raw.copy(), "locomotion")
        x, y = process_file(raw.copy(), task="locomotion", channels=113)
        np.testing.assert_allclose(x, x_ref.astype(np.float32), atol=1e-6)
        np.testing.assert_array_equal(y, y_ref.astype(np.int32))

    def test_label_map_complete(self):
        assert len(GESTURE_LABEL_MAP) == 17  # classes 1..17 (+0 null)
        assert sorted(GESTURE_LABEL_MAP.values()) == list(range(1, 18))


class TestBatching:
    def test_drop_last_and_determinism(self):
        x = np.arange(25)[:, None].astype(np.float32)
        y = np.arange(25)
        b1 = [b for b, _ in batch_iterator(x, y, 4, shuffle=True, drop_last=True, seed=1)]
        b2 = [b for b, _ in batch_iterator(x, y, 4, shuffle=True, drop_last=True, seed=1)]
        assert len(b1) == 6  # 25 // 4
        np.testing.assert_array_equal(np.stack(b1), np.stack(b2))
        b3 = [b for b, _ in batch_iterator(x, y, 4, shuffle=True, drop_last=True, seed=1, epoch=1)]
        assert not np.array_equal(np.stack(b1), np.stack(b3))

    def test_pad_last_batch_mask(self):
        x = np.zeros((10, 3), np.float32)
        y = np.arange(10)
        xp, yp, mask = pad_last_batch(x, y, 4)
        assert len(xp) == 12 and mask.sum() == 10


class TestPTB:
    def test_minibatch_layout_and_shift(self):
        ids = np.arange(200, dtype=np.int32)
        chunks = minibatch(ids, batch_size=4, seq_length=10)
        x0, y0 = chunks[0]
        assert x0.shape == (10, 4)
        np.testing.assert_array_equal(y0, x0 + 1)  # next-token targets

    def test_final_partial_chunk_dropped(self):
        ids = np.arange(200, dtype=np.int32)
        chunks = minibatch(ids, batch_size=4, seq_length=10)
        # per-stream length 50 -> 49 usable -> chunks at 0,10,20,30 full;
        # offset 40 has exactly 9 remaining -> dropped (reference behavior)
        assert len(chunks) == 4

    def test_synthetic_corpus_vocab(self):
        ids = synthetic_corpus(vocab_size=50, length=1000, seed=0)
        assert ids.min() >= 0 and ids.max() < 50


class TestSyntheticHAR:
    def test_shapes(self):
        x_tr, y_tr, x_te, y_te = synthetic_har("opp", n_train=30, n_test=10)
        assert x_tr.shape == (30, 24, 77) and y_tr.shape == (30,)
        x_tr, _, _, _ = synthetic_har("uci", n_train=8)
        assert x_tr.shape == (8, 128, 9)


class TestPrefetch:
    def test_prefetch_yields_all_batches_in_order(self):
        import numpy as np

        from vmlmf_tpu.data.batching import batch_iterator, prefetch_to_device

        x = np.arange(40, dtype=np.float32).reshape(10, 4)
        y = np.arange(10, dtype=np.int32)
        base = list(batch_iterator(x, y, 3, shuffle=False, drop_last=False))
        pre = list(prefetch_to_device(
            batch_iterator(x, y, 3, shuffle=False, drop_last=False), size=2))
        assert len(pre) == len(base)
        for (xb, yb), (xp, yp) in zip(base, pre):
            np.testing.assert_array_equal(np.asarray(xp), xb)
            np.testing.assert_array_equal(np.asarray(yp), yb)
