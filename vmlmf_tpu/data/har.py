"""HAR dataset loaders: Opportunity (preprocessed .npy) and UCI-HAR (raw text).

Parity targets:
  * OPP loader — `X_/y_{train,test}.npy` under a dataset folder
    (`/root/reference/rnn_compression_factorization_vmlmf/src/utils/oppdataloader.py:32-70`),
  * UCI loader — 9 inertial-signal text files -> [N, 128, 9], labels 1-based
    -> 0-based (`.../utils/ucidataloader.py:33-126`).  The reference hardcodes
    batch 64 and ignores its batch_size argument (a latent bug at
    `main.py:130-131`); here batch size is an honest parameter.

Both return plain NumPy arrays; batching is `vmlmf_tpu.data.batching`.
Synthetic generators with the exact real shapes are provided so tests,
benchmarks and smoke runs never need the (non-downloadable here) datasets.
"""

from __future__ import annotations

import os

import numpy as np

UCI_SIGNALS = (
    "body_acc_x_", "body_acc_y_", "body_acc_z_",
    "body_gyro_x_", "body_gyro_y_", "body_gyro_z_",
    "total_acc_x_", "total_acc_y_", "total_acc_z_",
)

OPP_NUM_FEATURES = 77
OPP_WINDOW = 24
OPP_NUM_CLASSES = 18
UCI_NUM_FEATURES = 9
UCI_WINDOW = 128
UCI_NUM_CLASSES = 6


def load_opp(folder):
    """-> (x_train [N,24,77] f32, y_train [N] i32, x_test, y_test)."""
    out = []
    for mode in ("train", "test"):
        x = np.load(os.path.join(folder, f"X_{mode}.npy")).astype(np.float32)
        y = np.load(os.path.join(folder, f"y_{mode}.npy")).astype(np.int32)
        out += [x, y]
    return tuple(out)


def _parse_signal_file(path):
    from vmlmf_tpu.data import _native

    return np.atleast_2d(_native.loadtxt(path)).astype(np.float32)


def load_uci(folder):
    """-> (x_train [N,128,9], y_train, x_test, y_test)."""
    out = []
    for mode in ("train", "test"):
        sigs = []
        for s in UCI_SIGNALS:
            path = os.path.join(folder, mode, "Inertial Signals", f"{s}{mode}.txt")
            sigs.append(_parse_signal_file(path))
        x = np.stack(sigs, axis=-1)  # [N, 128, 9]
        with open(os.path.join(folder, mode, f"y_{mode}.txt"), encoding="utf-8") as f:
            y = np.array([int(l.strip()) for l in f], np.int32) - 1  # 0-based
        out += [x.astype(np.float32), y]
    return tuple(out)


def synthetic_har(kind="opp", n_train=600, n_test=200, seed=0, channels=None,
                  num_classes=None):
    """Class-separable synthetic sensor windows with the real dataset shapes.

    Each class gets a random low-frequency prototype plus noise, so short
    training runs show real learning signal (used by smoke tests and by the
    benchmark harness when no dataset is on disk).  `channels` overrides the
    feature count (113 for the legacy OPP variant); `num_classes` the label
    space (5 for the locomotion task)."""
    if kind.lower() == "opp":
        t, f, c = OPP_WINDOW, OPP_NUM_FEATURES, OPP_NUM_CLASSES
        f = channels or f
        c = num_classes or c
    else:
        if channels is not None or num_classes is not None:
            raise ValueError(
                "channels/num_classes overrides are OPP legacy-variant knobs "
                "(113-ch / locomotion); UCI shapes are fixed at 128x9, 6 classes")
        t, f, c = UCI_WINDOW, UCI_NUM_FEATURES, UCI_NUM_CLASSES
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(c, t, f)).astype(np.float32)
    # smooth prototypes over time so the recurrence has structure to track
    k = np.ones(5, np.float32) / 5.0
    protos = np.apply_along_axis(lambda v: np.convolve(v, k, mode="same"), 1, protos)

    def make(n):
        y = rng.integers(0, c, size=n).astype(np.int32)
        x = protos[y] + 0.5 * rng.normal(size=(n, t, f)).astype(np.float32)
        return x.astype(np.float32), y

    x_tr, y_tr = make(n_train)
    x_te, y_te = make(n_test)
    return x_tr, y_tr, x_te, y_te


def load_or_synthesize(kind, folder=None, **kw):
    """Real data when the folder exists, synthetic fixture otherwise."""
    if folder and os.path.isdir(folder):
        loader = load_opp if kind.lower() == "opp" else load_uci
        try:
            return loader(folder)
        except FileNotFoundError:
            pass
    return synthetic_har(kind, **kw)
