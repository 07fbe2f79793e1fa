"""Host-side batching: seeded shuffling, drop-last, device feeding.

The TPU replacement for `torch.utils.data.DataLoader` usage in
`/root/reference/rnn_compression_factorization_vmlmf/src/utils/oppdataloader.py:50-70`
(train: shuffle + drop_last; test: sequential).  Batches are yielded as NumPy
arrays; jit'd train steps consume them directly (host->device transfer happens
once per batch at dispatch, and static batch shapes keep one compiled
executable alive for the whole run).
"""

from __future__ import annotations

import numpy as np


def batch_iterator(x, y, batch_size, *, shuffle, drop_last, seed=None, epoch=0):
    """Yield (x_batch, y_batch) pairs.

    With ``shuffle``, the permutation is derived deterministically from
    (seed, epoch) so runs are reproducible (the reference relies on global
    torch seeding; here determinism is explicit).
    Drop-last keeps every batch the same shape => a single XLA executable.
    """
    n = len(x)
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(None if seed is None else seed * 100003 + epoch)
        rng.shuffle(idx)
    end = (n // batch_size) * batch_size if drop_last else n
    from vmlmf_tpu.data import _native

    for s in range(0, end, batch_size):
        b = idx[s : s + batch_size]
        yield _native.gather_rows(x, b), _native.gather_rows(y, b)


def pad_last_batch(x, y, batch_size):
    """Pad the tail batch to full size and return a validity mask — the
    TPU-friendly way to evaluate the *entire* test set with static shapes
    (the reference simply runs a ragged final batch)."""
    n = len(x)
    rem = n % batch_size
    if rem == 0:
        return x, y, np.ones(n, bool)
    pad = batch_size - rem
    xp = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
    yp = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return xp, yp, mask


def prefetch_to_device(iterator, size=2, devices=None):
    """Asynchronously stage host batches onto the device ahead of compute.

    Wraps a host batch iterator so `jax.device_put` of batch k+1..k+size
    overlaps the step running on batch k (dispatches are async; the transfer
    engine runs concurrently with compute).  The TPU answer to
    `DataLoader(num_workers=...)` pipelines in the reference — useful for the
    non-fused per-batch training path; the fused paths stage whole epochs.
    """
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, devices), batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
