"""PTB language-model engine: Zaremba protocol (manual SGD, clip, decay).

Parity with
`/root/reference/rnn_compression_factorization_vmlmf/src/train_test/lm_test.py:140-228`:
  * loss — softmax NLL summed over the batch and averaged over time
    ("I multiply by batch_size as in the original paper", `lm_test.py:140-153`);
    implemented as mean(nll) * batch_size via log-softmax (numerically stable;
    the reference exponentiates raw scores),
  * optimizer — plain SGD `param -= lr * grad` with global-norm clipping at
    `max_norm` and LR decay `lr /= factor` per epoch past `factor_epoch`
    while lr > 0.001 (`lm_test.py:194-209`),
  * perplexity — `exp(mean(loss / batch_size))` over chunks with carried
    state (`lm_test.py:155-171`),
  * TBPTT — state carried across chunks within an epoch, reset per epoch;
    detaching is implicit at the jit boundary.

TPU redesign: one donated jitted step covering forward + BPTT-through-scan +
clip + SGD; the learning rate is a scalar argument so decay never recompiles.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def lm_loss(logits, y):
    """Zaremba convention: mean over (T*B) of nll, times batch size.

    Computed as logsumexp − target-logit instead of materializing
    log_softmax: at [T, B, V] scale the log_softmax output is a V-wide HBM
    tensor (179 MB at the B=128 profile) whose write, layout copies, and
    gather-transpose (XLA lowers the fancy-index backward to a full
    [T·B, V] broadcast + reshape + reduce) dominated the head's cost.
    The lse form is numerically identical (same stable max-subtraction;
    grads agree to ~1e-9) and measured **1.56x end-to-end at B=128**
    (490.9k -> 763.7k wps) and +10% at the B=20 protocol config
    (docs/latency.md has the trace that located the waste)."""
    t, b = y.shape
    lse = jax.nn.logsumexp(logits, axis=-1)                       # [T, B]
    tgt = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
    return (lse - tgt).mean() * b


def clip_by_global_norm(grads, max_norm):
    norm = optax_global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


@dataclasses.dataclass
class LMTrainer:
    model: object
    batch_size: int = 20
    seq_length: int = 35
    learning_rate: float = 1.0
    factor_epoch: int = 6
    factor: float = 1.2
    max_grad_norm: float = 5.0
    seed: int = 0
    # Fuse this many TBPTT chunks into one device dispatch (lax.scan over the
    # chunk axis with carried params+state).  Per-chunk host dispatch costs
    # ~100µs+; a whole PTB epoch is ~1300 chunks of a few MB, so fusing the
    # epoch makes the step loop device-resident.  1 = per-chunk stepping.
    fuse_chunks: int = 256
    # Optional jax.sharding.Mesh: embedding/softmax rows sharded over the
    # "model" axis, token batches over "data", recurrent towers replicated —
    # the sharding layout of `parallel.sharding.lm_param_sharding`.
    mesh: object = None
    # Optional training-loss override with signature
    #   (params, x, y, states, rng) -> (loss, new_states)
    # replacing the default full-CE `model.apply` + `lm_loss`.  Used by the
    # ranking workload for sampled-softmax training over catalogs where the
    # [T·B, N] logits block must never materialize
    # (`serve.ranker.SessionRanker.trainer(sampled_softmax=...)`).  Eval
    # (`perplexity`) stays full-CE — the truthful once-per-epoch metric.
    loss_fn: object = None

    def __post_init__(self):
        from vmlmf_tpu.parallel.spmd import kernel_spmd

        def default_loss(params, x, y, states, rng):
            logits, new_states = self.model.apply(
                params, x, states, rng=rng, train=True)
            return lm_loss(logits, y), new_states

        train_loss = self.loss_fn or default_loss

        def sgd_chunk(params, states, x, y, lr, rng):
            # kernel_spmd: route fused Pallas kernels through shard_map over
            # the data axis (parallel/spmd.py) — the vocab-sharded head stays
            # outside, partitioned by XLA from its annotations.
            with kernel_spmd(self.mesh):
                def loss_fn(p):
                    return train_loss(p, x, y, states, rng)

                (loss, new_states), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            grads, gnorm = clip_by_global_norm(grads, self.max_grad_norm)
            params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
            return params, new_states, loss, gnorm

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vmlmf_tpu.parallel.sharding import (
                lm_param_sharding,
                lm_state_sharding,
                replicated,
            )

            rep = replicated(self.mesh)
            self._shardings = dict(
                params=lambda p: lm_param_sharding(p, self.mesh),
                states=lambda s: lm_state_sharding(s, self.mesh),
                # token chunks [T, B]: batch on the data axis
                ids=NamedSharding(self.mesh, P(None, "data")),
                # fused stacks [k, T, B]
                stack_ids=NamedSharding(self.mesh, P(None, None, "data")),
                rep=rep,
            )
        else:
            self._shardings = None

        self._train_step = jax.jit(sgd_chunk, donate_argnums=(0, 1))

        @partial(jax.jit, donate_argnums=(0, 1))
        def fused_chunks(params, states, xs, ys, lr, rng):
            keys = jax.random.split(rng, xs.shape[0])

            def body(carry, inp):
                p, s = carry
                x, y, key = inp
                p, s, loss, gnorm = sgd_chunk(p, s, x, y, lr, key)
                return (p, s), (loss, gnorm)

            (params, states), (losses, gnorms) = jax.lax.scan(
                body, (params, states), (xs, ys, keys))
            return params, states, losses, gnorms

        self._fused_chunks = fused_chunks

        @jax.jit
        def eval_step(params, states, x, y):
            with kernel_spmd(self.mesh):
                logits, new_states = self.model.apply(
                    params, x, states, train=False)
                return lm_loss(logits, y), new_states

        self._eval_step = eval_step

        @jax.jit
        def eval_chunks(params, states, xs, ys):
            """No-grad eval over a [k, T, B] chunk stack in ONE dispatch
            (device-resident scan with carried state) — the serving-style
            batch-eval path; per-chunk `_eval_step` pays host dispatch each."""

            def body(s, inp):
                x, y = inp
                loss, s = eval_step(params, s, x, y)
                return s, loss

            states, losses = jax.lax.scan(body, states, (xs, ys))
            return losses, states

        self._eval_chunks = eval_chunks

    def init(self, dtype=jnp.float32):
        params = self.model.init(jax.random.PRNGKey(self.seed), dtype)
        if self._shardings is not None:
            params = jax.device_put(params, self._shardings["params"](params))
        return params

    def commit_batch(self, x, y, *, stacked=False):
        """Commit token arrays to the mesh's data axis (per-host pipeline in
        multi-process runs — `parallel.mesh.make_global_batch`).  No-op without
        a mesh.  The jitted steps then consume pre-committed inputs, so XLA
        sees the intended batch sharding instead of replicating host numpy."""
        if self._shardings is None:
            return x, y
        from vmlmf_tpu.parallel.mesh import make_global_batch

        sh = self._shardings["stack_ids" if stacked else "ids"]
        return make_global_batch(sh, x), make_global_batch(sh, y)

    def state0(self, batch=None):
        states = self.model.state0(batch or self.batch_size)
        if self._shardings is not None:
            states = jax.device_put(states, self._shardings["states"](states))
        return states

    def fit(self, params, data, *, epochs, log_every=None, log_fn=print):
        """data = (train_chunks, valid_chunks, test_chunks) from ptb.minibatch.
        -> (params, history)."""
        trn, vld, tst = data
        lr = self.learning_rate
        rng = jax.random.PRNGKey(self.seed + 1)
        history = []
        tic = time.perf_counter()
        total_words = 0
        fuse = max(1, min(self.fuse_chunks, len(trn)))
        if fuse > 1:
            xs_all = np.stack([x for x, _ in trn])
            ys_all = np.stack([y for _, y in trn])
        for epoch in range(epochs):
            states = self.state0()
            if epoch > self.factor_epoch and lr > 0.001:
                lr = lr / self.factor
            if fuse > 1:
                n_full = (len(trn) // fuse) * fuse
                for s0 in range(0, n_full, fuse):
                    rng, sub = jax.random.split(rng)
                    xb, yb = self.commit_batch(
                        xs_all[s0 : s0 + fuse], ys_all[s0 : s0 + fuse],
                        stacked=True)
                    params, states, losses, gnorms = self._fused_chunks(
                        params, states, xb, yb, jnp.float32(lr), sub)
                    total_words += xs_all[s0 : s0 + fuse].size
                    if log_every:
                        toc = time.perf_counter()
                        log_fn(
                            f"chunks {s0 + fuse}/{len(trn)}, train loss = "
                            f"{float(losses[-1]) / self.batch_size:.3f}, "
                            f"wps = {round(total_words / (toc - tic))}, lr = {lr:.3f}")
                for i in range(n_full, len(trn)):
                    rng, sub = jax.random.split(rng)
                    xb, yb = self.commit_batch(xs_all[i], ys_all[i])
                    params, states, loss, gnorm = self._train_step(
                        params, states, xb, yb, jnp.float32(lr), sub)
                    total_words += xs_all[i].size
            else:
                for i, (x, y) in enumerate(trn):
                    total_words += x.size
                    rng, sub = jax.random.split(rng)
                    xb, yb = self.commit_batch(x, y)
                    params, states, loss, gnorm = self._train_step(
                        params, states, xb, yb, jnp.float32(lr), sub
                    )
                    if log_every and i % log_every == 0:
                        toc = time.perf_counter()
                        log_fn(
                            f"batch {i}/{len(trn)}, train loss = "
                            f"{float(loss) / self.batch_size:.3f}, "
                            f"wps = {round(total_words / (toc - tic))}, "
                            f"dw.norm() = {float(gnorm):.3f}, lr = {lr:.3f}, "
                            f"since beginning = {round((toc - tic) / 60)} mins"
                        )
            val_ppl = self.perplexity(params, vld)
            history.append({"epoch": epoch, "val_ppl": val_ppl, "lr": lr})
            if log_fn:
                log_fn(f"Epoch {epoch + 1} || Validation set perplexity : {val_ppl:.3f}")
        test_ppl = self.perplexity(params, tst)
        history.append({"test_ppl": test_ppl})
        if log_fn:
            log_fn(f"Test set perplexity : {test_ppl:.3f}")
        return params, history

    def perplexity(self, params, chunks):
        """Validation/test perplexity.  Uniform-shape chunks are stacked and
        scored via `_eval_chunks` — one device-resident scan per call instead
        of per-chunk host dispatch (measured 1.36x; this is the path `fit`
        pays every epoch).  Oddly-shaped trailing chunks fall back per-chunk."""
        states = self.state0()
        losses = []
        chunks = list(chunks)
        n = 0
        if chunks:
            shape = chunks[0][0].shape
            while (n < len(chunks) and chunks[n][0].shape == shape
                   and chunks[n][1].shape == shape):
                n += 1
        if n > 1:
            xs = np.stack([x for x, _ in chunks[:n]])
            ys = np.stack([y for _, y in chunks[:n]])
            xb, yb = self.commit_batch(xs, ys, stacked=True)
            fused, states = self._eval_chunks(params, states, xb, yb)
            losses.extend(np.asarray(fused) / self.batch_size)
            chunks = chunks[n:]
        for x, y in chunks:
            xb, yb = self.commit_batch(x, y)
            loss, states = self._eval_step(params, states, xb, yb)
            losses.append(float(loss) / self.batch_size)
        return float(np.exp(np.mean(losses)))


def perplexity(model, params, chunks, batch_size):
    """Standalone perplexity (reference `lm_test.py:155-171`)."""
    step = jax.jit(lambda p, s, x, y: _ppl_step(model, p, s, x, y))
    states = model.state0(batch_size)
    losses = []
    for x, y in chunks:
        loss, states = step(params, states, x, y)
        losses.append(float(loss) / batch_size)
    return float(np.exp(np.mean(losses)))


def _ppl_step(model, params, states, x, y):
    logits, new_states = model.apply(params, x, states, train=False)
    return lm_loss(logits, y), new_states
