"""Session-based next-item ranking: VMLMF session encoder over a (row-)
sharded item-embedding table with distributed top-K retrieval.

This is the BASELINE.json north-star stretch config ("multi-host: VMLMF
sequence scorer with row-sharded item-embedding table, session-based
next-item ranking").  The reference has no analog — its closest scoring path
is full-sequence perplexity over a replicated vocabulary table
(`/root/reference/rnn_compression_factorization_vmlmf/src/train_test/
lm_test.py:155-171`), which this module generalizes to a serving workload
whose table does NOT fit (or should not be replicated) on one chip.

TPU-native design:

  * **model** — a `SessionRanker` IS an item-vocabulary `LMModel` (Embed →
    VMLMF RNN stack → projection) with `tie_embeddings=True` by default, so
    ONE ``[N_items, H]`` table serves as both the input embedding and the
    scoring matrix.  Training next-item ranking therefore reuses the whole
    proven LM engine: `train.lm.LMTrainer` with item-id sequences, full
    cross-entropy via `lm_loss`, and the `parallel.sharding
    .lm_param_sharding` layout (table rows sharded on the ``model`` mesh
    axis, batches on ``data``).
  * **encode** — the session prefix ``[T, B]`` runs through the fused Pallas
    scan (one dispatch, input projections batched onto the MXU) and the
    encoder returns the final hidden state ``[B, H]`` — the session vector.
  * **sharded top-K** — scoring h·tableᵀ materializes a ``[B, N]`` score row
    that scales with the catalog; it must never be all-gathered.  Under
    `shard_map` each ``model`` shard scores only its own ``N/S`` table rows
    (a ``[B, N/S]`` block), retrieves a LOCAL top-k (`blocked_topk` exact
    by default, `approx_max_k` opt-in — see `_retrieve`), and contributes
    ``k`` (score, global-id) candidates; the global merge is a second
    ``top_k`` over the ``[B, S·k]`` candidate row — the only data crossing
    the ICI is ``S·k`` floats+ids per session, independent of N.
  * **seen-item exclusion** — session-based rec usually masks items already
    in the session; each shard scatters ``-inf`` into its local score block
    at (session-id − shard-offset) with out-of-shard drops
    (``.at[...].set(mode="drop")``) — no cross-shard traffic.
  * **sampled softmax** — opt-in training loss for catalogs where even one
    ``[T·B, N]`` logits block is too big: uniform negatives shared across
    the batch with a logQ correction; the positive + sampled columns are
    gathered from the sharded table by id (XLA lowers the gather onto the
    mesh).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vmlmf_tpu.parallel.compat import shard_map

from vmlmf_tpu.nn.models import LMModel


def _neg_inf(dtype):
    return jnp.asarray(jnp.finfo(dtype).min, dtype)


def blocked_topk(scores, k, block=2048):
    """EXACT top-k over the last axis via per-block top-k + global merge.

    The union of each block's local top-k contains the global top-k (the
    same argument that makes the cross-shard merge of `topk_sharded`
    exact), so a second top-k over the nb·k candidates reproduces
    `lax.top_k` exactly — while the TPU sorts nb narrow blocks instead of
    one [B, N] row (XLA's TopK cost grows superlinearly in row width; at
    catalog scale the blocked form is the difference between ~ms and ~tens
    of ms).  Padding uses -inf so short tails never win.  Index order for
    exactly-tied scores may differ from the unblocked sort (measure-zero
    for float scores).  -> (values [B, k], indices [B, k] int32)."""
    b, n = scores.shape
    if n <= max(2 * k, block):
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx.astype(jnp.int32)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((b, pad), _neg_inf(scores.dtype))], axis=1)
    kb = min(k, block)
    bv, bi = jax.lax.top_k(scores.reshape(b, nb, block), kb)
    gi = bi + (jnp.arange(nb, dtype=jnp.int32) * block)[None, :, None]
    vals, sel = jax.lax.top_k(bv.reshape(b, nb * kb), k)
    return vals, jnp.take_along_axis(
        gi.reshape(b, nb * kb), sel, axis=1).astype(jnp.int32)


def _sampled_ce(hs, sub_t, sub_n, b_t, b_n, targets, neg, n_items, in_batch):
    """Sampled-softmax CE from gathered table slices (the shared core of
    `sampled_softmax_loss` and the sparse-update trainer).

    hs: [M, H] hidden states; sub_t: [M, H] table rows at the targets;
    sub_n: [S, H] rows at the sampled negatives; b_t/b_n: their biases.
    -> scalar mean loss.

    The CE is assembled PIECEWISE — per-block logsumexp, then a logsumexp
    over the [M, 2-3] block-lse column — instead of concatenating
    pos|neg|in-batch into one [M, 1+S+M] logits block: log_softmax[:, 0]
    equals pos − lse_all either way (grads to ~1e-7), but the concat form
    materializes the combined block (227 MB at the bench config) through
    several HBM passes; the piecewise form lets each block's lse fuse with
    its matmul.  Measured +24% end-to-end ranker training (docs/latency.md
    round 5)."""
    num_samples = neg.shape[0]
    pos_logit = jnp.sum(hs * sub_t, axis=-1) + b_t
    neg_logit = hs @ sub_n.T + b_n                     # [M, S]
    # logQ correction: uniform q = num_samples / N per negative draw
    neg_logit = neg_logit - jnp.log(num_samples / n_items)
    # mask accidental hits (a sampled negative equal to the target)
    hit = neg[None, :] == targets[:, None]
    neg_logit = jnp.where(hit, _neg_inf(neg_logit.dtype), neg_logit)
    pieces = [pos_logit, jax.nn.logsumexp(neg_logit, axis=1)]
    if in_batch:
        ib = hs @ sub_t.T + b_t
        dup = targets[None, :] == targets[:, None]     # incl. the diagonal —
        ib = jnp.where(dup, _neg_inf(ib.dtype), ib)    # pos is its own piece
        pieces.append(jax.nn.logsumexp(ib, axis=1))
    lse_all = jax.nn.logsumexp(jnp.stack(pieces, axis=1), axis=1)
    return (lse_all - pos_logit).mean()


def _dedup_sq_norm(ids, rows):
    """Exact ||Σ_occurrences||² of a scattered gradient: sort ids, segment-
    sum duplicate rows, return the squared Frobenius norm of the summed
    rows.  Equals the squared norm of the DENSE scatter-add of ``rows`` at
    ``ids`` (cross terms between duplicate ids included) without
    materializing the [N, H] table-shaped gradient."""
    order = jnp.argsort(ids)
    sid = ids[order]
    srow = rows[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(first) - 1
    summed = jax.ops.segment_sum(srow, seg, num_segments=ids.shape[0])
    return jnp.sum(summed * summed)


def _retrieve(scores, k, method, recall_target):
    """Dispatch a retrieval method over a [B, N] score block."""
    if method == "exact":
        return blocked_topk(scores, k)
    if method == "approx":
        vals, idx = jax.lax.approx_max_k(scores, k,
                                         recall_target=recall_target)
        return vals, idx.astype(jnp.int32)
    raise ValueError(f"unknown retrieval method {method!r}; "
                     "choose 'exact' or 'approx'")


@dataclasses.dataclass(frozen=True)
class SessionRanker:
    """Next-item ranking scorer over an `LMModel` with an item vocabulary.

    ``model.vocab_size`` is the catalog size N; ``tie_embeddings=True``
    (recommended, the default of `create`) makes ``params['embed']['w']``
    the single [N, H] item table.
    """

    model: LMModel

    @classmethod
    def create(cls, num_items, hidden_size=650, num_layers=1,
               cell_factory=None, *, w_rank=None, u_rank=None,
               dropout_rate=0.0, tie_items=True, backend="pallas",
               head_bf16=False):
        """Convenience constructor: VMLMF cells at (w_rank, u_rank) unless a
        `cell_factory` is given."""
        if cell_factory is None:
            from vmlmf_tpu.cells import VMLMFCell

            w_rank = w_rank or max(8, hidden_size // 8)
            u_rank = u_rank or w_rank

            def cell_factory(n, h):
                return VMLMFCell(n, h, w_rank=w_rank, u_rank=u_rank)

        return cls(LMModel(
            vocab_size=num_items, hidden_size=hidden_size,
            num_layers=num_layers, cell_factory=cell_factory,
            dropout_rate=dropout_rate, winit=0.05, tie_embeddings=tie_items,
            backend=backend, head_bf16=head_bf16))

    # ------------------------------------------------------------- params
    @property
    def num_items(self):
        return self.model.vocab_size

    def init(self, key, dtype=jnp.float32):
        return self.model.init(key, dtype)

    def item_table(self, params):
        """[N, H] item-embedding table (the scoring matrix)."""
        if self.model.tie_embeddings:
            return params["embed"]["w"]
        return params["fc"]["w"].T

    def _head(self, params):
        """(w [H, N], b [N]) — the scoring projection, column-sharded on the
        'model' mesh axis under `lm_param_sharding` (a lazy transpose of the
        row-sharded table when tied)."""
        w = (params["embed"]["w"].T if self.model.tie_embeddings
             else params["fc"]["w"])
        return w, params["fc"]["b"]

    # ------------------------------------------------------------- encode
    def encode(self, params, ids, states=None):
        """Session prefix ids [T, B] -> (session vector h [B, H], states).

        The last layer's hidden state at the final position — the same
        reduction the HAR head applies (`vmlmf.py:355`) on the LM tower.
        No dropout: encoding is inference."""
        m = self.model
        if states is None:
            states = m.state0(ids.shape[1])
        x = m.embed(params["embed"], ids)  # [T, B, H]
        ys, states = m.rnn(params["rnn"], x, states, time_major=True)
        return ys[-1], states

    # -------------------------------------------------------------- score
    def score(self, params, h):
        """Full score row h [B, H] -> [B, N].  The single-device oracle;
        O(B·N) output — use `topk`/`topk_sharded` in serving."""
        return self.model._logits(params, h)

    def topk(self, params, h, k, *, exclude=None, method="exact",
             recall_target=0.95):
        """Single-device top-K: -> (scores [B, k], item ids [B, k] int32).
        ``exclude``: optional [T, B] session ids to mask out.

        method="exact" (default) retrieves with `blocked_topk` — identical
        results to a full sort; method="approx" uses the TPU-native
        `lax.approx_max_k` MIPS path at the given ``recall_target``
        (per-item recall in expectation) — measured another ~4-5x
        end-to-end over exact at catalog scale (BASELINE.md), the standard
        trade for production retrieval."""
        if k > self.num_items:
            raise ValueError(
                f"k={k} exceeds the catalog size {self.num_items}")
        scores = self.score(params, h)
        if exclude is not None:
            scores = self._mask_seen(scores, exclude, offset=0)
        return _retrieve(scores, k, method, recall_target)

    @staticmethod
    def _mask_seen(scores, seen, offset):
        """Scatter -inf into scores [B, Nloc] at (seen − offset); ids outside
        [0, Nloc) belong to other shards and are dropped.  NOTE negative
        indices would WRAP (JAX indexing semantics), so below-shard ids are
        first pushed past Nloc where mode="drop" discards them."""
        b, nloc = scores.shape
        local = seen.T - offset                       # [B, T]
        local = jnp.where(local < 0, nloc, local)     # below-shard -> dropped
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], local.shape)
        return scores.at[rows, local].set(_neg_inf(scores.dtype),
                                          mode="drop")

    def topk_sharded(self, params, h, k, mesh, *, exclude=None,
                     data_sharded=True, method="exact", recall_target=0.95):
        """Distributed top-K over the row-sharded item table.

        h: [B, H] session vectors (batch sharded on 'data' when
        ``data_sharded``); the table/head is column-sharded on 'model'
        (`lm_param_sharding`).  Each model shard scores its N/S rows and
        contributes its local top-k; the global merge re-top-ks the
        [B, S·k] candidates — per-session ICI traffic is S·k (score, id)
        pairs, independent of N.  ``method``/``recall_target`` select the
        per-shard retrieval (see `topk`; the merge itself is always exact,
        so "approx" recall is bounded below by the per-shard recall).
        -> (scores [B, k], ids [B, k] int32).
        """
        w, bias = self._head(params)
        n = self.num_items
        shards = mesh.shape["model"]
        if n % shards != 0:
            raise ValueError(
                f"num_items={n} not divisible by model-axis size {shards}")
        if k > n // shards:
            raise ValueError(
                f"k={k} exceeds the per-shard row count {n // shards}; "
                f"lower k or the model-axis size")
        bspec = P("data", None) if data_sharded else P(None, None)
        espec = (P(None, "data") if data_sharded else P(None, None))

        args = (h, w, bias)
        specs = [bspec, P(None, "model"), P("model")]
        if exclude is not None:
            args += (exclude,)
            specs.append(espec)

        out = P("data", "model") if data_sharded else P(None, "model")

        @functools.partial(shard_map, mesh=mesh, in_specs=tuple(specs),
                           out_specs=(out, out))
        def local_topk(h, w, bias, *rest):
            scores = h @ w + bias                     # [Bloc, N/S]
            off = jax.lax.axis_index("model") * scores.shape[1]
            if rest:
                scores = self._mask_seen(scores, rest[0], offset=off)
            vals, ids = _retrieve(scores, k, method, recall_target)
            return vals, (ids + off).astype(jnp.int32)

        vals, ids = local_topk(*args)                 # [B, S·k] candidates
        top, sel = jax.lax.top_k(vals, k)             # global merge
        return top, jnp.take_along_axis(ids, sel, axis=1)

    # ------------------------------------------------------------ serving
    def rank_next(self, params, session_ids, k, *, mesh=None,
                  exclude_seen=False, method="exact", recall_target=0.95):
        """End-to-end: encode the session prefix [T, B], return the top-K
        next items.  -> (scores [B, k], item ids [B, k]).

        Under a mesh the encoder runs inside `kernel_spmd` so a
        pallas-backend model's fused scan shard_maps over the data axis
        (`parallel/spmd.py`) instead of replicating the batch."""
        from vmlmf_tpu.parallel.spmd import kernel_spmd

        with kernel_spmd(mesh):
            h, _ = self.encode(params, session_ids)
        exclude = session_ids if exclude_seen else None
        if mesh is not None and mesh.shape["model"] > 1:
            return self.topk_sharded(params, h, k, mesh, exclude=exclude,
                                     method=method,
                                     recall_target=recall_target)
        return self.topk(params, h, k, exclude=exclude, method=method,
                         recall_target=recall_target)

    # --------------------------------------------------------- evaluation
    def eval_metrics(self, params, sessions, targets, *, ks=(1, 5, 10, 20),
                     mesh=None, exclude_seen=False, method="exact",
                     recall_target=0.95):
        """Next-item retrieval metrics over the full catalog.

        sessions: [T, B] item-id prefixes; targets: [B] the true next item.
        -> dict with ``recall@k`` (hit rate of the target in the top-k) for
        each k in ``ks`` and ``mrr`` (mean reciprocal rank, truncated at
        max(ks)) — the standard session-based-recommendation protocol.
        Retrieval runs through the same single-device or sharded top-K path
        serving uses, so the metric measures the deployed system."""
        import numpy as np

        kmax = max(ks)
        _, top = self.rank_next(params, sessions, kmax, mesh=mesh,
                                exclude_seen=exclude_seen, method=method,
                                recall_target=recall_target)
        top = np.asarray(top)                       # [B, kmax]
        tgt = np.asarray(targets).reshape(-1, 1)    # [B, 1]
        hit = top == tgt                            # [B, kmax]
        # rank of the target within the top-kmax (kmax if absent)
        rank = np.where(hit.any(axis=1), hit.argmax(axis=1), kmax)
        out = {f"recall@{k}": float((rank < k).mean()) for k in ks}
        out["mrr"] = float(np.where(rank < kmax, 1.0 / (rank + 1), 0.0).mean())
        return out

    # ----------------------------------------------------------- training
    def loss(self, params, ids, targets, states, *, rng=None, train=True):
        """Full-CE next-item loss (the LM objective on item sequences):
        reuses `model.apply` + `lm_loss` so the trained scorer is exactly
        what `LMTrainer` optimizes.  -> (loss, new_states)."""
        from vmlmf_tpu.train.lm import lm_loss

        logits, new_states = self.model.apply(params, ids, states,
                                              rng=rng, train=train)
        return lm_loss(logits, targets), new_states

    def sampled_softmax_loss(self, params, hs, targets, key, num_samples,
                             *, in_batch=False):
        """Sampled-softmax CE for catalogs too large for full [T·B, N]
        logits: uniform negatives shared across the batch, logQ-corrected
        (each negative's logit gets −log(S/N) so the sampled softmax is an
        unbiased estimator of the full one in expectation).

        hs: [M, H] hidden states (e.g. flattened [T·B, H]); targets: [M]
        item ids; num_samples: static negative count.  -> scalar mean loss.

        ``in_batch=True`` additionally uses the batch's OWN target columns
        as negatives (the two-tower-recommender standard): uniform negatives
        from a huge catalog almost never hit the actively-traded items, so
        their contrastive signal is weak; in-batch columns contrast
        co-occurring items directly.  Duplicate targets are masked so an
        item never serves as its own negative.  In-batch columns get no
        logQ correction (their sampling law is the data distribution;
        production systems estimate item frequencies — the uniform
        correction would be wrong, and the uncorrected form is the standard
        popularity-biased trade).
        """
        w, bias = self._head(params)                  # [H, N], [N]
        n = self.num_items
        neg = jax.random.randint(key, (num_samples,), 0, n)
        # gathered table slices: rows of the (transposed) head == table rows
        return _sampled_ce(hs, w[:, targets].T, w[:, neg].T, bias[targets],
                           bias[neg], targets, neg, n, in_batch)

    def sampled_loss(self, params, ids, targets, states, rng, num_samples,
                     *, in_batch=False):
        """Sampled-softmax next-item loss over a [T, B] chunk — the scalable
        counterpart of `loss` for catalogs where the full [T·B, N] logits
        block must never materialize.

        Runs the encoder via `model.apply_hidden` (no head), flattens the
        hidden sequence to [T·B, H], and applies `sampled_softmax_loss` with
        fresh uniform negatives per chunk.  Scaled ×batch to match the
        Zaremba `lm_loss` convention, so LMTrainer hyperparameters (lr,
        clip) transfer between the objectives.  -> (loss, new_states)."""
        kd, kn = jax.random.split(rng)
        hs, new_states = self.model.apply_hidden(params, ids, states,
                                                 rng=kd, train=True)
        t, b = targets.shape
        loss = self.sampled_softmax_loss(
            params, hs.reshape(t * b, -1), targets.reshape(-1), kn,
            num_samples, in_batch=in_batch)
        return loss * b, new_states

    def sparse_trainer(self, *, batch_size=20, seq_length=35,
                       sampled_softmax=8192, in_batch_negatives=True,
                       learning_rate=1.0, max_grad_norm=5.0, seed=0,
                       fuse_chunks=8):
        """A `SparseSampledTrainer`: sampled-softmax SGD where the item
        table is updated ONLY at the rows a chunk touches.

        The dense path materializes a table-shaped [N, H] gradient (zeros +
        scatter), computes the clip norm over it, and rewrites the whole
        table for `p − lr·g` — at 100k items that is ~40% of the training
        chunk's device time to modify ~17k rows (trace: docs/latency.md).
        This trainer takes gradients with respect to the GATHERED rows,
        computes the exact global clip norm with a duplicate-merging
        segment sum, and scatter-adds the update — semantics identical to
        dense SGD+clip (untouched rows have zero gradient), measured
        ~bit-equal and substantially faster.  Requires ``tie_items=True``
        (one table) and plain SGD (sparse updates compose with stateless
        SGD, not with per-row optimizer state)."""
        if not self.model.tie_embeddings:
            raise ValueError(
                "sparse_trainer requires tie_items=True (a single item "
                "table); the untied head would need its own sparse path")
        return SparseSampledTrainer(
            self, batch_size=batch_size, seq_length=seq_length,
            num_samples=sampled_softmax, in_batch=in_batch_negatives,
            learning_rate=learning_rate, max_grad_norm=max_grad_norm,
            seed=seed, fuse_chunks=fuse_chunks)

    def trainer(self, *, batch_size=20, seq_length=35, mesh=None,
                sampled_softmax=None, in_batch_negatives=False, **kw):
        """An `LMTrainer` over this ranker's model (manual SGD + clip —
        `train.lm`); pass ``mesh`` to train with the row-sharded table
        layout.

        ``sampled_softmax=<num_negatives>`` switches the TRAINING objective
        from full CE to `sampled_loss` (per-chunk uniform negatives with the
        logQ correction) — the per-step head cost drops from O(T·B·N) to
        O(T·B·S), which at catalog scale is the difference between training
        being possible and not.  Eval/perplexity stays full-CE."""
        from vmlmf_tpu.train.lm import LMTrainer

        if sampled_softmax is not None:
            kw["loss_fn"] = (
                lambda p, x, y, states, rng:
                self.sampled_loss(p, x, y, states, rng, sampled_softmax,
                                  in_batch=in_batch_negatives))
        return LMTrainer(self.model, batch_size=batch_size,
                         seq_length=seq_length, mesh=mesh, **kw)


@dataclasses.dataclass
class SparseSampledTrainer:
    """Sampled-softmax ranking trainer with sparse (gathered-row) table
    updates — see `SessionRanker.sparse_trainer` for the rationale.

    API mirrors the `LMTrainer` training surface (`init`, `state0`,
    `_train_step`, `_fused_chunks`); evaluation goes through the ranker's
    own `eval_metrics`/`rank_next` (full-CE perplexity over a 100k+ catalog
    is the exact thing this trainer avoids computing).

    Step semantics are IDENTICAL to the dense path
    (`trainer(sampled_softmax=..., ...)` with the same seeds): the global
    clip norm is computed exactly (duplicate ids merged via segment sum —
    `_dedup_sq_norm`), and untouched table rows are unchanged either way
    because their dense gradient is zero.  `tests/test_ranker.py::
    TestSparseSampledTrainer` asserts multi-step parameter equality.

    Composes with a ROW-SHARDED table out of the box: with params laid out
    by `lm_param_sharding`, XLA partitions the row gathers, segment sums,
    and the scatter-add update, and the table keeps its P('model', None)
    sharding through the step (pinned by
    `test_sparse_step_on_row_sharded_table`).
    """

    ranker: SessionRanker
    batch_size: int = 20
    seq_length: int = 35
    num_samples: int = 8192
    in_batch: bool = True
    learning_rate: float = 1.0
    max_grad_norm: float = 5.0
    seed: int = 0
    fuse_chunks: int = 8

    def __post_init__(self):
        model = self.ranker.model
        n = self.ranker.num_items
        s_neg = self.num_samples

        def sgd_chunk(params, states, x, y, lr, rng):
            table = params["embed"]["w"]              # [N, H]
            bias = params["fc"]["b"]                  # [N]
            kd, kn = jax.random.split(rng)
            neg = jax.random.randint(kn, (s_neg,), 0, n)
            x_ids = x.reshape(-1)                     # [T*B]
            tgt = y.reshape(-1)                       # [T*B]
            sub_x = table[x]                          # [T, B, H]
            sub_t = table[tgt]                        # [M, H]
            sub_n = table[neg]                        # [S, H]
            b_t, b_n = bias[tgt], bias[neg]

            def loss_fn(sub_x, sub_t, sub_n, b_t, b_n, rnn_params):
                hs, new_states = model.hidden_from_embedded(
                    {"rnn": rnn_params}, sub_x, states, rng=kd, train=True)
                m = hs.shape[0] * hs.shape[1]
                loss = _sampled_ce(hs.reshape(m, -1), sub_t, sub_n, b_t,
                                   b_n, tgt, neg, n, self.in_batch)
                # Zaremba loss scale (x batch), as the dense trainer
                return loss * y.shape[1], new_states

            (loss, new_states), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True)(
                sub_x, sub_t, sub_n, b_t, b_n, params["rnn"])
            d_sub_x, d_sub_t, d_sub_n, d_b_t, d_b_n, d_rnn = grads

            # exact global clip norm: table/bias contributions via the
            # duplicate-merging segment sum (== the dense grad's norm)
            m = d_sub_x.shape[0] * d_sub_x.shape[1]
            table_ids = jnp.concatenate([x_ids, tgt, neg])
            table_rows = jnp.concatenate(
                [d_sub_x.reshape(m, -1), d_sub_t, d_sub_n])
            bias_ids = jnp.concatenate([tgt, neg])
            bias_vals = jnp.concatenate([d_b_t, d_b_n])
            sq = (_dedup_sq_norm(table_ids, table_rows)
                  + _dedup_sq_norm(bias_ids, bias_vals[:, None])
                  + sum(jnp.sum(jnp.square(g))
                        for g in jax.tree_util.tree_leaves(d_rnn)))
            gnorm = jnp.sqrt(sq)
            step = lr * jnp.minimum(1.0, self.max_grad_norm / (gnorm + 1e-6))

            table = table.at[table_ids].add(-step * table_rows)
            bias = bias.at[bias_ids].add(-step * bias_vals)
            rnn = jax.tree_util.tree_map(
                lambda p, g: p - step * g, params["rnn"], d_rnn)
            params = {"embed": {"w": table}, "rnn": rnn, "fc": {"b": bias}}
            return params, new_states, loss, gnorm

        self._train_step = jax.jit(sgd_chunk, donate_argnums=(0, 1))

        from functools import partial

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

    def init(self, dtype=jnp.float32):
        return self.ranker.init(jax.random.PRNGKey(self.seed), dtype)

    def state0(self, batch=None):
        return self.ranker.model.state0(batch or self.batch_size)
