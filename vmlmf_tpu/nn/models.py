"""Task networks: HAR classifiers (uni/bi-directional, conv-front) and the LM.

Parity targets:
  * `Net`   — RNN stack + Linear(h -> 18), last timestep
    (`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:319-355`)
  * `BDNet` — forward + time-reversed towers, concat/sum/avg merge
    (`/root/reference/rnn_compression_factorization/src/OPP_test.py:116-158`)
  * `DeepConvLSTM` — 4-conv feature stack feeding the RNN
    (`/root/reference/rnn_compression_factorization/src/module/compressed_deepConv.py:25-74`)
  * LM `Model` — Embed -> dropout -> (RNN -> dropout)×N -> Linear(h -> vocab),
    carried TBPTT state (`vmlmf_lm.py:363-441`); optional weight tying (the
    reference is untied — `Embed.w` and `Linear.w` are separate params).

All models are frozen dataclasses with ``init(key) -> params`` and a pure
``apply(params, ...)``; dropout requires an explicit PRNG key (train mode).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import reinit_uniform
from vmlmf_tpu.nn.layers import ConvFeatures, Dense, Embed, dropout
from vmlmf_tpu.nn.recurrence import RNN, scan_layer


def _make_cells(cell_factory, input_size, layer_sizes):
    cells, in_size = [], input_size
    for h in layer_sizes:
        cells.append(cell_factory(in_size, h))
        in_size = h
    return tuple(cells)


@dataclasses.dataclass(frozen=True)
class HARNet:
    """RNN stack + linear classifier on the last timestep."""

    input_size: int
    layer_sizes: tuple
    cell_factory: dataclasses.InitVar = None
    num_classes: int = 18
    unroll: int = 8
    backend: str = "xla"

    def __post_init__(self, cell_factory):
        cells = _make_cells(cell_factory, self.input_size, self.layer_sizes)
        object.__setattr__(self, "rnn", RNN(cells, unroll=self.unroll, backend=self.backend))
        object.__setattr__(
            self, "head", Dense(self.layer_sizes[-1], self.num_classes, bias_fill=0.1)
        )

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {"rnn": self.rnn.init(k1, dtype), "head": self.head.init(k2, dtype)}

    def apply(self, params, x):
        """x: [B, T, F] -> logits [B, num_classes]."""
        ys, _ = self.rnn(params["rnn"], x)
        return self.head(params["head"], ys[:, -1])


@dataclasses.dataclass(frozen=True)
class BDNet:
    """Bidirectional: independent forward and time-reversed towers.

    The reference feeds `flip(x)` to the reverse tower and reads `r_y[:, 0]`
    (`OPP_test.py:150-153`) — i.e. the reverse tower's output at original
    time 0 after consuming the sequence backwards.  Here the reverse tower
    runs the same scan with ``reverse=True`` (no data movement) and reads its
    output at index 0, which is identical.
    """

    input_size: int
    layer_sizes: tuple
    cell_factory: dataclasses.InitVar = None
    num_classes: int = 18
    merge: str = "concat"  # concat | sum | avg
    unroll: int = 8
    backend: str = "xla"

    def __post_init__(self, cell_factory):
        cells_f = _make_cells(cell_factory, self.input_size, self.layer_sizes)
        cells_r = _make_cells(cell_factory, self.input_size, self.layer_sizes)
        object.__setattr__(self, "rnn_f", RNN(cells_f, unroll=self.unroll, backend=self.backend))
        object.__setattr__(self, "rnn_r", RNN(cells_r, unroll=self.unroll, backend=self.backend))
        head_in = self.layer_sizes[-1] * (2 if self.merge == "concat" else 1)
        object.__setattr__(self, "head", Dense(head_in, self.num_classes, bias_fill=0.1))

    def init(self, key, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "fwd": self.rnn_f.init(k1, dtype),
            "rev": self.rnn_r.init(k2, dtype),
            "head": self.head.init(k3, dtype),
        }

    def apply(self, params, x):
        y_f, _ = self.rnn_f(params["fwd"], x)
        y_r, _ = self.rnn_r(params["rev"], x, reverse=True)
        last_f, first_r = y_f[:, -1], y_r[:, 0]
        if self.merge == "concat":
            merged = jnp.concatenate([last_f, first_r], -1)
        elif self.merge == "sum":
            merged = last_f + first_r
        elif self.merge == "avg":
            merged = 0.5 * (last_f + first_r)
        else:
            raise ValueError(f"unknown merge {self.merge!r}")
        return self.head(params["head"], merged)


@dataclasses.dataclass(frozen=True)
class DeepConvNet:
    """Conv feature stack -> RNN -> classifier (DeepConvLSTM workload)."""

    input_size: int
    layer_sizes: tuple = (128, 128)
    cell_factory: dataclasses.InitVar = None
    num_classes: int = 18
    channels: int = 64
    unroll: int = 8
    backend: str = "xla"
    # reference parity: no nonlinearity between convs (`compressed_deepConv.py:48-51`)
    conv_activation: bool = False

    def __post_init__(self, cell_factory):
        conv = ConvFeatures(channels=self.channels, activation=self.conv_activation)
        object.__setattr__(self, "conv", conv)
        feat = self.channels * self.input_size
        cells = _make_cells(cell_factory, feat, self.layer_sizes)
        object.__setattr__(self, "rnn", RNN(cells, unroll=self.unroll, backend=self.backend))
        object.__setattr__(
            self, "head", Dense(self.layer_sizes[-1], self.num_classes, bias_fill=0.1)
        )

    def init(self, key, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "conv": self.conv.init(k1, dtype),
            "rnn": self.rnn.init(k2, dtype),
            "head": self.head.init(k3, dtype),
        }

    def apply(self, params, x):
        min_t = self.conv.layers * (self.conv.kernel_t - 1) + 1
        if x.shape[1] < min_t:
            raise ValueError(
                f"DeepConvNet needs at least {min_t} timesteps "
                f"({self.conv.layers} valid convs of {self.conv.kernel_t}); got {x.shape[1]}"
            )
        feats = self.conv(params["conv"], x)  # [B, T-16, C*F]
        ys, _ = self.rnn(params["rnn"], feats)
        return self.head(params["head"], ys[:, -1])


@dataclasses.dataclass(frozen=True)
class LMModel:
    """Word-level LM: Embed -> dropout -> (RNN layer -> dropout)×N -> Linear.

    Sequences are time-major ``[T, B]`` (the Zaremba layout, `lm_test.py:119`).
    State is carried explicitly across TBPTT chunks; "detach" is implicit —
    states returned from one jitted step and fed into the next are leaves,
    not traced graph (`vmlmf_lm.py:426-431` has no JAX analog needed).
    """

    vocab_size: int
    hidden_size: int = 650
    num_layers: int = 2
    cell_factory: dataclasses.InitVar = None
    dropout_rate: float = 0.5
    winit: float = 0.05
    tie_embeddings: bool = False
    backend: str = "xla"
    # bf16 inputs to the [T*B, h] @ [h, V] softmax projection with f32
    # accumulation (params stay f32; logits/loss stay f32).  The head matmul
    # is the FLOPs king of the LM step at large batch — opt-in mixed
    # precision for throughput-oriented training/serving.
    head_bf16: bool = False

    def __post_init__(self, cell_factory):
        object.__setattr__(self, "embed", Embed(self.vocab_size, self.hidden_size))
        cells = tuple(
            cell_factory(self.hidden_size, self.hidden_size) for _ in range(self.num_layers)
        )
        object.__setattr__(self, "rnn", RNN(cells, backend=self.backend))
        object.__setattr__(self, "fc", Dense(self.hidden_size, self.vocab_size))

    def init(self, key, dtype=jnp.float32):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "embed": self.embed.init(k1, dtype),
            "rnn": self.rnn.init(k2, dtype),
            "fc": self.fc.init(k3, dtype),
        }
        # whole-model uniform(-winit, winit) reset, incl. biases (`vmlmf_lm.py:407-410`)
        params = reinit_uniform(params, k4, self.winit)
        if self.tie_embeddings:
            # the projection weight IS the embedding table: don't materialize
            # a dead [H, V] copy — `_logits` derives it, grads flow to embed.w
            del params["fc"]["w"]
        return params

    def state0(self, batch, dtype=jnp.float32):
        return self.rnn.state0(batch, dtype)

    def _logits(self, params, x):
        w = params["embed"]["w"].T if self.tie_embeddings else params["fc"]["w"]
        if self.head_bf16:
            y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            y = x @ w
        return y + params["fc"]["b"]

    def apply(self, params, ids, states, *, rng=None, train=False):
        """ids: [T, B] int32 -> (logits [T, B, V], new_states)."""
        x, new_states = self.apply_hidden(params, ids, states, rng=rng,
                                          train=train)
        return self._logits(params, x), new_states

    def apply_hidden(self, params, ids, states, *, rng=None, train=False):
        """`apply` minus the head: -> (hidden sequence [T, B, H], new_states).

        The entry point for heads that must not materialize the [T·B, V]
        logits block — e.g. sampled-softmax training over huge item catalogs
        (`serve.ranker.SessionRanker.sampled_loss`)."""
        x = self.embed(params["embed"], ids)  # [T, B, H]
        return self.hidden_from_embedded(params, x, states, rng=rng,
                                         train=train)

    def hidden_from_embedded(self, params, x, states, *, rng=None,
                             train=False):
        """`apply_hidden` starting from a pre-embedded ``x [T, B, H]``.

        Lets callers own the table lookup — e.g. the sparse-update ranking
        trainer gathers the touched table rows itself so gradients flow to
        the gathered slices instead of a dense [N, H] scatter
        (`serve.ranker`)."""
        det = not train
        n_drops = 1 + self.num_layers
        keys = jax.random.split(rng, n_drops) if rng is not None else [None] * n_drops
        x = dropout(keys[0], x, self.dropout_rate, det or keys[0] is None)
        if self.backend == "pallas_pipelined":
            from vmlmf_tpu.nn.recurrence import _use_interpret
            from vmlmf_tpu.ops.pallas_pipeline import run_stack_grouped

            preps = [c.prepare(p) for c, p in zip(self.rnn.cells, params["rnn"])]
            # inter-layer dropout as pre-generated scaled masks (fresh mask
            # per timestep — the sequential `Model.forward` semantics,
            # `vmlmf_lm.py:433-441`); within-group interfaces run inside the
            # wavefront kernel, group boundaries apply to the handoff
            masks = None
            L = self.num_layers
            if not det and keys[1] is not None and self.dropout_rate > 0 and L > 1:
                keep = 1.0 - self.dropout_rate
                mkeys = jax.random.split(keys[1], L - 1)
                masks = [
                    jax.random.bernoulli(
                        mkeys[i], keep, x.shape).astype(x.dtype) / keep
                    for i in range(L - 1)
                ]
            prec = os.environ.get("VMLMF_PALLAS_PRECISION", "f32")
            ys, new_states = run_stack_grouped(
                self.rnn.cells, preps, x, states, masks,
                interpret=_use_interpret(), precision=prec)
            kl = keys[-1]
            ys = dropout(kl, ys, self.dropout_rate, det or kl is None)
            return ys, new_states
        if self.backend == "pipelined":
            from vmlmf_tpu.ops.pipeline import (
                pipelined_available,
                pipelined_lstm_scan,
                warn_fallback,
            )

            preps = [c.prepare(p) for c, p in zip(self.rnn.cells, params["rnn"])]
            if not pipelined_available(self.rnn.cells, preps):
                warn_fallback(self.rnn.cells)
            if pipelined_available(self.rnn.cells, preps):
                # inter-layer dropout (fresh mask per timestep) runs inside
                # the wavefront scan; the last layer's output dropout below.
                drop_rng = None if (det or rng is None) else keys[1]
                x, new_states = pipelined_lstm_scan(
                    self.rnn.cells, preps, x, states,
                    dropout_rate=self.dropout_rate, rng=drop_rng)
                kl = keys[-1]
                x = dropout(kl, x, self.dropout_rate, det or kl is None)
                return x, new_states
        new_states = []
        for i, (cell, p) in enumerate(zip(self.rnn.cells, params["rnn"])):
            prep = cell.prepare(p)
            x, sf = scan_layer(cell, prep, x, states[i], backend=self.backend)
            new_states.append(sf)
            ki = keys[1 + i]
            x = dropout(ki, x, self.dropout_rate, det or ki is None)
        return x, new_states
