"""Cell protocol shared by the whole compressed-RNN zoo.

A cell is a frozen dataclass of static sizes with pure functions over a
parameter dict.  The protocol splits the per-timestep math into:

  init(key)           -> params                 (pytree of arrays)
  prepare(params)     -> prep                   (params + weight-only precomputes,
                                                 run once per training step)
  inp(prep, xs)       -> gi [..., G*h]          time-parallel input contribution
                                                (biases and input-side diagonal
                                                terms folded in; computed for ALL
                                                timesteps as one MXU matmul)
  step(prep, gi_t, s) -> (s', h)                serial recurrent part, the body
                                                of `lax.scan`
  state0(batch)       -> s

This decomposition is the central TPU design decision: the reference executes
the *entire* gate computation per timestep inside a Python loop
(`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:308-310`),
while here only the hidden-to-hidden product is sequential; everything else is
batched over time and tiled onto the MXU once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def normal_init(key, shape, scale=0.1, dtype=jnp.float32):
    """0.1 * N(0,1) — the weight init used by every HAR-family reference cell."""
    return scale * jax.random.normal(key, shape, dtype=dtype)


def uniform_init(key, shape, bound, dtype=jnp.float32):
    """U(-bound, bound) — the LM whole-model reset (`vmlmf_lm.py:407-410`)."""
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def reinit_uniform(params, key, bound):
    """Re-initialize every leaf of a param pytree to U(-bound, bound).

    Mirrors `Model.reset_parameters` (`vmlmf_lm.py:407-410`), which overwrites
    all parameters — including biases — after construction.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [uniform_init(k, l.shape, bound, l.dtype) for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def lstm_update(pre, c):
    """Standard LSTM gate nonlinearity + state update.

    pre: [..., 4h] stacked pre-activations in (i, f, g, o) order; c: [..., h].
    Gate order is standardized to (input, forget, candidate, output) across
    the framework (the reference mixes three different orders between files —
    see SURVEY.md §7 "hard parts"; the orders are interchangeable
    parameterizations, each chunk being an independently initialized block).
    """
    i, f, g, o = jnp.split(pre, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_next = f * c + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def pad_features(x, size):
    """Zero-pad (or truncate) the trailing feature dim of x to `size`.

    Generalizes the reference's `hidden_size >= input_size` assumption
    (`vmlmf.py:92-94` sets vm_x=None otherwise, which crashes downstream):
    the diagonal "vm" term is defined over min(n, h) features and padded.
    """
    n = x.shape[-1]
    if n == size:
        return x
    if n > size:
        return x[..., :size]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, size - n)]
    return jnp.pad(x, pad)


@dataclasses.dataclass(frozen=True)
class Cell:
    """Base class: static sizes + the functional protocol."""

    input_size: int
    hidden_size: int

    num_gates = 4  # LSTM family default; GRU overrides with 3

    # -- protocol -----------------------------------------------------------
    def init(self, key, dtype=jnp.float32):
        raise NotImplementedError

    def prepare(self, params):
        return params

    def state0(self, batch, dtype=jnp.float32):
        h = jnp.zeros((batch, self.hidden_size), dtype)
        return (h, jnp.zeros((batch, self.hidden_size), dtype))

    def out_of(self, state):
        return state[0]

    def inp(self, prep, xs):
        raise NotImplementedError

    def step(self, prep, gi_t, state):
        raise NotImplementedError

    # -- conveniences -------------------------------------------------------
    def apply_step(self, params, x_t, state):
        """Un-hoisted single step (prepare + inp + step). Test/debug path."""
        prep = self.prepare(params)
        return self.step(prep, self.inp(prep, x_t), state)

    def param_count(self, params):
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
