"""Non-recurrent layers: embedding, dense, dropout, conv feature stack.

Parity targets:
  * `Embed` / `Linear` of the LM
    (`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf_lm.py:33-51,341-361`),
  * classifier head of `Net` (`vmlmf.py:345-347`: bias .1, weight N(0, .01)),
  * the 4×Conv2d(64,(5,1)) feature extractor of the legacy DeepConvLSTM
    (`/root/reference/rnn_compression_factorization/src/module/compressed_deepConv.py:29-54`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import normal_init


@dataclasses.dataclass(frozen=True)
class Embed:
    vocab_size: int
    embed_size: int

    def init(self, key, dtype=jnp.float32):
        return {"w": normal_init(key, (self.vocab_size, self.embed_size), dtype=dtype)}

    def __call__(self, params, ids):
        return params["w"][ids]


@dataclasses.dataclass(frozen=True)
class Dense:
    in_size: int
    out_size: int
    bias_fill: float | None = None  # classifier head uses 0.1 (`vmlmf.py:346`)
    weight_scale: float = 0.01  # N(0, .01) (`vmlmf.py:347`)

    def init(self, key, dtype=jnp.float32):
        w = normal_init(key, (self.in_size, self.out_size), scale=self.weight_scale, dtype=dtype)
        b = jnp.full((self.out_size,), self.bias_fill, dtype) if self.bias_fill is not None \
            else jnp.zeros((self.out_size,), dtype)
        return {"w": w, "b": b}

    def __call__(self, params, x):
        return x @ params["w"] + params["b"]


def dropout(key, x, rate, deterministic):
    """Inverted dropout; no-op when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


@dataclasses.dataclass(frozen=True)
class ConvFeatures:
    """4 stacked valid convs over time with kernel (5, 1): [B, T, F] ->
    [B, T-16, channels*F].  TPU-native layout: NHWC with lax.conv so XLA maps
    it onto the MXU (the reference uses NCHW Conv2d over a singleton channel,
    `compressed_deepConv.py:46-54`)."""

    channels: int = 64
    kernel_t: int = 5
    layers: int = 4
    # The reference stacks its convs with no nonlinearity between them
    # (`compressed_deepConv.py:48-51`) — that is the default here so parity
    # grids reproduce the reference model; ReLU is the opt-in improvement.
    activation: bool = False

    def init(self, key, dtype=jnp.float32):
        import math

        ks = jax.random.split(key, self.layers)
        p = {}
        c_in = 1
        for i in range(self.layers):
            # kernel layout HWIO: (time, feature=1, in, out)
            fan_in = self.kernel_t * c_in
            p[f"k{i}"] = normal_init(ks[i], (self.kernel_t, 1, c_in, self.channels),
                                     scale=1.0 / math.sqrt(fan_in), dtype=dtype)
            p[f"b{i}"] = jnp.zeros((self.channels,), dtype)
            c_in = self.channels
        return p

    def __call__(self, params, x):
        # x: [B, T, F] -> NHWC [B, T, F, 1]
        y = x[..., None]
        for i in range(self.layers):
            y = jax.lax.conv_general_dilated(
                y, params[f"k{i}"],
                window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + params[f"b{i}"]
            if self.activation:
                y = jax.nn.relu(y)
        b, t, f, c = y.shape
        return y.reshape(b, t, f * c)  # flatten sensors×channels (`:53-54`)
