"""Autoregressive serving for the LM: prefill + stateful decode + sampling.

The reference has no inference/serving path beyond full-sequence perplexity
scoring (`/root/reference/rnn_compression_factorization_vmlmf/src/train_test/
lm_test.py:155-171`); a production framework needs one.  TPU-native design:

  * **prefill** — the prompt `[T, B]` runs through the normal scan forward
    (one compiled dispatch, input projections batched over time onto the MXU),
    returning the carried `(h, c)` per layer and the last-position logits.
  * **decode** — `lax.scan` over new positions entirely on device: embed one
    token (gather), run each layer's `cell.step` on weight-only-`prepare`d
    factors (hoisted OUT of the scan — rank-r factor precomputes are done
    once, not per token), project to logits, sample, feed back.  No
    host↔device transfer until the generated block is done.
  * **sampling** — greedy (`temperature=None`), temperature, and static
    `top_k` filtering; randomness via an explicit `jax.random` key threaded
    through the scan carry.

An RNN LM is the easy case of serving — the state is O(L·B·H), there is no
KV cache growth — so a whole generated block is one scan with static shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


def _top_k_mask(logits, k):
    """Keep the k largest logits per row, set the rest to -inf (static k)."""
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    return jnp.where(logits < thresh, neg, logits)


@dataclasses.dataclass(frozen=True)
class Decoder:
    """Serving wrapper over an `LMModel` (any cell family / backend)."""

    model: object  # LMModel

    # ------------------------------------------------------------------ core
    def _preps(self, params):
        return tuple(
            cell.prepare(p) for cell, p in zip(self.model.rnn.cells, params["rnn"])
        )

    def _token_step(self, params, preps, tok, states):
        """One decode position: tok [B] int32 -> (logits [B, V], new states)."""
        x = self.model.embed(params["embed"], tok)  # [B, H] gather
        new_states = []
        for cell, prep, s in zip(self.model.rnn.cells, preps, states):
            s, x = cell.step(prep, cell.inp(prep, x), s)
            new_states.append(s)
        return self.model._logits(params, x), tuple(new_states)

    # ------------------------------------------------------------------- API
    @functools.partial(jax.jit, static_argnums=0)
    def prefill(self, params, ids, states):
        """Consume the prompt. ids [T, B] -> (last logits [B, V], states)."""
        logits, states = self.model.apply(params, ids, states, train=False)
        return logits[-1], states

    def decode(self, params, last_logits, states, *, steps, key=None,
               temperature=None, top_k=None, return_logits=False):
        """Generate `steps` tokens. -> (tokens [steps, B] int32, states)
        (or (tokens, states, last_logits) with ``return_logits=True`` — use
        that to chain decode blocks without any eager per-token step).

        temperature=None -> greedy argmax; otherwise categorical sampling at
        the given temperature (a runtime scalar — no recompile per value),
        optionally restricted to the static `top_k` largest logits.
        """
        greedy = temperature is None
        if not greedy and key is None:
            raise ValueError("sampling (temperature != None) requires a PRNG key")
        if greedy:
            key = jax.random.PRNGKey(0)  # unused, keeps the carry uniform
            temperature = 1.0
        tokens, states, logits = self._decode_jit(
            params, last_logits, tuple(states), jnp.float32(temperature), key,
            steps, greedy, top_k)
        if return_logits:
            return tokens, list(states), logits
        return tokens, list(states)

    @functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
    def _decode_jit(self, params, last_logits, states, temperature, key,
                    steps, greedy, top_k):
        preps = self._preps(params)

        def sample(logits, k):
            if greedy:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if top_k is not None:
                logits = _top_k_mask(logits, top_k)
            return jax.random.categorical(k, logits / temperature).astype(jnp.int32)

        def body(carry, _):
            logits, states, key = carry
            key, sub = jax.random.split(key)
            tok = sample(logits, sub)
            logits, states = self._token_step(params, preps, tok, states)
            return (logits, states, key), tok

        (logits, states, _), tokens = jax.lax.scan(
            body, (last_logits, states, key), None, length=steps)
        return tokens, states, logits

    def generate(self, params, prompt_ids, *, max_new_tokens, key=None,
                 temperature=None, top_k=None):
        """prompt_ids [T, B] -> generated tokens [max_new_tokens, B]."""
        states = self.model.state0(prompt_ids.shape[1])
        last_logits, states = self.prefill(params, prompt_ids, states)
        tokens, _ = self.decode(
            params, last_logits, states, steps=max_new_tokens, key=key,
            temperature=temperature, top_k=top_k)
        return tokens
