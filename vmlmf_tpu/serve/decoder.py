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

    # --------------------------------------------------------------- beams
    def beam_search(self, params, prompt_ids, *, steps, beams,
                    length_penalty=0.0):
        """Fixed-length beam search. prompt_ids [T, B] ->
        (tokens [steps, B, W] int32, scores [B, W] f32), beams sorted by
        descending total log-probability (length-normalized when
        ``length_penalty`` > 0: score / steps**penalty).

        The whole search is ONE device-resident `lax.scan`: each step scores
        [B, W*V] continuations, keeps the top W per batch row, gathers the
        recurrent states of the surviving parent beams, and records
        (token, parent) pairs; a reverse scan then walks the backpointers to
        assemble the sequences.  Exact for the first step (all beams start
        from the same prefix with beam 0 active), standard beam semantics
        after."""
        if beams > self.model.vocab_size:
            raise ValueError(
                f"beams={beams} exceeds vocab_size={self.model.vocab_size}; "
                f"top_k cannot select more continuations than the vocabulary")
        b = prompt_ids.shape[1]
        states = self.model.state0(b)
        last_logits, states = self.prefill(params, prompt_ids, states)
        return self._beam_jit(params, last_logits, tuple(states), steps, beams,
                              float(length_penalty))

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def _beam_jit(self, params, last_logits, states, steps, beams, length_penalty):
        preps = self._preps(params)
        b, v = last_logits.shape
        w = beams

        def tile_beams(x):  # [B, ...] -> [B*W, ...] (beam-major within row)
            return jnp.repeat(x, w, axis=0)

        states = jax.tree_util.tree_map(tile_beams, states)
        logp = jax.nn.log_softmax(last_logits)  # [B, V]
        # step 0: pick the top-W first tokens per row (all from the prefix)
        scores, tok0 = jax.lax.top_k(logp, w)   # [B, W]
        tok = tok0.reshape(b * w).astype(jnp.int32)
        logits, states = self._token_step(params, preps, tok, states)

        def body(carry, _):
            logits, states, scores = carry
            lp = jax.nn.log_softmax(logits).reshape(b, w, v)
            total = scores[:, :, None] + lp            # [B, W, V]
            scores, flat = jax.lax.top_k(total.reshape(b, w * v), w)
            parent = flat // v                          # [B, W] surviving beam
            tok = (flat % v).astype(jnp.int32)          # [B, W] its next token
            # gather surviving parents' recurrent states
            gather_idx = (parent + jnp.arange(b)[:, None] * w).reshape(-1)

            def reorder(x):
                return x[gather_idx]

            states = jax.tree_util.tree_map(reorder, states)
            logits, states = self._token_step(
                params, preps, tok.reshape(b * w), states)
            return (logits, states, scores), (tok, parent)

        (logits, states, scores), (toks, parents) = jax.lax.scan(
            body, (logits, states, scores), None, length=steps - 1)

        # backtrack: walk parents from the last step to the first
        def back(beam_idx, step_rec):
            tok, parent = step_rec
            row = jnp.arange(b)[:, None]
            return parent[row, beam_idx], tok[row, beam_idx]

        last_idx = jnp.broadcast_to(jnp.arange(w), (b, w))
        beam_idx, rev_tokens = jax.lax.scan(
            back, last_idx, (toks, parents), reverse=True)
        # beam_idx now points at each final beam's step-0 token
        row = jnp.arange(b)[:, None]
        first = tok0[row, beam_idx].astype(jnp.int32)[None]     # [1, B, W]
        tokens = jnp.concatenate([first, rev_tokens], axis=0)   # [steps, B, W]
        if length_penalty:
            scores = scores / (float(steps) ** length_penalty)
        return tokens, scores
