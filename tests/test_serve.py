"""Serving/decode tests: prefill+decode vs a full-forward oracle, sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from vmlmf_tpu.cells import VMLMFCell, VMLMFGroupCell
from vmlmf_tpu.nn.models import LMModel
from vmlmf_tpu.serve import Decoder

VOCAB, HIDDEN, LAYERS, B, T = 50, 32, 2, 3, 7


def make_model(**kw):
    return LMModel(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS,
        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
        dropout_rate=0.0, winit=0.05, **kw)


def greedy_oracle(model, params, prompt, steps):
    """Generate greedily by re-running the full forward per position."""
    states = model.state0(prompt.shape[1])
    logits, states = model.apply(params, prompt, states, train=False)
    toks = []
    tok = jnp.argmax(logits[-1], -1).astype(jnp.int32)
    for _ in range(steps):
        toks.append(tok)
        logits, states = model.apply(params, tok[None, :], states, train=False)
        tok = jnp.argmax(logits[-1], -1).astype(jnp.int32)
    return jnp.stack(toks)


class TestDecoder:
    def setup_method(self):
        self.model = make_model()
        self.params = self.model.init(jax.random.PRNGKey(0))
        self.prompt = jax.random.randint(jax.random.PRNGKey(1), (T, B), 0, VOCAB)

    def test_greedy_matches_full_forward_oracle(self):
        dec = Decoder(self.model)
        got = dec.generate(self.params, self.prompt, max_new_tokens=6)
        want = greedy_oracle(self.model, self.params, self.prompt, 6)
        np.testing.assert_array_equal(got, want)

    def test_prefill_states_match_apply(self):
        dec = Decoder(self.model)
        states0 = self.model.state0(B)
        logits, states = dec.prefill(self.params, self.prompt, states0)
        full, states_ref = self.model.apply(
            self.params, self.prompt, states0, train=False)
        np.testing.assert_allclose(logits, full[-1], atol=1e-6)
        for (h, c), (hr, cr) in zip(states, states_ref):
            np.testing.assert_allclose(h, hr, atol=1e-6)
            np.testing.assert_allclose(c, cr, atol=1e-6)

    def test_top_k_1_equals_greedy(self):
        dec = Decoder(self.model)
        greedy = dec.generate(self.params, self.prompt, max_new_tokens=5)
        k1 = dec.generate(self.params, self.prompt, max_new_tokens=5,
                          key=jax.random.PRNGKey(7), temperature=0.8, top_k=1)
        np.testing.assert_array_equal(greedy, k1)

    def test_sampling_deterministic_per_key_and_in_vocab(self):
        dec = Decoder(self.model)
        kw = dict(max_new_tokens=8, temperature=1.0)
        a = dec.generate(self.params, self.prompt, key=jax.random.PRNGKey(3), **kw)
        b = dec.generate(self.params, self.prompt, key=jax.random.PRNGKey(3), **kw)
        c = dec.generate(self.params, self.prompt, key=jax.random.PRNGKey(4), **kw)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (8, B)
        assert int(a.min()) >= 0 and int(a.max()) < VOCAB
        assert not np.array_equal(a, c)  # overwhelmingly likely

    def test_sampling_requires_key(self):
        dec = Decoder(self.model)
        states = self.model.state0(B)
        logits, states = dec.prefill(self.params, self.prompt, states)
        try:
            dec.decode(self.params, logits, states, steps=2, temperature=1.0)
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError without a key")

    def test_beam_width_1_equals_greedy(self):
        dec = Decoder(self.model)
        greedy = dec.generate(self.params, self.prompt, max_new_tokens=6)
        toks, scores = dec.beam_search(self.params, self.prompt, steps=6, beams=1)
        assert toks.shape == (6, B, 1) and scores.shape == (B, 1)
        np.testing.assert_array_equal(toks[:, :, 0], greedy)

    def test_beam_search_exact_on_two_steps(self):
        """steps=2 with beams=V is exhaustive: every first token survives step
        0, so the result must equal brute force over all V^2 sequences."""
        vocab = 12
        model = LMModel(
            vocab_size=vocab, hidden_size=16, num_layers=2,
            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
            dropout_rate=0.0, winit=0.05)
        params = model.init(jax.random.PRNGKey(2))
        prompt = jax.random.randint(jax.random.PRNGKey(3), (5, 2), 0, vocab)
        dec = Decoder(model)
        toks, scores = dec.beam_search(params, prompt, steps=2, beams=vocab)

        # brute force: total logp of every (t0, t1) pair per batch row
        states = model.state0(2)
        logits, states = model.apply(params, prompt, states, train=False)
        lp0 = jax.nn.log_softmax(logits[-1])  # [B, V]
        best = []
        for row in range(2):
            totals = np.full((vocab, vocab), -np.inf)
            for t0 in range(vocab):
                st = [(h[row : row + 1], c[row : row + 1]) for h, c in states]
                lg, _ = model.apply(params, jnp.full((1, 1), t0, jnp.int32),
                                    st, train=False)
                lp1 = jax.nn.log_softmax(lg[-1, 0])
                totals[t0] = float(lp0[row, t0]) + np.asarray(lp1)
            best.append(totals)

        for row in range(2):
            flat = best[row].reshape(-1)
            order = np.argsort(-flat)
            # top-1 sequence and score must match exactly
            t0, t1 = divmod(int(order[0]), vocab)
            assert (int(toks[0, row, 0]), int(toks[1, row, 0])) == (t0, t1)
            np.testing.assert_allclose(float(scores[row, 0]), flat[order[0]],
                                       atol=1e-5)
            # all W scores match the W best brute-force totals, sorted
            np.testing.assert_allclose(
                np.asarray(scores[row]), flat[order[:vocab]], atol=1e-5)

    def test_beam_search_sorted_and_in_range(self):
        dec = Decoder(self.model)
        toks, scores = dec.beam_search(self.params, self.prompt, steps=5, beams=4)
        assert toks.shape == (5, B, 4) and scores.shape == (B, 4)
        s = np.asarray(scores)
        assert (np.diff(s, axis=1) <= 1e-6).all(), "beams not sorted"
        assert int(toks.min()) >= 0 and int(toks.max()) < VOCAB
        # length penalty only rescales scores, same sequences
        toks2, scores2 = dec.beam_search(self.params, self.prompt, steps=5,
                                         beams=4, length_penalty=0.7)
        np.testing.assert_array_equal(toks, toks2)
        np.testing.assert_allclose(np.asarray(scores2),
                                   s / 5.0 ** 0.7, atol=1e-6)

    def test_tied_embeddings_and_group_cells(self):
        model = LMModel(
            vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=2,
            cell_factory=lambda n, h: VMLMFGroupCell(
                n, h, w_rank=4, u_ranks=(2, 2), groups=2),
            dropout_rate=0.0, winit=0.05, tie_embeddings=True)
        params = model.init(jax.random.PRNGKey(0))
        got = Decoder(model).generate(params, self.prompt, max_new_tokens=4)
        want = greedy_oracle(model, params, self.prompt, 4)
        np.testing.assert_array_equal(got, want)
