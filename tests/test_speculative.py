"""Prompt-lookup speculative decoding (serving/speculative.py).

Greedy speculation must be EXACT: pld_decode_loop is token-identical to the
plain decode loop by construction, so every test here compares against
serving.generate.decode_loop output (or a python oracle for the pure token
logic).  The reference has no speculative path (its decode loop is the
per-token HF generate, cambrian_qwen.py:150-184) — this is a capability
upgrade, tested to the same bar as reference-parity features.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.model import init_tdc
from tdc_video_tpu.models import lm as lm_mod
from tdc_video_tpu.serving.generate import generate_text_only
from tdc_video_tpu.serving.speculative import (
    accept_and_emit,
    pld_decode_loop,
    propose_ngram,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tdc_tiny()
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _propose_oracle(hist, hist_len, n, k):
    """Python reference: most recent occurrence of the trailing n-gram."""
    drafts, founds = [], []
    for b in range(hist.shape[0]):
        h = list(hist[b, : hist_len[b]])
        gram = h[-n:]
        best = -1
        for i in range(len(h) - n):
            if h[i : i + n] == gram:
                best = i
        founds.append(best >= 0)
        start = best + n if best >= 0 else 0
        row = list(hist[b])
        drafts.append([row[min(start + j, hist.shape[1] - 1)] for j in range(k)])
    return np.asarray(drafts), np.asarray(founds)


class TestProposeNgram:
    def test_matches_oracle_random(self):
        rng = np.random.default_rng(0)
        # vocab 4 over length 40 guarantees plenty of 2-gram repeats
        hist = rng.integers(0, 4, (8, 48)).astype(np.int32)
        hist_len = rng.integers(10, 41, (8,)).astype(np.int32)
        got_d, got_f = propose_ngram(
            jnp.asarray(hist), jnp.asarray(hist_len), n=2, k=5
        )
        want_d, want_f = _propose_oracle(hist, hist_len, 2, 5)
        np.testing.assert_array_equal(np.asarray(got_f), want_f)
        # drafts only meaningful where found; junk drafts are contract-free
        for b in range(8):
            if want_f[b]:
                np.testing.assert_array_equal(np.asarray(got_d)[b], want_d[b])

    def test_recency_and_no_match(self):
        # trailing gram (7, 8) occurs twice earlier; must pick the LATER one
        h = np.asarray([[7, 8, 1, 2, 7, 8, 3, 4, 7, 8]], np.int32)
        d, f = propose_ngram(jnp.asarray(h), jnp.asarray([10]), n=2, k=2)
        assert bool(f[0])
        np.testing.assert_array_equal(np.asarray(d)[0], [3, 4])
        # no earlier occurrence -> not found
        h2 = np.asarray([[1, 2, 3, 4, 5, 6, 0, 0, 0, 0]], np.int32)
        _, f2 = propose_ngram(jnp.asarray(h2), jnp.asarray([6]), n=2, k=2)
        assert not bool(f2[0])

    def test_ignores_padding_past_hist_len(self):
        # pad region repeats the trailing gram; must NOT match there
        h = np.asarray([[5, 6, 1, 2, 9, 9, 1, 2, 1, 2]], np.int32)
        d, f = propose_ngram(jnp.asarray(h), jnp.asarray([4]), n=2, k=1)
        assert not bool(f[0])  # only slot 2.. is (1,2) but it IS the tail


class TestAcceptAndEmit:
    def _run(self, greedy, draft, eos, remaining, done):
        return tuple(
            np.asarray(x)
            for x in accept_and_emit(
                jnp.asarray(greedy, jnp.int32),
                jnp.asarray(draft, jnp.int32),
                jnp.asarray(eos, jnp.int32),
                jnp.asarray(remaining, jnp.int32),
                jnp.asarray(done, bool),
            )
        )

    def test_prefix_acceptance(self):
        greedy = [[10, 20, 30, 40]]
        m, e = self._run(greedy, [[10, 20, 99]], [1], [64], [False])
        assert m[0] == 3 and not e[0]  # 2 drafts agree + bonus
        m, _ = self._run(greedy, [[99, 20, 30]], [1], [64], [False])
        assert m[0] == 1  # first draft wrong -> bonus only
        m, _ = self._run(greedy, [[10, 20, 30]], [1], [64], [False])
        assert m[0] == 4  # all agree -> whole window

    def test_eos_and_budget_truncation(self):
        greedy = [[10, 1, 30, 40]]  # eos=1 at j=1
        m, e = self._run(greedy, [[10, 1, 30]], [1], [64], [False])
        assert m[0] == 2 and e[0]  # emit up to and incl. eos
        m, e = self._run(greedy, [[10, 1, 30]], [1], [1], [False])
        assert m[0] == 1 and not e[0]  # budget cuts before the eos
        m, e = self._run(greedy, [[10, 1, 30]], [1], [64], [True])
        assert m[0] == 0 and not e[0]  # done samples emit nothing


class TestVerifyStep:
    def test_matches_sequential_decode_steps(self, setup):
        """Force-feed the same 4 tokens through K=4 decode_steps and one
        verify_step: per-position logits and committed caches must agree."""
        cfg, params = setup
        rng = np.random.default_rng(3)
        B, L, K = 2, 9, 4
        ids = jnp.asarray(rng.integers(2, 100, (B, L)), jnp.int32)
        lens = jnp.asarray([L, L - 3], jnp.int32)
        mask = jnp.arange(L)[None] < lens[:, None]
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
        toks = jnp.asarray(rng.integers(2, 100, (B, K)), jnp.int32)

        def fresh_cache():
            c = lm_mod.init_kv_cache(cfg.lm, B, L + K + 2, dtype=cfg.dtype)
            _, c = lm_mod.prefill(
                cfg.lm, params["lm"], embeds, mask, c, dtype=cfg.dtype
            )
            return c

        seq_logits, c_seq = [], fresh_cache()
        for j in range(K):
            e = lm_mod.embed_tokens(cfg.lm, params["lm"], toks[:, j : j + 1], cfg.dtype)
            lg, c_seq = lm_mod.decode_step(cfg.lm, params["lm"], e, c_seq, dtype=cfg.dtype)
            seq_logits.append(lg)
        seq_logits = jnp.stack(seq_logits, axis=1)  # [B, K, V]

        c_ver = fresh_cache()
        e = lm_mod.embed_tokens(cfg.lm, params["lm"], toks, cfg.dtype)
        ver_logits, c_ver = lm_mod.verify_step(cfg.lm, params["lm"], e, c_ver, dtype=cfg.dtype)
        c_ver = lm_mod.commit_verified(c_ver, jnp.full((B,), K, jnp.int32))

        np.testing.assert_allclose(
            np.asarray(ver_logits), np.asarray(seq_logits), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_array_equal(
            np.asarray(c_ver["lengths"]), np.asarray(c_seq["lengths"])
        )
        np.testing.assert_array_equal(
            np.asarray(c_ver["mask"]), np.asarray(c_seq["mask"])
        )
        # K/V agree on every valid slot (garbage beyond lengths is masked)
        valid = np.asarray(c_seq["mask"])  # [B, S]
        kv_seq = np.asarray(c_seq["k"])  # [Lyr, B, S, H, D]
        kv_ver = np.asarray(c_ver["k"])
        np.testing.assert_allclose(
            kv_ver[:, valid], kv_seq[:, valid], rtol=1e-6, atol=1e-6
        )


class TestPLDLoop:
    def _both(self, cfg, params, ids, mask, new, **spec):
        plain = generate_text_only(cfg, params, ids, mask, max_new_tokens=new)
        spec_out = generate_text_only(
            cfg, params, ids, mask, max_new_tokens=new, **spec
        )
        return np.asarray(plain), np.asarray(spec_out)

    def test_token_identical_random_prompt(self, setup):
        """Low-acceptance regime: random prompt, drafts mostly rejected —
        output must still be exactly the greedy tokens."""
        cfg, params = setup
        rng = np.random.default_rng(5)
        ids = jnp.asarray(rng.integers(2, 100, (2, 12)), jnp.int32)
        mask = jnp.ones(ids.shape, bool)
        plain, spec = self._both(
            cfg, params, ids, mask, 12, spec_window=4, spec_ngram=2
        )
        np.testing.assert_array_equal(plain, spec)

    def test_token_identical_repetitive_prompt(self, setup):
        """High-acceptance regime: a tiny random model decodes into a cycle,
        and a repetitive prompt seeds matching grams."""
        cfg, params = setup
        base = np.asarray([4, 9, 17, 4, 9, 17, 4, 9, 17, 4, 9, 17], np.int32)
        ids = jnp.asarray(np.stack([base, base[::-1].copy()]), jnp.int32)
        mask = jnp.ones(ids.shape, bool)
        plain, spec = self._both(
            cfg, params, ids, mask, 16, spec_window=6, spec_ngram=2
        )
        np.testing.assert_array_equal(plain, spec)

    def test_token_identical_ragged_batch(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(7)
        ids = np.asarray(rng.integers(2, 100, (3, 14)), np.int32)
        lens = np.asarray([14, 9, 5], np.int32)
        ids[np.arange(14)[None] >= lens[:, None]] = 0
        mask = jnp.asarray(np.arange(14)[None] < lens[:, None])
        plain, spec = self._both(
            cfg, params, jnp.asarray(ids), mask, 10, spec_window=4, spec_ngram=3
        )
        np.testing.assert_array_equal(plain, spec)

    def test_eos_truncation_matches(self, setup):
        """Pick an eos id the greedy continuation actually produces; both
        loops must stop there and pad the rest identically."""
        import dataclasses

        cfg, params = setup
        rng = np.random.default_rng(9)
        ids = jnp.asarray(rng.integers(2, 100, (1, 10)), jnp.int32)
        mask = jnp.ones(ids.shape, bool)
        probe = np.asarray(generate_text_only(cfg, params, ids, mask, max_new_tokens=8))
        eos_id = int(probe[0, 4])  # 5th generated token becomes "eos"
        cfg2 = dataclasses.replace(
            cfg, lm=dataclasses.replace(cfg.lm, eos_token_ids=(eos_id,))
        )
        plain, spec = self._both(
            cfg2, params, ids, mask, 8, spec_window=4, spec_ngram=2
        )
        np.testing.assert_array_equal(plain, spec)
        pad_tail = plain[0, np.where(plain[0] == eos_id)[0][0] + 1 :]
        assert (pad_tail == cfg2.lm.pad_token_id).all()

    def test_token_identical_int8_kv(self, setup):
        """Speculative verify over an int8 KV cache reads the same quantized
        slots sequential decode would (lm._layer_forward verify branch)."""
        cfg, params = setup
        rng = np.random.default_rng(11)
        ids = jnp.asarray(rng.integers(2, 100, (2, 12)), jnp.int32)
        mask = jnp.ones(ids.shape, bool)
        plain = np.asarray(
            generate_text_only(
                cfg, params, ids, mask, max_new_tokens=10, kv_quant="int8"
            )
        )
        spec = np.asarray(
            generate_text_only(
                cfg, params, ids, mask, max_new_tokens=10, kv_quant="int8",
                spec_window=4, spec_ngram=2,
            )
        )
        np.testing.assert_array_equal(plain, spec)

    def test_sampling_requests_bypass_speculation(self, setup):
        """temperature>0 must route to the plain sampled loop (speculative
        greedy acceptance is exact only for argmax)."""
        cfg, params = setup
        rng = np.random.default_rng(13)
        ids = jnp.asarray(rng.integers(2, 100, (1, 8)), jnp.int32)
        mask = jnp.ones(ids.shape, bool)
        kw = dict(max_new_tokens=6, temperature=0.5, top_k=20)
        a = generate_text_only(
            cfg, params, ids, mask, key=jax.random.PRNGKey(3), spec_window=4, **kw
        )
        b = generate_text_only(cfg, params, ids, mask, key=jax.random.PRNGKey(3), **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMultimodalSpec:
    def test_multimodal_generate_token_identical(self, setup):
        """The full multimodal generate path (image sentinel in input_ids,
        visual-expanded prefill) with speculation matches plain greedy."""
        from tdc_video_tpu.serving.generate import generate

        cfg, params = setup
        rng = np.random.default_rng(17)
        B, T, L = 2, 8, 24
        s, d = cfg.siglip.image_size, cfg.dino.image_size
        kw = dict(
            image_pos=jnp.asarray([5, 7], jnp.int32),
            siglip_px=jnp.asarray(rng.normal(0, 1, (B, T, s, s, 3)), jnp.float32),
            dino_px=jnp.asarray(rng.normal(0, 1, (B, T, d, d, 3)), jnp.float32),
            frame_mask=jnp.asarray([[True] * T, [True] * 4 + [False] * 4]),
            qformer_text_ids=jnp.asarray(rng.integers(1, 50, (B, 6)), jnp.int32),
            qformer_text_mask=jnp.ones((B, 6), jnp.bool_),
            text_len=jnp.asarray([L, L - 4], jnp.int32),
            max_new_tokens=6,
            max_len=256,
            max_visual_len=128,
        )
        ids = jnp.asarray(rng.integers(2, 100, (B, L)), jnp.int32)
        plain = generate(cfg, params, ids, **kw)
        spec = generate(cfg, params, ids, spec_window=4, spec_ngram=2, **kw)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(spec))


class TestSampledAcceptance:
    """accept_and_emit_sampled: the rejection-sampling rule for deterministic
    (prompt-lookup) drafts.  Pure-function tests — no model forward."""

    def _mk(self, B, K, V, seed=0):
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(0, 2.0, (B, K, V)), jnp.float32)
        draft = jnp.asarray(rng.integers(0, V, (B, K - 1)), jnp.int32)
        eos = jnp.asarray([V - 1], jnp.int32)
        rem = jnp.full((B,), 100, jnp.int32)
        done = jnp.zeros((B,), bool)
        return logits, draft, eos, rem, done

    def test_greedy_rows_match_greedy_rule(self):
        """temperature <= 0 rows must reproduce accept_and_emit exactly
        (same emit counts, same emitted tokens)."""
        from tdc_video_tpu.serving.speculative import (
            accept_and_emit,
            accept_and_emit_sampled,
        )

        B, K, V = 5, 4, 16
        logits, draft, eos, rem, done = self._mk(B, K, V, seed=3)
        # make some drafts agree with the argmax so acceptance varies
        g = jnp.argmax(logits, -1)
        draft = draft.at[0].set(g[0, 1:])  # full agreement row
        draft = draft.at[1, 0].set(g[1, 1])  # partial

        zeros = jnp.zeros((B,))
        e, m, eosd = accept_and_emit_sampled(
            logits, draft, eos, rem, done, zeros, jnp.zeros((B,), jnp.int32),
            jnp.ones((B,)), jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        )
        m_ref, eos_ref = accept_and_emit(g.astype(jnp.int32), draft, eos, rem, done)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
        np.testing.assert_array_equal(np.asarray(eosd), np.asarray(eos_ref))
        # emitted prefix == the greedy continuations
        for b in range(B):
            n = int(m[b])
            np.testing.assert_array_equal(
                np.asarray(e)[b, :n], np.asarray(g)[b, :n]
            )

    def test_first_emit_marginal_matches_target(self):
        """The speculative-sampling guarantee: P(first emitted token = t)
        must equal the warped target p_0(t) EXACTLY — accept contributes
        p(d) at t=d, rejection contributes (1-p(d)) * residual.  Monte Carlo
        over seeds (the seed axis vectorizes as batch)."""
        from tdc_video_tpu.serving.speculative import accept_and_emit_sampled

        N, K, V = 4000, 3, 8
        rng = np.random.default_rng(0)
        row_logits = rng.normal(0, 1.5, (K, V)).astype(np.float32)
        d = rng.integers(0, V, (K - 1,)).astype(np.int32)
        logits = jnp.asarray(np.broadcast_to(row_logits, (N, K, V)))
        draft = jnp.asarray(np.broadcast_to(d, (N, K - 1)))
        eos = jnp.asarray([V + 5], jnp.int32)  # unreachable: no EOS capping
        rem = jnp.full((N,), 100, jnp.int32)
        done = jnp.zeros((N,), bool)
        temp = jnp.full((N,), 1.0)
        topk = jnp.zeros((N,), jnp.int32)
        topp = jnp.ones((N,))
        seeds = jnp.arange(N, dtype=jnp.int32)
        gidx = jnp.zeros((N,), jnp.int32)

        e, m, _ = accept_and_emit_sampled(
            logits, draft, eos, rem, done, temp, topk, topp, seeds, gidx
        )
        first = np.asarray(e)[:, 0]
        freq = np.bincount(first, minlength=V) / N
        p0 = np.asarray(jax.nn.softmax(jnp.asarray(row_logits[0])))
        np.testing.assert_allclose(freq, p0, atol=0.03)
        # acceptance rate of the first draft == p_0(d_0)
        acc = (np.asarray(m) >= 2).mean()  # m>=2 iff draft 0 accepted
        np.testing.assert_allclose(acc, p0[d[0]], atol=0.03)

    def test_rejected_draft_never_reemitted(self):
        """On rejection the residual distribution excludes the draft token:
        whenever m stops at position j (j < K-1 rejection), e[j] != d[j]."""
        from tdc_video_tpu.serving.speculative import accept_and_emit_sampled

        N, K, V = 2000, 4, 6
        rng = np.random.default_rng(1)
        row_logits = rng.normal(0, 1.0, (K, V)).astype(np.float32)
        d = rng.integers(0, V, (K - 1,)).astype(np.int32)
        e, m, _ = accept_and_emit_sampled(
            jnp.asarray(np.broadcast_to(row_logits, (N, K, V))),
            jnp.asarray(np.broadcast_to(d, (N, K - 1))),
            jnp.asarray([V + 5], jnp.int32),
            jnp.full((N,), 100, jnp.int32),
            jnp.zeros((N,), bool),
            jnp.full((N,), 1.0),
            jnp.zeros((N,), jnp.int32),
            jnp.ones((N,)),
            jnp.arange(N, dtype=jnp.int32),
            jnp.zeros((N,), jnp.int32),
        )
        e, m = np.asarray(e), np.asarray(m)
        rejected = m < K  # stopped before full acceptance + bonus
        for b in np.nonzero(rejected)[0][:500]:
            j = m[b] - 1  # the resampled position
            if j < K - 1:
                assert e[b, j] != d[j], (b, j, e[b], d)

    def test_second_position_conditional_matches_target(self):
        """Given the first draft accepted, the SECOND emitted token must be
        p_1-distributed (accept d_1 w.p. p_1(d_1), else residual)."""
        from tdc_video_tpu.serving.speculative import accept_and_emit_sampled

        N, K, V = 6000, 3, 6
        rng = np.random.default_rng(2)
        row_logits = rng.normal(0, 1.0, (K, V)).astype(np.float32)
        d = rng.integers(0, V, (K - 1,)).astype(np.int32)
        e, m, _ = accept_and_emit_sampled(
            jnp.asarray(np.broadcast_to(row_logits, (N, K, V))),
            jnp.asarray(np.broadcast_to(d, (N, K - 1))),
            jnp.asarray([V + 5], jnp.int32),
            jnp.full((N,), 100, jnp.int32),
            jnp.zeros((N,), bool),
            jnp.full((N,), 1.0),
            jnp.zeros((N,), jnp.int32),
            jnp.ones((N,)),
            jnp.arange(N, dtype=jnp.int32),
            jnp.zeros((N,), jnp.int32),
        )
        e, m = np.asarray(e), np.asarray(m)
        sel = m >= 2  # first draft accepted -> position 1 emitted
        if sel.sum() > 500:
            freq = np.bincount(e[sel, 1], minlength=V) / sel.sum()
            p1 = np.asarray(jax.nn.softmax(jnp.asarray(row_logits[1])))
            np.testing.assert_allclose(freq, p1, atol=0.04)
