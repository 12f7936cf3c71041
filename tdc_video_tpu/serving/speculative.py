"""Prompt-lookup speculative decoding (greedy).

Batch-1 decode on TPU is bound by streaming the weights from HBM, so a
K-token `verify_step` forward costs nearly the same as a 1-token
`decode_step` — the MXU slack makes verifying K-1 draft tokens almost free.
Drafts come from n-gram continuation lookup in the token history
(prompt + generated so far): video-QA answers echo the prompt (subtitles,
option strings, transcripts), which is exactly the regime prompt-lookup
exploits, and it needs no draft model or extra weights.

Greedy acceptance: the window is [last_token, d_1..d_{K-1}]; position j's
argmax g_j is THE token greedy decoding would produce after consuming the
window prefix, so the longest prefix where g_j == d_{j+1} plus the one
bonus token g_a are all exact — output is token-identical to
serving/generate.decode_loop by construction (tests/test_speculative.py),
and a zero-match window still emits one correct token (g_0), so the
worst case degenerates to plain decode at ~1 verify forward per token.

Capability upgrade over the reference's per-token HF decode loop
(/root/reference/tdc/language_model/cambrian_qwen.py:150-184); the
reference has no speculative path.  Technique: prompt-lookup decoding
(n-gram drafting) with the deterministic-greedy special case of
speculative verification.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TDCConfig
from ..models import lm as lm_mod

Params = Any


def propose_ngram(
    hist: jnp.ndarray,  # [B, C] int32 token history (prompt + generated)
    hist_len: jnp.ndarray,  # [B] int32 valid prefix length
    n: int,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draft k tokens per sample: find the MOST RECENT earlier occurrence of
    the trailing n-gram and return the k tokens that followed it.

    All static-shape: the match scan compares n shifted copies of the history
    against the trailing gram (O(n*C) VPU work, trivial next to a decode
    step).  Returns (draft [B, k] int32, found [B] bool).  When not found the
    draft is junk (history head) — verification rejects it at zero extra
    cost because the verify forward has fixed shape anyway.  Drafts that run
    past hist_len read stale history and are likewise just bad guesses.
    """
    B, C = hist.shape
    gidx = jnp.maximum(hist_len[:, None] - n + jnp.arange(n)[None], 0)
    gram = jnp.take_along_axis(hist, gidx, axis=1)  # [B, n]
    match = jnp.ones((B, C), jnp.bool_)
    for j in range(n):
        match = match & (jnp.roll(hist, -j, axis=1) == gram[:, j : j + 1])
    idx = jnp.arange(C)[None]
    # window must sit strictly before the trailing gram occurrence itself
    # (idx < hist_len - n) — this also keeps every compared slot in-range.
    valid = match & (idx < hist_len[:, None] - n)
    best = jnp.max(jnp.where(valid, idx, -1), axis=1)  # most recent match
    found = best >= 0
    start = jnp.where(found, best + n, 0)
    didx = jnp.minimum(start[:, None] + jnp.arange(k)[None], C - 1)
    return jnp.take_along_axis(hist, didx, axis=1), found


def accept_and_emit(
    greedy: jnp.ndarray,  # [B, K] argmax continuations from verify_step
    draft: jnp.ndarray,  # [B, K-1] proposed draft tokens
    eos: jnp.ndarray,  # [E] eos token ids
    remaining: jnp.ndarray,  # [B] budget left (max_new - emitted)
    done: jnp.ndarray,  # [B] already finished
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy speculative acceptance: emit the longest prefix of `greedy`
    whose drafts agreed, plus the bonus token, truncated at the first emitted
    EOS and the remaining budget.  Returns (m [B] emit counts, eos_emitted
    [B]).  Pure token logic — unit-tested against a python oracle."""
    K = greedy.shape[1]
    agree = greedy[:, :-1] == draft  # [B, K-1]
    a = jnp.cumprod(agree.astype(jnp.int32), axis=1).sum(axis=1)  # [B] 0..K-1
    m_raw = a + 1
    j_idx = jnp.arange(K)[None]
    is_eos = jnp.any(greedy[..., None] == eos[None, None, :], axis=-1)
    eos_hit = is_eos & (j_idx < m_raw[:, None])
    first_eos = jnp.min(jnp.where(eos_hit, j_idx, K), axis=1)  # K = none
    m = jnp.minimum(jnp.minimum(m_raw, first_eos + 1), remaining)
    m = jnp.where(done, 0, m)
    eos_emitted = first_eos < m
    return m, eos_emitted


def accept_and_emit_sampled(
    logits: jnp.ndarray,  # [B, K, V] raw verify_step logits
    draft: jnp.ndarray,  # [B, K-1] proposed draft tokens
    eos: jnp.ndarray,  # [E]
    remaining: jnp.ndarray,  # [B]
    done: jnp.ndarray,  # [B]
    temp: jnp.ndarray,  # [B] f32; <= 0 rows take the exact greedy path
    topk: jnp.ndarray,  # [B] i32
    topp: jnp.ndarray,  # [B] f32
    seed: jnp.ndarray,  # [B] i32
    gidx: jnp.ndarray,  # [B] i32 tokens emitted so far (counter-mode index)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SPECULATIVE SAMPLING with deterministic (prompt-lookup) drafts.

    The draft proposal is a point mass (q(d)=1), so the general speculative
    sampling rule specializes: accept draft d_j with probability p_j(d_j)
    under the warped target distribution p_j (temperature -> top-k -> top-p,
    generate.filter_rows — the same warping the plain sampled chunk applies);
    on first rejection at position a, resample from the residual
    norm(max(p_a - q, 0)) = p_a with d excluded, renormalized; on full
    acceptance, the bonus token samples from p_{K-1}.  Every emitted token is
    therefore EXACTLY p-distributed given its prefix (the standard
    speculative-sampling guarantee), while accepted drafts arrive K-at-a-time.

    Greedy rows (temp <= 0) reduce to accept_and_emit's exact rule — argmax
    agreement, argmax emits — so mixed batches keep greedy rows
    token-identical to the greedy spec engine.

    Randomness is counter-mode like generate.sample_rows: the token at
    absolute position gidx+j derives its keys from (seed, gidx+j) with
    separate substreams for the accept uniform and the resample draw, so a
    request's stream is reproducible and independent of batchmates.  (The
    spec stream differs from the plain sampled chunk's stream — equality is
    in distribution, not token-for-token; tests/test_speculative.py
    Monte-Carlos the marginals against the analytic target.)

    Returns (emit [B, K] tokens, m [B] emit counts, eos_emitted [B]).
    """
    from .generate import filter_rows

    B, K, V = logits.shape
    x = logits.astype(jnp.float32)
    greedy = jnp.argmax(x, axis=-1).astype(jnp.int32)  # [B, K]

    xw = filter_rows(
        x.reshape(B * K, V),
        jnp.repeat(temp, K),
        jnp.repeat(topk, K),
        jnp.repeat(topp, K),
    ).reshape(B, K, V)
    probs = jax.nn.softmax(xw, axis=-1)

    def per_row(xw_r, probs_r, greedy_r, draft_r, t, sd, gi):
        # keys: position j -> fold(seed, gi + j); substream 1 = accept
        # uniform, substream 2 = resample/bonus categorical
        base = jax.random.fold_in(jax.random.PRNGKey(0), sd)
        keys = jax.vmap(lambda j: jax.random.fold_in(base, gi + j))(jnp.arange(K))
        u = jax.vmap(lambda k: jax.random.uniform(jax.random.fold_in(k, 1)))(keys)

        p_d = jnp.take_along_axis(probs_r[:-1], draft_r[:, None], axis=-1)[:, 0]
        acc_sampled = u[:-1] < p_d
        acc_greedy = greedy_r[:-1] == draft_r
        accept = jnp.where(t > 0.0, acc_sampled, acc_greedy)  # [K-1]
        a = jnp.cumprod(accept.astype(jnp.int32)).sum()  # 0..K-1

        # per-position final-token candidates: j < K-1 resamples with the
        # rejected draft masked out (the residual distribution); j = K-1 is
        # the unmasked bonus draw
        masked = xw_r[:-1].at[jnp.arange(K - 1), draft_r].set(-jnp.inf)
        cand = jnp.concatenate([masked, xw_r[-1:]], axis=0)  # [K, V]
        r = jax.vmap(
            lambda k, row: jax.random.categorical(jax.random.fold_in(k, 2), row)
        )(keys, cand).astype(jnp.int32)
        final = jnp.where(t > 0.0, r[a], greedy_r[a])

        j_idx = jnp.arange(K)
        dpad = jnp.concatenate([draft_r, draft_r[-1:]], axis=0)
        e = jnp.where(j_idx < a, dpad, jnp.where(j_idx == a, final, 0))
        # greedy rows emit the argmax everywhere (== draft on accepted
        # positions by the acceptance rule), matching accept_and_emit
        e = jnp.where(t > 0.0, e, jnp.where(j_idx <= a, greedy_r, 0))
        return e, a

    e, a = jax.vmap(per_row)(xw, probs, greedy, draft, temp, seed, gidx)
    m_raw = a + 1
    j_idx = jnp.arange(K)[None]
    is_eos = jnp.any(e[..., None] == eos[None, None, :], axis=-1)
    eos_hit = is_eos & (j_idx < m_raw[:, None])
    first_eos = jnp.min(jnp.where(eos_hit, j_idx, K), axis=1)
    m = jnp.minimum(jnp.minimum(m_raw, first_eos + 1), remaining)
    m = jnp.where(done, 0, m)
    eos_emitted = first_eos < m
    return e, m, eos_emitted


def pld_decode_loop(
    cfg: TDCConfig,
    params: Params,
    cache: Dict,
    first_token: jnp.ndarray,  # [B] int32 (sampled from prefill logits)
    prompt_ids: jnp.ndarray,  # [B, Lp] int32 right-padded prompt tokens
    prompt_len: jnp.ndarray,  # [B] int32 valid prompt lengths
    max_new_tokens: int,
    window: int = 8,
    ngram: int = 3,
    attn_impl: str = "xla",
    _bench_reject_drafts: bool = False,
) -> jnp.ndarray:
    """Greedy decode with prompt-lookup speculation; drop-in for
    serving.generate.decode_loop (same return contract: [B, max_new_tokens]
    int32, pad after EOS).  Each while-loop iteration runs ONE K-token
    verify forward and emits 1..K tokens.

    The cache must have >= window-1 slots of headroom past
    prompt_len + max_new_tokens (verify_step writes the whole window before
    acceptance is known; see models/lm.verify_step).

    _bench_reject_drafts: benchmarking hook ONLY (scripts/spec_bench.py) —
    replaces drafts with -1 so acceptance is always zero while every other
    cost (lookup, K-wide verify, scatters) still runs: the true worst-case
    floor, which synthetic weights cannot produce (any constant greedy
    stream self-matches its own grams within a few tokens).
    """
    B, Lp = prompt_ids.shape
    K = window
    if K < 2:
        raise ValueError("window must be >= 2 (1 draft minimum)")
    eos = jnp.asarray(cfg.lm.eos_token_ids, jnp.int32)
    pad = cfg.lm.pad_token_id
    C = Lp + max_new_tokens + 1
    brange = jnp.arange(B)

    hist = jnp.zeros((B, C), jnp.int32).at[:, :Lp].set(prompt_ids)
    hist = hist.at[brange, jnp.minimum(prompt_len, C - 1)].set(first_token)
    hist_len = prompt_len + 1

    out = jnp.full((B, max_new_tokens), pad, jnp.int32)
    out = out.at[:, 0].set(first_token)
    done0 = jnp.any(first_token[:, None] == eos[None, :], axis=-1)
    ne0 = jnp.ones((B,), jnp.int32)

    def cond(state):
        ne, _, _, _, _, done, _ = state
        return jnp.any(~done & (ne < max_new_tokens))

    def body(state):
        ne, last, hist, hist_len, cache, done, out = state
        draft, _ = propose_ngram(hist, hist_len, ngram, K - 1)
        if _bench_reject_drafts:
            draft = jnp.full_like(draft, -1)  # never equals an argmax (>= 0)
        tokens = jnp.concatenate([last[:, None], draft], axis=1)  # [B, K]
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], tokens, cfg.dtype)
        logits, cache = lm_mod.verify_step(
            cfg.lm, params["lm"], embeds, cache, attn_impl=attn_impl,
            dtype=cfg.dtype,
        )
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K]
        m, eos_emitted = accept_and_emit(
            g, draft, eos, max_new_tokens - ne, done
        )
        for j in range(K):  # static K; masked per-sample scatters
            sel = j < m
            pos = jnp.minimum(ne + j, max_new_tokens - 1)
            out = out.at[brange, pos].set(
                jnp.where(sel, g[:, j], out[brange, pos])
            )
            hpos = jnp.minimum(hist_len + j, C - 1)
            hist = hist.at[brange, hpos].set(
                jnp.where(sel, g[:, j], hist[brange, hpos])
            )
        cache = lm_mod.commit_verified(cache, m)
        new_last = jnp.take_along_axis(
            g, jnp.maximum(m - 1, 0)[:, None], axis=1
        )[:, 0]
        last = jnp.where(m > 0, new_last, last)
        return (
            ne + m,
            last,
            hist,
            hist_len + m,
            cache,
            done | eos_emitted,
            out,
        )

    state = (ne0, first_token, hist, hist_len, cache, done0, out)
    state = jax.lax.while_loop(cond, body, state)
    return state[-1]
