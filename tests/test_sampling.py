"""Sampling parity for the demo path (serving/generate.py): the reference
demo generates with HF `do_sample=True, temperature=0.2`
(/root/reference/main.py:64-65), which applies HF's default top_k=50
filtering; greedy remains the eval default (eval_mlvu.py:232-233)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.serving.generate import (
    sample_logits,
    top_k_filter,
    top_p_filter,
)


def test_top_k_keeps_exactly_k():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 3, (4, 100)), jnp.float32)
    out = np.asarray(top_k_filter(logits, 10))
    finite = np.isfinite(out)
    assert (finite.sum(-1) == 10).all()
    # the kept entries are the 10 largest per row
    for r in range(4):
        top = set(np.argsort(np.asarray(logits[r]))[-10:])
        assert set(np.where(finite[r])[0]) == top


def test_top_p_nucleus_rule():
    """HF TopPLogitsWarper keeps the smallest descending-probability prefix
    whose mass reaches p (the crossing token is kept)."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]], jnp.float32))
    out = np.asarray(top_p_filter(logits, 0.7))
    # 0.5 < 0.7, 0.5+0.3 crosses -> keep {0.5, 0.3}, drop the rest
    assert np.isfinite(out[0, :2]).all()
    assert np.isinf(out[0, 2:]).all()
    out = np.asarray(top_p_filter(logits, 0.95))
    assert np.isfinite(out[0, :3]).all() and np.isinf(out[0, 3]).all()


def test_temperature_zero_is_greedy():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(0, 1, (3, 50)), jnp.float32)
    out = sample_logits(logits, jax.random.PRNGKey(0), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits).argmax(-1))


def test_top_k_one_is_greedy_at_any_temperature():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(0, 1, (3, 50)), jnp.float32)
    out = sample_logits(logits, jax.random.PRNGKey(3), temperature=1.7, top_k=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits).argmax(-1))


def test_samples_stay_inside_nucleus():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(0, 4, (1, 200)), jnp.float32)
    kept = np.where(np.isfinite(np.asarray(top_k_filter(logits, 5))[0]))[0]
    for i in range(20):
        t = sample_logits(logits, jax.random.PRNGKey(i), temperature=1.0, top_k=5)
        assert int(t[0]) in kept


def test_sampled_decode_fixed_key_deterministic():
    """generate_text_only with do_sample settings is reproducible for a fixed
    key and emits only valid tokens."""
    from tdc_video_tpu.config import tdc_tiny
    from tdc_video_tpu.model import init_tdc
    from tdc_video_tpu.serving.generate import generate_text_only

    cfg = tdc_tiny()
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(2, 50, (1, 8)), jnp.int32)
    mask = jnp.ones(ids.shape, jnp.bool_)
    kw = dict(max_new_tokens=6, temperature=0.2, top_k=50, top_p=0.9)
    a = generate_text_only(cfg, params, ids, mask, key=jax.random.PRNGKey(7), **kw)
    b = generate_text_only(cfg, params, ids, mask, key=jax.random.PRNGKey(7), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ((np.asarray(a) >= 0) & (np.asarray(a) < cfg.lm.vocab_size)).all()


def test_filter_rows_top_p_one_is_no_op():
    """top_p >= 1 must disable nucleus filtering EXACTLY (HF skips the TopP
    warper at 1.0): a near-one-hot row saturates the f32 cumsum to 1.0
    before the tail, which used to -inf genuine tail tokens (ADVICE r4)."""
    from tdc_video_tpu.serving.generate import filter_rows

    # p0 ~ 1 - 7e-9: cumsum hits exactly 1.0 in f32 at index 0
    logits = jnp.asarray([[20.0] + [0.0] * 7], jnp.float32)
    out = np.asarray(
        filter_rows(
            logits,
            jnp.asarray([1.0], jnp.float32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([1.0], jnp.float32),
        )
    )
    assert np.isfinite(out).all()  # nothing masked at top_p=1.0
    # and top_p < 1 still filters
    out2 = np.asarray(
        filter_rows(
            logits,
            jnp.asarray([1.0], jnp.float32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([0.9], jnp.float32),
        )
    )
    assert np.isfinite(out2[0, 0]) and not np.isfinite(out2[0, 1:]).any()
