"""Continuous-batching decode engine tests (serving/batching.py): staggered
requests sharing one decode loop must reproduce the single-request greedy
outputs (reference capability ceiling: one request at a time,
tdc/cambrian_qwen.py:441-457)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.model import init_tdc
from tdc_video_tpu.serving.batching import DecodeEngine, Request
from tdc_video_tpu.serving.generate import generate_text_only


@pytest.fixture(scope="module")
def setup():
    cfg = tdc_tiny()
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _req(cfg, params, ids, max_new):
    ids = np.asarray(ids, np.int32)[None]
    from tdc_video_tpu.models.lm import embed_tokens

    embeds = embed_tokens(cfg.lm, params["lm"], jnp.asarray(ids), cfg.dtype)
    mask = jnp.ones(ids.shape, jnp.bool_)
    return Request(embeds=embeds, attn_mask=mask, max_new_tokens=max_new, uid=tuple(ids[0]))


def _solo(cfg, params, ids, max_new):
    ids = np.asarray(ids, np.int32)[None]
    out = generate_text_only(
        cfg, params, jnp.asarray(ids), jnp.ones(ids.shape, jnp.bool_), max_new_tokens=max_new
    )
    toks = []
    for t in np.asarray(out)[0]:
        t = int(t)
        toks.append(t)
        if t in cfg.lm.eos_token_ids:
            break
        if t == cfg.lm.pad_token_id and len(toks) > 1:
            toks.pop()
            break
    return toks


class TestDecodeEngine:
    def test_two_staggered_requests_share_loop(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(0)
        ids_a = rng.integers(2, 90, 7)
        ids_b = rng.integers(2, 90, 11)
        solo_a = _solo(cfg, params, ids_a, 12)
        solo_b = _solo(cfg, params, ids_b, 12)

        eng = DecodeEngine(cfg, params, num_slots=2, capacity=64, chunk_tokens=4)
        eng.submit(_req(cfg, params, ids_a, 12))
        # run one admission+chunk, then submit the second mid-flight
        eng._admit()
        budget_before = eng._budget.copy()
        eng.cache, eng._last_tok, eng._active, budget, toks = eng._jchunk(
            eng.params, eng.cache, eng._last_tok, eng._active, jnp.asarray(eng._budget)
        )
        eng._budget = np.array(budget)
        eng.steps += 1
        eng._harvest(np.asarray(toks), budget_before)
        eng.submit(_req(cfg, params, ids_b, 12))
        done = eng.run()

        by_uid = {r.uid: r.tokens for r in done}
        assert by_uid[tuple(ids_a)] == solo_a
        assert by_uid[tuple(ids_b)] == solo_b
        # both requests decoded through the SAME chunked loop
        assert eng.steps >= 2

    def test_more_requests_than_slots(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(1)
        reqs = [rng.integers(2, 90, rng.integers(4, 10)) for _ in range(5)]
        solos = [_solo(cfg, params, r, 8) for r in reqs]
        eng = DecodeEngine(cfg, params, num_slots=2, capacity=64, chunk_tokens=4)
        for r in reqs:
            eng.submit(_req(cfg, params, r, 8))
        done = eng.run()
        assert len(done) == 5
        by_uid = {r.uid: r.tokens for r in done}
        for r, s in zip(reqs, solos):
            assert by_uid[tuple(np.asarray(r, np.int32))] == s

    def test_slot_reuse_after_finish(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(2)
        a = rng.integers(2, 90, 5)
        eng = DecodeEngine(cfg, params, num_slots=1, capacity=64, chunk_tokens=4)
        eng.submit(_req(cfg, params, a, 6))
        done1 = eng.run()
        assert len(done1) == 1
        b = rng.integers(2, 90, 9)
        eng.submit(_req(cfg, params, b, 6))
        done2 = eng.run()
        assert len(done2) == 1
        assert done2[0].tokens == _solo(cfg, params, b, 6)


class TestCapacityAndQueueDrain:
    def test_budget_truncated_to_capacity(self, setup):
        """A request whose prompt+max_new_tokens exceeds cache capacity is
        truncated (never silently overwrites the last KV row)."""
        cfg, params = setup
        rng = np.random.default_rng(7)
        eng = DecodeEngine(cfg, params, num_slots=2, capacity=24, chunk_tokens=4)
        req = _req(cfg, params, rng.integers(2, 50, (18,)), 64)
        eng.submit(req)
        done = eng.run()
        assert len(done) == 1
        # first token + (capacity - L) decode steps is the hard ceiling
        assert len(done[0].tokens) <= 1 + (24 - 18)

    def test_prefill_terminated_queue_drains(self, setup):
        """Requests finishing at prefill (max_new_tokens=1) must not strand
        the rest of the queue (run() used to break when no slot was active)."""
        cfg, params = setup
        rng = np.random.default_rng(8)
        eng = DecodeEngine(cfg, params, num_slots=1, capacity=32, chunk_tokens=4)
        uids = []
        for i in range(3):
            r = _req(cfg, params, rng.integers(2, 50, (5 + i,)), 1)
            uids.append(r.uid)
            eng.submit(r)
        done = eng.run()
        assert sorted(r.uid for r in done) == sorted(uids)
        assert all(len(r.tokens) == 1 for r in done)
