"""Profiling utilities tests (the reference has no tracing at all —
SURVEY.md section 5)."""

import json
import os

import jax.numpy as jnp

from tdc_video_tpu.utils.profiling import StageTimer, annotate


def test_stage_timer_accumulates(tmp_path):
    t = StageTimer()
    with t.stage("decode"):
        sum(range(1000))
    with t.stage("decode"):
        sum(range(1000))
    out = t.timed("encode", lambda x: x * 2, jnp.ones((8, 8)))
    assert out.shape == (8, 8)
    s = t.summary()
    assert s["decode"]["count"] == 2
    assert s["encode"]["count"] == 1
    assert s["decode"]["total_s"] >= 0
    p = str(tmp_path / "prof.json")
    t.dump(p)
    assert json.load(open(p))["encode"]["mean_ms"] >= 0


def test_annotate_is_usable():
    with annotate("stage-x"):
        pass
