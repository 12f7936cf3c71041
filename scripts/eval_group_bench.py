"""End-to-end eval throughput: grouped engine admission vs one-at-a-time.

Runs the REAL harness path (eval/harness.run_benchmark: host video decode ->
tower encode (feature-cached per video) -> per-question compression+packing ->
prefill -> greedy decode -> WAL records) over an MLVU-style sample set on one
chip, comparing batch_slots=0 (per-question generate, the reference loop
shape, eval_mlvu.py:161-238) against batch_slots=N (grouped continuous-
batching admission with shared-prefix prefill).  The engine-level win was
measured in isolation (PERF.md "Shared-prefix admission"); this script shows
it end-to-end in questions/min, with record identity checked across modes.

Structural int8 zeros weights passed as jit args (honest; PERF.md rules).
Each mode runs twice; the second (warm-compile) run is the reported number.

Usage: python scripts/eval_group_bench.py [minutes] [questions] [slots] [7b|3b|tiny]
"""
import glob
import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import dataclasses

import numpy as np
import jax.numpy as jnp


class HashTok:
    """Offline word-hash tokenizer (the tests' SimpleTokenizer shape): real
    HF tokenizers need downloaded vocabs this environment cannot fetch."""

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        specials = {"<|im_start|>": 201, "<|im_end|>": 202, "\n": 198}
        pat = "|".join(map(re.escape, specials)) + r"|\n"
        ids = []
        for piece in re.split(f"({pat})", text):
            if not piece:
                continue
            if piece in specials:
                ids.append(specials[piece])
            else:
                ids.extend(1000 + (hash(w) % 30000) for w in piece.split(" ") if w)
        return self._Out(ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"tok{int(i)}" for i in ids)


def main():
    from tdc_video_tpu import config as C
    from tdc_video_tpu.eval.harness import run_benchmark
    from tdc_video_tpu.eval.runner import TDCPredictor
    from tdc_video_tpu.media.io import encode_test_video
    from tdc_video_tpu.model import init_tdc
    from tdc_video_tpu.models.quant import quantize_lm_int8, quantize_vit_int8

    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    slots = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    which = sys.argv[4] if len(sys.argv) > 4 else "7b"

    path = os.path.join(tempfile.gettempdir(), f"stream_fixture_{int(minutes)}m.mp4")
    if not os.path.exists(path):
        encode_test_video(path, 480, 360, fps=24.0, n_frames=int(minutes * 60 * 24))
        print(f"fixture: {path} ({os.path.getsize(path)/1e6:.1f} MB)")

    cfg = {"7b": C.tdc_qwen2_7b, "3b": C.tdc_llama32_3b, "tiny": C.tdc_tiny}[which]()
    if which != "tiny":
        cfg = dataclasses.replace(cfg, param_dtype=jnp.bfloat16)

    shapes = jax.eval_shape(lambda: init_tdc(jax.random.PRNGKey(0), cfg))
    shapes["siglip"] = jax.eval_shape(quantize_vit_int8, shapes["siglip"])
    shapes["dino"] = jax.eval_shape(quantize_vit_int8, shapes["dino"])
    shapes["lm"] = jax.eval_shape(quantize_lm_int8, shapes["lm"])
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    opts = "Options:\n(A) red\n(B) blue\n(C) green\n(D) yellow\n"
    tail = "Respond with only the letter (A, B, C or D) of the correct option."
    samples = [
        {
            "task_type": "plotQA",
            "video": path,
            "video_name": os.path.basename(path),
            "question": f"Q{i}: what dominant color appears in scene {i}?",
            "prompt": f"Question: Q{i}: what dominant color appears in scene {i}?\n{opts}{tail}",
            "answer": "A",
            "letters": ["A", "B", "C", "D"],
        }
        for i in range(n_q)
    ]

    results = {}
    for mode, bs in (("solo", 0), ("grouped", slots)):
        predictor = TDCPredictor(
            cfg, params, HashTok(), max_new_tokens=5, max_eval_frames=1000,
        )
        recs = {}
        for attempt in ("cold", "warm"):
            out = tempfile.mkdtemp(prefix=f"evalgrp_{mode}_{attempt}_")
            t0 = time.perf_counter()
            run_benchmark("mlvu", predictor, samples, out_dir=out, batch_slots=bs)
            dt = time.perf_counter() - t0
            files = glob.glob(os.path.join(out, "MLVU", "outputs-*.json"))
            with open(files[0]) as fh:
                recs = {r["question"]: (r["raw"], r["pred"]) for r in json.load(fh)}
            print(f"{mode:8s} {attempt}: {dt:7.1f}s  "
                  f"{n_q / dt * 60:6.1f} questions/min", flush=True)
            shutil.rmtree(out, ignore_errors=True)
            results[(mode, attempt)] = dt
        results[mode + "_recs"] = recs
        eng = list(predictor._engine_cache.values())
        if eng:
            print(f"  engine: prefix_prefills={eng[-1].prefix_prefills} "
                  f"steps={eng[-1].steps}")

    same = results["solo_recs"] == results["grouped_recs"]
    s, g = results[("solo", "warm")], results[("grouped", "warm")]
    print(f"\nwarm: solo {n_q/s*60:.1f} q/min, grouped {n_q/g*60:.1f} q/min "
          f"-> {s/g:.2f}x; records identical: {same}")
    if not same:
        raise SystemExit("record mismatch between modes")


if __name__ == "__main__":
    main()
