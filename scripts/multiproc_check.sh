#!/usr/bin/env bash
# 2-process (simulated 2-host) distributed smoke check.
#
# Launches real `jax.distributed.initialize` subprocess ranks over gloo CPU
# collectives (tests/multiproc_worker.py) and asserts:
#   eval  — 2-rank DP run reproduces the single-process records and metrics
#           byte-for-byte (shard_samples / allgather_records / rank-0 dump);
#   train — 2-rank sharded training through the train CLI matches the
#           single-process losses and final exported params.
#
# This is the operator-facing form of tests/test_multiprocess.py — the
# TPU-native replacement for the reference's `torchrun --nproc_per_node` NCCL
# flow (/root/reference/eval/eval_mlvu.py:129,281-284;
# /root/reference/tdc/train.py:892).  Runtime: ~15 min on a 1-core host
# (dominated by per-rank XLA compiles).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONHASHSEED=0

python - <<'PY'
import os, shutil, sys, tempfile

import numpy as np

sys.path.insert(0, os.path.abspath("tests"))
sys.path.insert(0, os.path.abspath("."))
from test_multiprocess import (
    launch, make_workdir, read_losses, read_outputs, read_rank_json,
    load_final_params,
)

root = tempfile.mkdtemp(prefix="tdc_mp_check.")
try:
    workdir = make_workdir(root)

    print("[1/4] solo eval (baseline)...", flush=True)
    solo_out = os.path.join(workdir, "solo_eval")
    launch("eval", workdir, solo_out, nproc=1, local_devices=8, tag="solo")
    solo_records = read_outputs(solo_out)
    solo_metrics = read_rank_json(workdir, 0, "solo")["metrics"]

    print("[2/4] 2-process eval...", flush=True)
    mp_out = os.path.join(workdir, "mp_eval")
    launch("eval", workdir, mp_out, nproc=2, local_devices=4, tag="mp")
    for rank in (0, 1):
        assert read_rank_json(workdir, rank, "mp")["metrics"] == solo_metrics
    assert read_outputs(mp_out) == solo_records
    print("      eval DP parity OK "
          f"({len(solo_records)} records, metrics {solo_metrics})", flush=True)

    print("[3/4] solo train (baseline)...", flush=True)
    solo_tr = os.path.join(workdir, "solo_train")
    launch("train", workdir, solo_tr, nproc=1, local_devices=8, tag="tr_solo")

    print("[4/4] 2-process train...", flush=True)
    mp_tr = os.path.join(workdir, "mp_train")
    launch("train", workdir, mp_tr, nproc=2, local_devices=4, tag="tr_mp")
    solo_losses, mp_losses = read_losses(solo_tr), read_losses(mp_tr)
    assert len(solo_losses) == len(mp_losses) > 0
    for (ss, sl), (ms, ml) in zip(solo_losses, mp_losses):
        assert ss == ms
        np.testing.assert_allclose(ml, sl, rtol=2e-4, atol=1e-5)
    sp, mp = load_final_params(solo_tr), load_final_params(mp_tr)
    assert sp.keys() == mp.keys()
    for k in sp:
        np.testing.assert_allclose(mp[k], sp[k], rtol=2e-4, atol=1e-5, err_msg=k)
    print(f"      train parity OK ({len(mp_losses)} steps, "
          f"{len(sp)} exported tensors)", flush=True)
    print("multiproc_check: ALL OK", flush=True)
finally:
    shutil.rmtree(root, ignore_errors=True)
PY
