"""Multi-process (simulated multi-host) distributed tests.

SURVEY.md §4 demands "multi-host tests using JAX's multiprocess CPU
simulation": these launch REAL subprocess ranks (tests/multiproc_worker.py)
with `jax.distributed.initialize` over gloo CPU collectives, each rank with
its own virtual CPU devices — so 2 ranks x 4 devices exercises the same
global-mesh topology, cross-process allgather, per-host WAL, and rank-0
output gating as a 2-host TPU pod slice.  This is the TPU-native replacement
for the reference's `torchrun` + NCCL `init_process_group` +
`all_gather_object` flow (/root/reference/eval/eval_mlvu.py:129,151-156,
281-284; /root/reference/tdc/train.py:892).

Covered here:
  - eval DP: shard_samples / allgather_records / dump_results produce the
    same records and metrics as a single-process run;
  - crash-resume: a rank killed mid-shard resumes from its per-host WAL and
    the cluster still converges to the single-process records;
  - train: the full train CLI init path over a 2-process global mesh yields
    the same losses and the same final exported checkpoint as one process.
"""

import glob
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(mode, workdir, out_dir, nproc, local_devices=4, tag="run",
           rank_extra=None, timeout=1200, expect_ok=True):
    """Launch `nproc` worker ranks; return per-rank exit codes.

    Rank logs land in `workdir/log-{tag}-{rank}.txt` for post-mortem.  A rank
    that exceeds `timeout` is killed and reports rc -9 (a crashed peer can
    leave a survivor blocked in a gloo collective — that IS the multi-host
    failure mode, and the WAL on disk is what recovery runs from).
    """
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    # SimpleTokenizer hashes words to ids; without this, every rank (and the
    # solo baseline) would tokenize the same prompt differently
    env["PYTHONHASHSEED"] = "0"
    procs, logs = [], []
    for r in range(nproc):
        log = open(os.path.join(workdir, f"log-{tag}-{r}.txt"), "w")
        cmd = [
            sys.executable, WORKER, mode,
            "--coordinator", f"localhost:{port}",
            "--num_processes", str(nproc),
            "--process_id", str(r),
            "--local_devices", str(local_devices),
            "--workdir", workdir,
            "--out_dir", out_dir,
            "--tag", tag,
        ] + (rank_extra or {}).get(r, [])
        procs.append(
            subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                             env=env, cwd=HERE)
        )
        logs.append(log)
    rcs = []
    for p in procs:
        try:
            rcs.append(p.wait(timeout=timeout))
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            rcs.append(-9)
    for log in logs:
        log.close()
    if expect_ok and any(rc != 0 for rc in rcs):
        tails = []
        for r in range(nproc):
            with open(os.path.join(workdir, f"log-{tag}-{r}.txt")) as fh:
                tails.append(f"--- rank {r} ---\n" + "".join(fh.readlines()[-25:]))
        raise AssertionError(f"ranks exited {rcs}\n" + "\n".join(tails))
    return rcs


# ---------------------------------------------------------------------------
# Fixtures: a shared workdir with checkpoint, tokenizer, videos, samples, data
# ---------------------------------------------------------------------------


def write_offline_tokenizer(ckpt_dir):
    """HF-loadable WordLevel tokenizer written next to the checkpoint, so the
    train CLI's `AutoTokenizer.from_pretrained(model_path)` works with zero
    network.  Ids stay < tdc_tiny's vocab_size=512."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit

    words = (
        "You are a helpful assistant . ? ! What color is the video first "
        "frame red blue green square describe Describe shown answer with one "
        "word scene briefly moving shapes user system It looks like".split()
    )
    vocab = {"[UNK]": 3}
    for i, w in enumerate(dict.fromkeys(words)):
        vocab[w] = 10 + i
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = WhitespaceSplit()
    tok.add_special_tokens(["<|im_start|>", "<|im_end|>"])
    tok.save(os.path.join(ckpt_dir, "tokenizer.json"))
    with open(os.path.join(ckpt_dir, "tokenizer_config.json"), "w") as fh:
        json.dump(
            {"tokenizer_class": "PreTrainedTokenizerFast",
             "model_max_length": 512, "padding_side": "right"},
            fh,
        )


def make_workdir(root) -> str:
    from PIL import Image

    from tdc_video_tpu.config import tdc_tiny
    from test_builder import write_checkpoint

    workdir = str(root)
    ckpt = os.path.join(workdir, "ckpt")
    write_checkpoint(ckpt, tdc_tiny(), audio=False)
    write_offline_tokenizer(ckpt)

    # two distinct GIF videos for eval + a frame-dir video for training
    vids = []
    for v, base in enumerate(((200, 30, 30), (30, 30, 200))):
        path = os.path.join(workdir, f"v{v}.gif")
        ims = [
            Image.new("RGB", (64, 48), (base[0], base[1] + i * 30, base[2]))
            for i in range(5)
        ]
        ims[0].save(path, save_all=True, append_images=ims[1:], duration=500,
                    loop=0)
        vids.append(os.path.basename(path))
    frame_dir = os.path.join(workdir, "clip_frames")
    os.makedirs(frame_dir, exist_ok=True)
    for i in range(4):
        Image.new("RGB", (64, 48), (10 + i * 50, 120, 40)).save(
            os.path.join(frame_dir, f"{i:03d}.png")
        )

    samples = []
    for i in range(5):
        vid = vids[i % 2]
        samples.append(
            {
                "task_type": "count" if i % 2 == 0 else "order",
                "video": os.path.join(workdir, vid),
                "video_name": vid,
                "question": f"Q{i}: what is shown?",
                "prompt": (
                    f"Question: Q{i}: what is shown?\nOptions:\n(A) red\n"
                    "(B) blue\nRespond with only the letter."
                ),
                "answer": "A" if i % 2 == 0 else "B",
                "letters": ["A", "B"],
            }
        )
    with open(os.path.join(workdir, "samples.json"), "w") as fh:
        json.dump(samples, fh)

    rows = []
    for i in range(16):
        row = {
            "id": f"row{i}",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat color is the square ?"},
                {"from": "gpt", "value": "It is red ."},
            ],
        }
        if i % 2 == 0:
            row["video"] = "clip_frames"
        else:
            row["conversations"][0]["value"] = "Describe a scene briefly ."
        rows.append(row)
    with open(os.path.join(workdir, "data.json"), "w") as fh:
        json.dump(rows, fh)
    return workdir


@pytest.fixture(scope="module")
def mp_workdir(tmp_path_factory):
    return make_workdir(tmp_path_factory.mktemp("mp"))


def read_outputs(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "MLVU", "outputs-*.json")))
    assert files, f"no outputs in {out_dir}"
    with open(files[-1]) as fh:
        records = json.load(fh)
    return sorted(records, key=lambda r: (r["video_name"], r["question"]))


def read_rank_json(workdir, rank, tag):
    with open(os.path.join(workdir, f"rank{rank}-{tag}.json")) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def solo_eval(mp_workdir):
    """Single-process baseline records + metrics (the ground truth the
    2-process runs must reproduce)."""
    out = os.path.join(mp_workdir, "solo_eval")
    launch("eval", mp_workdir, out, nproc=1, local_devices=8, tag="solo")
    return read_outputs(out), read_rank_json(mp_workdir, 0, "solo")["metrics"]


# ---------------------------------------------------------------------------
# Eval DP
# ---------------------------------------------------------------------------


@pytest.mark.slow
class TestMultiProcessEval:
    def test_two_process_matches_single(self, mp_workdir, solo_eval):
        solo_records, solo_metrics = solo_eval
        out = os.path.join(mp_workdir, "mp_eval")
        launch("eval", mp_workdir, out, nproc=2, local_devices=4, tag="mp")

        r0 = read_rank_json(mp_workdir, 0, "mp")
        r1 = read_rank_json(mp_workdir, 1, "mp")
        assert r0["process_count"] == 2 and r1["process_count"] == 2
        assert r0["local_devices"] == 4
        # the 5 questions group into 2 per-video groups (3 + 2 questions),
        # round-robin sharded one group per rank
        assert sorted([r0["answered"], r1["answered"]]) == [2, 3]
        # every rank computes identical metrics from the allgathered records
        assert r0["metrics"] == solo_metrics
        assert r1["metrics"] == solo_metrics

        # rank-0's dumped records == the single-process records
        assert read_outputs(out) == solo_records
        # only rank 0 dumps (dump_results gates on process_index)
        assert not glob.glob(os.path.join(out, "MLVU", "outputs-*rank1*"))
        # WAL GC ran on both hosts after the successful dump
        assert not glob.glob(os.path.join(out, "MLVU", "wal-host*.jsonl"))

    def test_crash_one_rank_then_resume(self, mp_workdir, solo_eval):
        """Kill rank 1 after one answer; rank 0 is left partnerless at the
        allgather (killed by timeout / gloo error — the real multi-host
        failure mode).  A fresh 2-process run over the same out_dir resumes
        from both per-host WALs and reproduces the single-process records."""
        solo_records, solo_metrics = solo_eval
        out = os.path.join(mp_workdir, "mp_crash")
        rcs = launch(
            "eval", mp_workdir, out, nproc=2, local_devices=4, tag="crash",
            rank_extra={1: ["--crash_after", "1"]},
            timeout=420, expect_ok=False,
        )
        assert rcs[1] != 0  # injected os._exit(3)
        wals = {
            rank: sum(
                1 for _ in open(os.path.join(out, "MLVU", f"wal-host{rank}.jsonl"))
            )
            for rank in (0, 1)
            if os.path.exists(os.path.join(out, "MLVU", f"wal-host{rank}.jsonl"))
        }
        assert wals.get(1) == 1  # rank 1 persisted exactly its one answer

        # recovery run: fresh cluster, same out_dir
        launch("eval", mp_workdir, out, nproc=2, local_devices=4, tag="resume")
        r0 = read_rank_json(mp_workdir, 0, "resume")
        r1 = read_rank_json(mp_workdir, 1, "resume")
        # resumed ranks only re-answer what their WAL is missing
        assert r0["answered"] == 3 - wals.get(0, 0)
        assert r1["answered"] == 2 - 1
        assert r0["metrics"] == solo_metrics
        assert read_outputs(out) == solo_records


# ---------------------------------------------------------------------------
# Train
# ---------------------------------------------------------------------------


def read_losses(out_dir):
    path = os.path.join(out_dir, "metrics.jsonl")
    assert os.path.exists(path), f"missing {path}"
    with open(path) as fh:
        rows = [json.loads(line) for line in fh]
    return [(r["step"], r["loss"]) for r in rows if "loss" in r]


def load_final_params(out_dir):
    from safetensors.numpy import load_file

    files = sorted(glob.glob(os.path.join(out_dir, "final", "*.safetensors")))
    assert files, f"no final export in {out_dir}"
    out = {}
    for f in files:
        out.update(load_file(f))
    return out


@pytest.mark.slow
class TestMultiProcessTrain:
    def test_two_process_matches_single(self, mp_workdir):
        """Full train CLI (jax.distributed init -> global 4x2 mesh -> sharded
        steps -> rank-0 metrics -> replicated final export) across 2 processes
        equals the same run in 1 process with the same 8 global devices."""
        solo_out = os.path.join(mp_workdir, "solo_train")
        launch("train", mp_workdir, solo_out, nproc=1, local_devices=8,
               tag="train_solo")
        mp_out = os.path.join(mp_workdir, "mp_train")
        launch("train", mp_workdir, mp_out, nproc=2, local_devices=4,
               tag="train_mp")

        solo_losses = read_losses(solo_out)
        mp_losses = read_losses(mp_out)
        assert len(solo_losses) == len(mp_losses) > 0
        for (s_step, s_loss), (m_step, m_loss) in zip(solo_losses, mp_losses):
            assert s_step == m_step
            np.testing.assert_allclose(m_loss, s_loss, rtol=2e-4, atol=1e-5)

        # rank-1 must not have written metrics or the final export twice:
        # metrics.jsonl rows are unique per step
        steps = [s for s, _ in mp_losses]
        assert len(steps) == len(set(steps))

        solo_params = load_final_params(solo_out)
        mp_params = load_final_params(mp_out)
        assert solo_params.keys() == mp_params.keys()
        for k in solo_params:
            np.testing.assert_allclose(
                mp_params[k], solo_params[k], rtol=2e-4, atol=1e-5,
                err_msg=k,
            )
