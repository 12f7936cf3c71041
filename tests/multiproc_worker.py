"""Multi-process CPU worker: one rank of a simulated multi-host cluster.

Launched as a subprocess by tests/test_multiprocess.py (and by
scripts/multiproc_check.sh) with a real `jax.distributed.initialize` process
group over gloo CPU collectives — the TPU-native replacement for the
reference's `torchrun` NCCL init (/root/reference/tdc/train.py:892,
/root/reference/eval/eval_mlvu.py:129).  Each rank gets its own process with
`--local_devices` virtual CPU devices, so 2 ranks x 4 devices exercises the
same global-mesh/collective topology as a 2-host x 4-chip pod slice.

Modes:
  eval  — run_benchmark over a shared sample list: shard_samples round-robin,
          per-host WAL, allgather_records, rank-0 dump_results.  Crash
          injection: --crash_after K kills THIS rank after K answered
          samples (mid-run kill); --crash_before_gather kills it after its
          shard is answered but before the collective (cluster kill).
  train — tdc_video_tpu.train.run CLI with --coordinator: the full
          distributed training init path, sharded over the global mesh.

Not a pytest file (no test_ prefix): pytest must not collect it.
"""

import argparse
import json
import os
import sys

# launched as `python tests/multiproc_worker.py`, so sys.path[0] is tests/;
# the package root must be added by hand (the worker forces the CPU platform,
# so the PYTHONPATH/axon-discovery interaction in CLAUDE.md does not apply)
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def setup_jax(args):
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # skip axon TPU registration
    os.environ["JAX_PLATFORMS"] = "cpu"
    # override (not append): a parent pytest process exports
    # --xla_force_host_platform_device_count=8 via tests/conftest.py and the
    # subprocess inherits XLA_FLAGS, so stale values must be stripped first
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={args.local_devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-process CPU collectives (allgather, psum) ride gloo — the CPU
    # stand-in for the ICI/DCN collectives a real multi-host TPU slice uses
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if args.num_processes > 1:
        jax.distributed.initialize(
            args.coordinator, args.num_processes, args.process_id
        )
    return jax


def run_eval(args, jax):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_eval import SimpleTokenizer

    from tdc_video_tpu.builder import load_pretrained_model
    from tdc_video_tpu.eval import harness
    from tdc_video_tpu.eval.runner import TDCPredictor

    with open(os.path.join(args.workdir, "samples.json")) as fh:
        samples = json.load(fh)

    _, model, _, _ = load_pretrained_model(
        os.path.join(args.workdir, "ckpt"), load_tokenizer=False
    )
    predictor = TDCPredictor(
        model.cfg, model.params, SimpleTokenizer(), max_new_tokens=3,
        text_bucket=128,
    )

    if args.crash_after >= 0:
        real_answer = predictor.answer
        state = {"n": 0}

        def crashing_answer(*a, **kw):
            if state["n"] >= args.crash_after:
                print(f"[rank {args.process_id}] injected crash after "
                      f"{state['n']} answers", flush=True)
                os._exit(3)  # hard kill: no WAL cleanup, no gather
            state["n"] += 1
            return real_answer(*a, **kw)

        predictor.answer = crashing_answer

    if args.crash_before_gather:
        def crash_gather(records):
            print(f"[rank {args.process_id}] injected crash before gather "
                  f"({len(records)} records in WAL)", flush=True)
            os._exit(3)

        harness.allgather_records = crash_gather

    metrics = harness.run_benchmark(
        "mlvu", predictor, samples, out_dir=args.out_dir,
    )
    with open(
        os.path.join(args.workdir, f"rank{args.process_id}-{args.tag}.json"), "w"
    ) as fh:
        json.dump(
            {
                "metrics": metrics,
                "answered": predictor.stats.samples,
                "process_count": jax.process_count(),
                "local_devices": jax.local_device_count(),
            },
            fh,
        )
    print(f"[rank {args.process_id}] eval done: {metrics}", flush=True)


def run_train(args, jax):
    # the train mode goes through the REAL CLI init path; distributed init
    # is done above by setup_jax (the CLI would do the same via
    # --coordinator, but init must happen exactly once per process)
    from tdc_video_tpu.train import run as train_run

    train_run.main(
        [
            "--stage", "2",
            "--model_path", os.path.join(args.workdir, "ckpt"),
            "--data_path", os.path.join(args.workdir, "data.json"),
            "--image_folder", args.workdir,
            "--output_dir", args.out_dir,
            "--bert_tokenizer", "",
            "--max_steps", str(args.max_steps),
            "--model_max_length", "160",
            "--max_train_frames", "4",
            "--report_to", "jsonl",
        ]
    )
    with open(
        os.path.join(args.workdir, f"rank{args.process_id}-{args.tag}.json"), "w"
    ) as fh:
        json.dump(
            {
                "process_count": jax.process_count(),
                "local_devices": jax.local_device_count(),
            },
            fh,
        )
    print(f"[rank {args.process_id}] train done", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["eval", "train"])
    ap.add_argument("--coordinator", default="localhost:29800")
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--tag", default="run")
    ap.add_argument("--crash_after", type=int, default=-1)
    ap.add_argument("--crash_before_gather", action="store_true")
    ap.add_argument("--max_steps", type=int, default=2)
    args = ap.parse_args()

    jax = setup_jax(args)
    if args.mode == "eval":
        run_eval(args, jax)
    else:
        run_train(args, jax)


if __name__ == "__main__":
    main()
