"""Training entrypoint.

Replaces `torchrun --nproc_per_node=8 tdc/train.py --flags`
(scripts/stage*/*.sh): one process per host, chips via the mesh.

    python -m tdc_video_tpu.train.run --stage 2 \
        --model_path checkpoints/stage1-out --data_path data.json \
        --image_folder /data/videos --output_dir checkpoints/stage2-out
"""

from __future__ import annotations

import argparse
import dataclasses

import jax


def main(argv=None):
    ap = argparse.ArgumentParser(description="TDC-Video TPU trainer")
    ap.add_argument("--stage", type=int, choices=(1, 2, 3), default=2)
    ap.add_argument("--model_path", required=True, help="checkpoint dir to start from")
    ap.add_argument("--data_path", required=True, help="supervised JSON")
    ap.add_argument("--image_folder", default="")
    ap.add_argument("--audio_folder", default="")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--bert_tokenizer", default="./checkpoints/bert-base-uncased")
    ap.add_argument("--learning_rate", type=float, default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--max_train_frames", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--model_max_length", type=int, default=None)
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--coordinator", default=None, help="jax.distributed coordinator addr")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument(
        "--profile",
        default=None,
        metavar="LOGDIR",
        help="capture a jax.profiler device trace of the training run into LOGDIR",
    )
    ap.add_argument(
        "--report_to", default=None, choices=["jsonl", "tensorboard", "none"],
        help="override the stage preset's metrics sink",
    )
    ap.add_argument(
        "--quantize_frozen", default=None, choices=["int8"],
        help="store the frozen base (LM minus embeddings, frozen towers) as "
        "weight-only int8 during LoRA training (QLoRA analog) — fits the "
        "stage-3 reference shape on one 16 GB v5e chip (PERF.md round 5)",
    )
    args = ap.parse_args(argv)

    if args.coordinator:
        jax.distributed.initialize(
            args.coordinator, args.num_processes, args.process_id
        )

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # after distributed init (must not touch backend)

    from ..builder import load_pretrained_model
    from .dataset import Collator, SupervisedDataset, data_iterator
    from .runner_utils import hf_tokenizer_protocol
    from .stages import STAGES
    from .trainer import Trainer

    tcfg = STAGES[args.stage](args.output_dir)
    overrides = {}
    for f in ("learning_rate", "max_steps", "max_train_frames", "model_max_length"):
        v = getattr(args, f)
        if v is not None:
            overrides[f] = v
    if args.batch_size is not None:
        overrides["per_device_train_batch_size"] = args.batch_size
    if args.report_to is not None:
        overrides["report_to"] = args.report_to
    if args.quantize_frozen is not None:
        overrides["quantize_frozen"] = args.quantize_frozen
    tcfg = dataclasses.replace(tcfg, output_dir=args.output_dir, **overrides)

    tokenizer, model, _, _ = load_pretrained_model(args.model_path)
    bert_tok = None
    if args.bert_tokenizer:
        try:
            from transformers import BertTokenizer

            bert_tok = BertTokenizer.from_pretrained(
                args.bert_tokenizer, truncation_side="right"
            )
        except Exception as e:  # pragma: no cover
            print(f"no bert tokenizer ({e}); compression runs unconditioned")

    ds = SupervisedDataset(
        args.data_path,
        model.cfg,
        hf_tokenizer_protocol(tokenizer),
        image_folder=args.image_folder,
        audio_folder=args.audio_folder,
        max_frames=tcfg.max_train_frames,
    )
    n_data = len(jax.devices())  # upper bound; trainer refines via its mesh
    global_bs = tcfg.per_device_train_batch_size * max(n_data, 1)
    steps_per_epoch = max(1, len(ds) // global_bs)
    total = tcfg.max_steps or steps_per_epoch * tcfg.num_train_epochs

    trainer = Trainer(model.cfg, tcfg, model.params, total_steps=total)
    # the trainer owns (and under --quantize_frozen REPLACES) the param
    # tree; drop the loader's reference so the original float base does not
    # stay resident next to the int8 copy (9.5 GB at 3B — runtime OOM on a
    # single chip, PERF.md round 5)
    model.params = None
    start_step = 0
    if args.resume and trainer.restore_if_available():
        start_step = trainer.step
        print(f"resumed at step {start_step}")

    collator = Collator(
        model.cfg,
        bert_tokenizer=bert_tok,
        max_len=tcfg.model_max_length,
        max_frames=tcfg.max_train_frames,
    )
    batches = data_iterator(
        ds,
        collator,
        batch_size=trainer.n_data * tcfg.per_device_train_batch_size,
        seed=tcfg.seed,
        epochs=tcfg.num_train_epochs,
        group_by_modality_length=tcfg.group_by_modality_length,
        start_step=start_step,
    )
    if args.profile:
        from ..utils.profiling import trace

        with trace(args.profile):
            trainer.fit(batches)
    else:
        trainer.fit(batches)

    # Final artifact in the reference layout (LoRA baked in), next to the
    # Orbax train state — the save_pretrained step of the reference
    # (tdc/train.py:1277-1294).  Multi-host: params are sharded across
    # processes, so replicate them through one jitted identity (GSPMD
    # all-gather over ICI/DCN) before the rank-0 host writes the file.
    import os

    from ..convert.to_hf import save_checkpoint_dir

    merged = trainer.export_merged()
    if jax.process_count() > 1:
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(trainer.mesh, PartitionSpec())
        merged = jax.jit(lambda p: p, out_shardings=rep)(merged)
        merged = jax.tree_util.tree_map(np.asarray, merged)
    final = os.path.join(tcfg.output_dir, "final")
    if jax.process_index() == 0:
        save_checkpoint_dir(merged, model.cfg, final)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tdc_final_export")
    print(f"done at step {trainer.step}; checkpoints in {tcfg.output_dir}; final model in {final}")


if __name__ == "__main__":
    main()
