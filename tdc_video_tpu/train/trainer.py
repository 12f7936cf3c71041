"""Trainer: freeze policies, per-module LR groups, LoRA, sharded step,
Orbax checkpoints, resume, metrics logging.

Replaces the HF Trainer + FSDP/DeepSpeed stack (tdc/mm_trainer.py:206,
tdc/train.py:891-1294) with one jitted train step over a GSPMD mesh:

* freeze policy (train.py:1143-1166 + tower/audio flags) -> an optax mask;
* per-module LR (mm_trainer.py:246-484: projector / vision-sampler / tower
  groups, LayerNorm+bias excluded from weight decay) -> optax.multi_transform;
* LoRA (train.py:955-996) -> train/lora.py delta params;
* cosine schedule with warmup_ratio (stage scripts);
* Orbax checkpoints with save_total_limit + resume-if-checkpoint
  (train.py:1269-1273);
* metrics: JSONL + optional TensorBoard (train.py:53-62 TensorBoardCallback).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import TDCConfig
from ..model import tdc_loss
from ..parallel.mesh import auto_mesh_shape, make_mesh, warmup_collectives
from ..parallel.sharding import batch_spec, shard_tree, tdc_param_spec, to_named
from . import lora as lora_lib

Params = Any


@dataclass(frozen=True)
class TrainConfig:
    """Stage knobs (names follow the reference flags, scripts/stage*/*.sh)."""

    output_dir: str = "./checkpoints/out"
    learning_rate: float = 5e-6
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"
    num_train_epochs: int = 1
    per_device_train_batch_size: int = 1
    gradient_accumulation_steps: int = 2
    save_steps: int = 1000
    save_total_limit: int = 1
    logging_steps: int = 1
    max_steps: Optional[int] = None
    grad_clip: float = 1.0
    seed: int = 42
    # host/device overlap: batches buffered ahead by the fit() prefetch
    # thread (the reference's dataloader_num_workers analog, train.py:1236)
    prefetch_batches: int = 2

    # per-module LRs (mm_trainer.py:262-263: projector/sampler mutually excl.)
    mm_projector_lr: Optional[float] = None
    mm_vision_sampler_lr: Optional[float] = None
    mm_vision_tower_lr: Optional[float] = None

    # freeze policy
    freeze_backbone: bool = False
    tune_mm_mlp_adapter: bool = False
    freeze_mm_mlp_adapter: bool = False
    unfreeze_mm_vision_tower: bool = False
    unfreeze_mm_compressor: bool = True
    unfreeze_audio_encoder: bool = False

    # LoRA (stage 3)
    lora_enable: bool = False
    lora_r: int = 128
    lora_alpha: int = 256
    # QLoRA-style: store the FROZEN base (LM minus embeddings, fully-frozen
    # towers/BEATs) as weight-only int8 ("int8") instead of bf16 — halves the
    # resident base bytes (3B: 9.5 -> ~5 GB), which is what lets the stage-3
    # reference shape train on one 16 GB v5e chip (PERF.md round 5).  LoRA
    # deltas stay full precision (models/layers.linear "w_q"+"lora_a" path).
    # Requires lora_enable.  None = keep the base in param_dtype.
    quantize_frozen: Optional[str] = None

    # shapes
    model_max_length: int = 8192
    max_train_frames: int = 64
    max_visual_len: int = 4096
    # chunked CE: cap live logits at [B, loss_chunk, V] instead of the full
    # [B, T, V] f32 (~4.2 GB/buffer at 8k x 128k vocab); None = unchunked
    loss_chunk: Optional[int] = None

    group_by_modality_length: bool = True
    report_to: str = "jsonl"  # "jsonl" | "tensorboard" | "none"
    # None -> platform default ("flash" on TPU, "xla" elsewhere)
    attn_impl: Optional[str] = None


def _path_names(path):
    return [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]


def trainable_mask(params: Params, tcfg: TrainConfig) -> Params:
    """True = leaf receives gradients (reference requires_grad policy)."""

    def rule(path, leaf):
        names = _path_names(path)
        top = names[0]
        if top in ("siglip", "dino"):
            return tcfg.unfreeze_mm_vision_tower
        if top == "beats":
            return tcfg.unfreeze_audio_encoder
        if top == "compressor":
            return tcfg.unfreeze_mm_compressor
        if top == "lm":
            if tcfg.freeze_backbone or tcfg.lora_enable:
                return False
            if tcfg.tune_mm_mlp_adapter:
                return False
            return True
        if top == "sva":
            if tcfg.freeze_mm_mlp_adapter and "mm_projector" in names:
                return False
            return True
        # image_newline, audio_proj, ...
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def lr_group(path_names, tcfg: TrainConfig) -> str:
    """Optimizer group label (mm_trainer.py:264-484 name-substring groups)."""
    joined = "/".join(path_names)
    if tcfg.mm_projector_lr is not None and "mm_projector" in joined:
        return "projector"
    if tcfg.mm_vision_sampler_lr is not None and (
        "samplers" in joined or "vision_query" in joined
    ):
        return "sampler"
    if tcfg.mm_vision_tower_lr is not None and path_names[0] in ("siglip", "dino"):
        return "tower"
    return "base"


def _no_decay(path_names) -> bool:
    """LayerNorm/bias excluded from weight decay (mm_trainer.py:261-262)."""
    last = path_names[-1]
    return last in ("b", "bias", "scale") or "norm" in "/".join(path_names).lower()


def make_schedule(tcfg: TrainConfig, total_steps: int, base_lr: float):
    warmup = max(1, int(total_steps * tcfg.warmup_ratio))
    if tcfg.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, max(total_steps, warmup + 1)
        )
    # HF "linear": warmup to base_lr then linear decay to 0 over the rest
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup),
            optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup, 1)),
        ],
        [warmup],
    )


def _zero_frozen_grads(trainable: Params) -> optax.GradientTransformation:
    """Zero frozen-leaf gradients BEFORE clip_by_global_norm so frozen leaves
    do not inflate the global norm and over-clip the trainable updates (the
    reference clips over trainable params only: torch clip_grad_norm_ runs on
    parameters with requires_grad, tdc/mm_trainer.py optimizer setup)."""

    def update(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g, t: g if t else jnp.zeros_like(g), updates, trainable
        )
        return updates, state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def build_optimizer(params: Params, tcfg: TrainConfig, total_steps: int):
    """Masked, grouped AdamW with cosine schedule + grad accumulation."""
    mask = trainable_mask(params, tcfg)
    group_lrs = {
        "base": tcfg.learning_rate,
        "projector": tcfg.mm_projector_lr or tcfg.learning_rate,
        "sampler": tcfg.mm_vision_sampler_lr or tcfg.learning_rate,
        "tower": tcfg.mm_vision_tower_lr or tcfg.learning_rate,
    }

    flat_mask = dict(jax.tree_util.tree_leaves_with_path(mask))

    def label(path, leaf):
        if not flat_mask[path]:
            return "frozen"
        names = _path_names(path)
        g = lr_group(names, tcfg)
        d = "nd" if _no_decay(names) else "wd"
        return f"{g}:{d}"

    labels = jax.tree_util.tree_map_with_path(label, params)
    transforms = {"frozen": optax.set_to_zero()}
    for g, lr in group_lrs.items():
        for d, wd in (("wd", tcfg.weight_decay), ("nd", 0.0)):
            transforms[f"{g}:{d}"] = optax.adamw(
                make_schedule(tcfg, total_steps, lr), weight_decay=wd
            )
    tx = optax.chain(
        _zero_frozen_grads(mask),
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.multi_transform(transforms, labels),
    )
    if tcfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, tcfg.gradient_accumulation_steps)
    return tx, mask


class Trainer:
    def __init__(
        self,
        cfg: TDCConfig,
        tcfg: TrainConfig,
        params: Params,
        total_steps: int,
        mesh=None,
        lora_key=None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.total_steps = total_steps
        n_dev = len(jax.devices())
        if mesh is None:
            n_data, n_model = auto_mesh_shape(n_dev, cfg.lm.num_kv_heads)
            mesh = make_mesh(n_data, n_model)
        self.mesh = mesh
        self.n_data = mesh.devices.shape[0]
        # multi-process: rendezvous every mesh clique now, serially, before
        # the train-step compile (NCCL-eager-connect analog; see
        # parallel.mesh.warmup_collectives for the deadlock this prevents)
        warmup_collectives(mesh)

        self.lora = None
        if tcfg.lora_enable:
            key = lora_key if lora_key is not None else jax.random.PRNGKey(tcfg.seed)
            self.lora = lora_lib.init_lora(key, params["lm"], tcfg.lora_r)

        if tcfg.quantize_frozen is not None:
            if tcfg.quantize_frozen != "int8":
                raise ValueError(f"quantize_frozen: {tcfg.quantize_frozen!r}")
            if not tcfg.lora_enable:
                # full-precision optimizer state over int8 leaves is not a
                # thing; the frozen-base recipe is LoRA-only (QLoRA analog)
                raise ValueError("quantize_frozen requires lora_enable")
            from ..models.quant import quantize_lm_int8, quantize_tree_int8

            mask0 = trainable_mask(params, tcfg)
            params = dict(params)
            # LM is always frozen under LoRA; embeddings stay float (gathered,
            # not streamed — and tied heads reuse the float table)
            params["lm"] = quantize_lm_int8(params["lm"])
            for mod in ("siglip", "dino"):
                # towers only when FULLY frozen (W8A8 dynamic — the serving
                # tower path; gradients never flow through them: their input
                # is data).  BEATs keeps float weights: its conv feature
                # extractor has non-[in,out] leaves and it is only ~0.2 GB.
                if mod in params and not any(jax.tree_util.tree_leaves(mask0[mod])):
                    params[mod] = quantize_tree_int8(params[mod])

        self.p_spec = tdc_param_spec(params, fsdp_size=self.n_data)
        self.params = shard_tree(params, self.p_spec, mesh)

        train_tree = {"params": self.params} if self.lora is None else {
            "params": self.params,
            "lora": self.lora,
        }
        self.tx, self.mask = build_optimizer(
            train_tree["params"], tcfg, total_steps
        ) if self.lora is None else self._lora_optimizer(total_steps)
        self.opt_state = self.tx.init(self._opt_params())
        self.step = 0
        self._jstep = None
        self._metrics_fh = None
        self._tb = None

    # -- LoRA: optimize (lora, non-LM trainables) ------------------------------

    def _lora_optimizer(self, total_steps):
        """AdamW over {lora, extra} with the freeze-flag mask applied per leaf
        (reference non-LoRA trainables list, train.py:984-996, but honoring
        unfreeze_* flags: e.g. unfreeze_mm_compressor=False keeps the
        compressor frozen even in LoRA mode)."""
        tcfg = self.tcfg
        mask = trainable_mask(self.params, tcfg)
        self._extra_keys = tuple(
            k
            for k in self.params
            if k != "lm" and any(jax.tree_util.tree_leaves(mask[k]))
        )
        opt_mask = {
            "lora": jax.tree_util.tree_map(lambda _: True, self.lora),
            "extra": {k: mask[k] for k in self._extra_keys},
        }

        def label(path, trainable):
            if not trainable:
                return "frozen"
            return "nd" if _no_decay(_path_names(path)) else "wd"

        labels = jax.tree_util.tree_map_with_path(label, opt_mask)
        sched = make_schedule(tcfg, total_steps, tcfg.learning_rate)
        transforms = {
            "frozen": optax.set_to_zero(),
            "wd": optax.adamw(sched, weight_decay=tcfg.weight_decay),
            "nd": optax.adamw(sched, weight_decay=0.0),
        }
        tx = optax.chain(
            _zero_frozen_grads(opt_mask),
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.multi_transform(transforms, labels),
        )
        if tcfg.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, tcfg.gradient_accumulation_steps)
        return tx, mask

    def _opt_params(self):
        if self.lora is None:
            return self.params
        # LoRA stage: optimize the A/B deltas plus the non-LM modules the
        # freeze flags leave trainable (masked per leaf in _lora_optimizer)
        trainables = {k: self.params[k] for k in self._extra_keys}
        return {"lora": self.lora, "extra": trainables}

    # -- the jitted step -------------------------------------------------------

    def _sg_frozen(self, tree, mask):
        """stop_gradient on frozen leaves.  Without this the non-LoRA path
        differentiates wrt EVERY leaf (the optax mask only zeroes the result
        after the fact), so XLA runs a full backward through frozen towers /
        Q-Former and keeps their internals alive for it — measured as ~7 GB
        of saved activations in the stage-1 adapter tune (qformer reshapes +
        attention probs, PERF.md round 5).  stop_gradient prunes those
        branches out of the autodiff graph entirely; the optimizer tree and
        the optax mask are unchanged (frozen grads come back as zeros)."""
        return jax.tree_util.tree_map(
            lambda p, m: p if m else jax.lax.stop_gradient(p), tree, mask
        )

    def _loss_fn(self, opt_params, frozen_params, batch):
        if self.lora is None:
            params = self._sg_frozen(opt_params, self.mask)
        else:
            params = dict(frozen_params)
            params.update(
                {
                    k: self._sg_frozen(opt_params["extra"][k], self.mask[k])
                    for k in self._extra_keys
                }
            )
            # runtime LoRA: A/B graft beside each weight and apply at matmul
            # time (layers.linear) — the old in-graph apply_lora merge held an
            # f32 delta + a second full LM copy (+12 GB at 3B; PERF.md r5)
            params["lm"] = lora_lib.graft_lora(
                frozen_params["lm"], opt_params["lora"], self.tcfg.lora_alpha, self.tcfg.lora_r
            )
        attn_impl = self.tcfg.attn_impl
        if attn_impl is None:
            from ..models.attention import default_attn_impl

            attn_impl = default_attn_impl()
        return tdc_loss(
            self.cfg,
            params,
            batch,
            max_len=self.tcfg.model_max_length,
            max_visual_len=self.tcfg.max_visual_len,
            attn_impl=attn_impl,
            remat=True,
            loss_chunk=self.tcfg.loss_chunk,
        )

    def _make_step(self, batch):
        b_spec = batch_spec(batch)

        def step_fn(opt_params, frozen, opt_state, b):
            loss, grads = jax.value_and_grad(self._loss_fn)(opt_params, frozen, b)
            updates, opt_state = self.tx.update(grads, opt_state, opt_params)
            opt_params = optax.apply_updates(opt_params, updates)
            return opt_params, opt_state, loss

        jfn = jax.jit(step_fn, donate_argnums=(0, 2))
        return jfn, b_spec

    def _pad_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Pad the sample axis to a multiple of the data-mesh size with
        loss-inert rows (labels all IGNORE_INDEX, no frames)."""
        B = batch["input_ids"].shape[0]
        rem = (-B) % self.n_data
        if rem == 0:
            return batch
        out = {}
        for k, v in batch.items():
            pad = np.zeros((rem,) + v.shape[1:], v.dtype)
            if k == "input_ids":
                pad[:] = self.cfg.lm.pad_token_id
            elif k == "labels":
                pad[:] = -100
            elif k == "text_len":
                pad[:] = 2
            out[k] = np.concatenate([np.asarray(v), pad], axis=0)
        return out

    def train_step(self, batch: Dict[str, np.ndarray]) -> jnp.ndarray:
        """One optimizer step.  Returns the DEVICE-RESIDENT loss scalar:
        fetching it (float()) forces a host sync, so the training loop only
        materializes it every `logging_steps` — JAX async dispatch then
        pipelines consecutive steps without the per-step round trip the
        reference's loss.item() incurs (mm_trainer.py training loop)."""
        batch = self._pad_batch(batch)
        if self._jstep is None:
            self._jstep, self._b_spec = self._make_step(batch)
        # ship pixels in compute dtype: the towers cast them to cfg.dtype on
        # arrival anyway, and f32 pixels at 128 frames are ~0.45 GB of
        # resident arguments (PERF.md round 5).  Audio waveforms stay f32
        # (the fbank frontend is an f32 reduction).
        def _dev(k, v):
            a = jnp.asarray(v)
            if k.endswith("_px") and a.dtype == jnp.float32:
                return a.astype(self.cfg.dtype)
            return a

        b = shard_tree(
            {k: _dev(k, v) for k, v in batch.items()}, self._b_spec, self.mesh
        )
        opt_params = self._opt_params()
        # the frozen arg carries only what opt_params does not: the trainable
        # extras would otherwise be RESIDENT TWICE (once donated in
        # opt_params, once here), and in the non-LoRA path the whole tree
        # rides in opt_params already (XLA keeps a second full copy for the
        # non-donated alias otherwise — measured in the stage-3 arguments
        # accounting, PERF.md round 5)
        if self.lora is None:
            frozen = {}
        else:
            frozen = {
                k: v for k, v in self.params.items() if k not in self._extra_keys
            }
        with self.mesh:
            opt_params, self.opt_state, loss = self._jstep(
                opt_params, frozen, self.opt_state, b
            )
        if self.lora is None:
            self.params = opt_params
        else:
            self.lora = opt_params["lora"]
            self.params.update(opt_params["extra"])
        self.step += 1
        return loss

    # -- logging / checkpointing ----------------------------------------------

    def log(self, metrics: Dict[str, float]):
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-host: metrics are identical on every host (same global
            # batch, replicated loss); only rank 0 writes, like the
            # reference's rank-gated Trainer logging
            return
        metrics = {"step": self.step, "time": time.time(), **metrics}
        if self.tcfg.report_to == "tensorboard":
            if self._tb is None:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(self.tcfg.output_dir, "tensorboard_logs")
                )
            for k, v in metrics.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, self.step)
        elif self.tcfg.report_to == "jsonl":
            if self._metrics_fh is None:
                os.makedirs(self.tcfg.output_dir, exist_ok=True)
                self._metrics_fh = open(
                    os.path.join(self.tcfg.output_dir, "metrics.jsonl"), "a"
                )
            # default=float: train_step returns a DEVICE-RESIDENT loss scalar
            # (deferred host sync); callers may pass it to log() unfetched.
            self._metrics_fh.write(json.dumps(metrics, default=float) + "\n")
            self._metrics_fh.flush()

    def _ckpt_manager(self):
        import orbax.checkpoint as ocp

        if getattr(self, "_mgr", None) is None:
            path = os.path.join(os.path.abspath(self.tcfg.output_dir), "checkpoints")
            self._mgr = ocp.CheckpointManager(
                path,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.tcfg.save_total_limit, create=True
                ),
            )
        return self._mgr

    def save(self, wait: bool = True):
        """Checkpoint the training state.  wait=False makes the save ASYNC:
        Orbax copies device arrays to host synchronously (so the buffers the
        next step donates are no longer needed) and serializes to disk on a
        background thread, overlapping the write with subsequent training
        steps — the reference blocks the loop for the whole torch.save
        (mm_trainer.py save path).  fit() uses wait=False for periodic saves
        and a final blocking save for durability."""
        mgr = self._ckpt_manager()
        import orbax.checkpoint as ocp

        mgr.wait_until_finished()  # previous async save, if any
        self._join_adapter_write()  # previous async adapter export, if any
        state = {"params": self.params, "step": self.step}
        if self.lora is not None:
            state["lora"] = self.lora
        mgr.save(self.step, args=ocp.args.StandardSave(state))
        if wait:
            mgr.wait_until_finished()
        if self.tcfg.tune_mm_mlp_adapter and jax.process_index() == 0:
            # adapter-only artifact alongside the full state
            # (reference mm_projector.bin flavor, mm_trainer.py:487-513).
            # Same async pattern as the Orbax save: snapshot the (small)
            # adapter subtree to host synchronously, write on a background
            # thread so wait=False saves never block the loop on disk I/O.
            # Rank-gated: the adapter subtree is replicated (host-local
            # fetch), and concurrent same-path writers on a shared
            # filesystem would interleave into a corrupt artifact.
            import os

            from ..convert.to_hf import export_mm_adapter, save_mm_adapter

            path = os.path.join(
                self.tcfg.output_dir, f"mm_projector-{self.step}.safetensors"
            )
            if wait:
                save_mm_adapter(self.params, path)
            else:
                import threading

                from ..convert.to_hf import save_safetensors

                self._join_adapter_write()
                host = export_mm_adapter(self.params)  # device->host fetch

                def _atomic_write(sd=host, dst=path):
                    # temp + os.replace: a crash between a wait=False save
                    # and the next join would otherwise kill the daemon
                    # thread mid-write and leave a truncated artifact
                    tmp = dst + ".tmp"
                    save_safetensors(sd, tmp)
                    os.replace(tmp, dst)

                self._adapter_thread = threading.Thread(
                    target=_atomic_write, daemon=True
                )
                self._adapter_thread.start()

    def _join_adapter_write(self):
        t = getattr(self, "_adapter_thread", None)
        if t is not None:
            t.join()
            self._adapter_thread = None

    def restore_if_available(self) -> bool:
        """resume-from-checkpoint (train.py:1269-1273)."""
        mgr = self._ckpt_manager()
        latest = mgr.latest_step()
        if latest is None:
            return False
        import orbax.checkpoint as ocp

        template = {"params": self.params, "step": 0}
        if self.lora is not None:
            template["lora"] = self.lora
        state = mgr.restore(latest, args=ocp.args.StandardRestore(template))
        self.params = state["params"]
        if self.lora is not None:
            self.lora = state["lora"]
        self.step = int(state["step"])
        return True

    def export_merged(self) -> Params:
        """Final artifact: plain param tree with LoRA baked in (the
        merge_lora_weights.py equivalent)."""
        if self.lora is None:
            return self.params
        out = dict(self.params)
        if self.tcfg.quantize_frozen is not None:
            # QLoRA export: dequantize back to float first — apply_lora needs
            # "w" leaves, and merging into the dequantized values matches the
            # base the adapter was actually trained against
            from ..models.quant import dequantize_tree_int8

            out = {
                k: dequantize_tree_int8(v, dtype=self.cfg.param_dtype)
                for k, v in out.items()
            }
        out["lm"] = lora_lib.merge_lora_params(
            out["lm"], self.lora, self.tcfg.lora_alpha, self.tcfg.lora_r
        )
        return out

    # -- loop -------------------------------------------------------------------

    def fit(self, batches: Iterator[Dict[str, np.ndarray]]):
        """Training loop with host/device overlap: a prefetch thread runs the
        input pipeline (video decode, tokenization, padding — the expensive
        host work inside `batches`) while the device executes the current
        step, and the loss is only fetched at logging_steps.  This is the
        TPU-side equivalent of the reference's DataLoader worker processes
        (/root/reference/tdc/train.py:1236-1264)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.tcfg.prefetch_batches))
        END = object()
        err: list = []

        def producer():
            try:
                for b in batches:
                    q.put(self._pad_batch(b))
            except BaseException as e:  # surface pipeline errors in the main thread
                err.append(e)
            finally:
                q.put(END)

        threading.Thread(target=producer, daemon=True).start()

        t0 = time.time()
        loss = None
        while True:
            batch = q.get()
            if batch is END:
                if err:
                    raise err[0]
                break
            if self.tcfg.max_steps and self.step >= self.tcfg.max_steps:
                break
            loss = self.train_step(batch)
            if self.step % self.tcfg.logging_steps == 0:
                # the only per-N-steps host sync
                self.log({"loss": float(loss), "steps_per_s": self.step / max(time.time() - t0, 1e-9)})
            if self.step % self.tcfg.save_steps == 0:
                self.save(wait=False)  # disk write overlaps the next steps
        self.save()
