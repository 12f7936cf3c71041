"""Sharding specs for the TDC parameter/batch trees.

Replaces the reference's engine-owned sharding (FSDP full_shard auto_wrap on
decoder layers, scripts/stage2/train_video_qwen.sh:47-48; DeepSpeed ZeRO
JSONs, scripts/zero*.json) with GSPMD partition specs:

* LM decoder: Megatron-style tensor parallel over the `model` axis — QKV and
  MLP up-projections shard their output feature dim, O/down projections their
  input dim, so each layer needs exactly one reduce(-scatter) on ICI; the
  vocab dim of embed/lm_head shards over `model` too.
* FSDP: the stacked [num_layers, ...] leaf axis additionally shards over
  `data` — under lax.scan XLA all-gathers one layer per step and frees it,
  which IS rematerializing FSDP, with no wrapper engine.
* Vision towers / SVA / Q-Former / BEATs are small (<2 GB total) and stay
  replicated; their work parallelizes over the frame batch on `data`.

Specs are assigned by path-based rules (tree_map_with_path), so they track
the param tree structure automatically.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

Params = Any


def _path_names(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


# Rules: (substring that must appear in the path, leaf ndim w/o layer axis) -> spec
_COL = {"q_proj", "k_proj", "v_proj", "gate", "up"}  # shard output dim
_ROW = {"o_proj", "down"}  # shard input dim


def lm_param_spec(params: Params, fsdp_size: int = 0) -> Params:
    """PartitionSpec tree for models.lm param trees (stacked layers).

    fsdp_size: size of the `data` axis; the stacked layer axis is sharded
    over it when divisible (ZeRO-3-style param sharding, one layer
    all-gathered per scan step), else left replicated."""

    def rule(path, leaf):
        names = _path_names(path)
        in_layers = "layers" in names
        shard_layers = fsdp_size > 0 and in_layers and leaf.shape[0] % fsdp_size == 0
        layer_ax = (DATA_AXIS,) if shard_layers else (None,)
        nd = leaf.ndim

        def wrap(*rest):
            if in_layers:
                return P(*layer_ax, *rest)
            return P(*rest)

        body = nd - (1 if in_layers else 0)
        if "embedding" in names:  # [V, H]
            return P(MODEL_AXIS, None)
        if "lm_head" in names and names[-1] in ("w", "w_q"):  # [H, V]
            return P(None, MODEL_AXIS)
        if "lm_head" in names and names[-1] == "w_scale":  # [V]
            return P(MODEL_AXIS)
        if any(n in _COL for n in names):
            # int8 serving (models/quant.py): w_q shards like w; the
            # per-output-channel scale follows the sharded output dim
            if names[-1] in ("w", "w_q") and body == 2:
                return wrap(None, MODEL_AXIS)
            if names[-1] in ("b", "w_scale") and body == 1:
                return wrap(MODEL_AXIS)
            return wrap(*([None] * body))
        if any(n in _ROW for n in names):
            if names[-1] in ("w", "w_q") and body == 2:
                return wrap(MODEL_AXIS, None)
            # w_scale indexes the (unsharded) output dim: replicated
            return wrap(*([None] * body))
        # mlp gate_up fused projections: shard output dim
        if "gate_up" in names and names[-1] == "w" and body == 2:
            return wrap(None, MODEL_AXIS)
        return wrap(*([None] * body))

    return jax.tree_util.tree_map_with_path(rule, params)


def replicated_spec(params: Params) -> Params:
    return jax.tree_util.tree_map(lambda _: P(), params)


def tdc_param_spec(params: Params, fsdp_size: int = 0) -> Params:
    """Spec tree for the full model.init_tdc tree: TP for the LM, replication
    for towers/SVA/compressor/BEATs (frame work shards on `data` instead)."""
    out = {}
    for k, v in params.items():
        if k == "lm":
            out[k] = lm_param_spec(v, fsdp_size=fsdp_size)
        else:
            out[k] = replicated_spec(v)
    return out


def batch_spec(batch: Params) -> Params:
    """Everything in a batch shards its leading (sample) axis over `data`."""
    return jax.tree_util.tree_map(
        lambda x: P(DATA_AXIS, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P(), batch
    )


def kv_cache_spec(cache: Params) -> Params:
    """PartitionSpec tree for a models.lm.init_kv_cache dict under tensor
    parallelism: K/V (and their int8 scales) shard the kv-head axis over
    `model` — the same axis the attention heads are sharded on by
    lm_param_spec, so decode reads/writes its cache shard locally with zero
    collectives; mask/lengths are tiny and replicated."""
    spec = {
        "k": P(None, None, None, MODEL_AXIS, None),
        "v": P(None, None, None, MODEL_AXIS, None),
        "mask": P(),
        "lengths": P(),
    }
    if "k_scale" in cache:  # int8 KV: [L, B, S, KVH] per-token-per-head scales
        spec["k_scale"] = P(None, None, None, MODEL_AXIS)
        spec["v_scale"] = P(None, None, None, MODEL_AXIS)
    return spec


def shard_tree(tree: Params, spec: Params, mesh: Mesh) -> Params:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec
    )


def to_named(spec: Params, mesh: Mesh) -> Params:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec, is_leaf=lambda s: isinstance(s, P)
    )
