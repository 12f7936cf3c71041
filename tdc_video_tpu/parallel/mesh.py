"""Device mesh construction.

TPU-native replacement for the reference's NCCL process-group setup
(tdc/train.py:892 dist.init_process_group("nccl")): one `jax.sharding.Mesh`
with a `data` axis (batch/frames, DP + FSDP) and a `model` axis (tensor
parallel for the LM).  XLA inserts all collectives (all-gather,
reduce-scatter, psum) from sharding annotations; they ride ICI within a slice
and DCN across slices — no NCCL analog exists or is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int,
    n_model: int,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def auto_mesh_shape(n_devices: int, num_kv_heads: int = 4) -> Tuple[int, int]:
    """Pick (n_data, n_model): the largest model axis that divides the KV head
    count (TP shards K/V projections head-wise), remainder to data."""
    n_model = 1
    for cand in range(min(n_devices, num_kv_heads), 0, -1):
        if num_kv_heads % cand == 0 and n_devices % cand == 0:
            n_model = cand
            break
    return n_devices // n_model, n_model


def auto_mesh(n_devices: Optional[int] = None, num_kv_heads: int = 4) -> Mesh:
    n = len(jax.devices()) if n_devices is None else n_devices
    n_data, n_model = auto_mesh_shape(n, num_kv_heads)
    return make_mesh(n_data, n_model)


def warmup_collectives(mesh: Mesh) -> None:
    """Eagerly establish the mesh's cross-process communicator cliques.

    XLA creates communicators lazily at first collective execution inside the
    compiled program, where every axis group rendezvous concurrently (one
    thread per local device).  Two failure modes follow: on an oversubscribed
    CPU host the concurrent gloo rendezvous can starve past gloo's hardcoded
    30 s connect/KV windows (observed as `GetKeyValue() timed out` /
    `Connect timeout` racing between ranks), and on a real multi-host slice a
    topology/network problem only surfaces *after* a long train-step compile.
    Running one tiny psum per mesh axis (then one over the full mesh), each
    blocked on completion before the next, creates the cliques while nothing
    else contends — the analog of the eager-connect the reference gets from
    NCCL's `init_process_group` (/root/reference/tdc/train.py:892).  No-op in
    single-process runs, where communicators are in-process and cheap.
    """
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp

    axis_sets = [(name,) for name in mesh.axis_names]
    if len(mesh.axis_names) > 1:
        axis_sets.append(tuple(mesh.axis_names))
    for axes in axis_sets:
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if size == 1:
            continue
        f = jax.jit(
            jax.shard_map(
                lambda x: jax.lax.psum(x, axes),
                mesh=mesh,
                in_specs=jax.sharding.PartitionSpec(axes),
                out_specs=jax.sharding.PartitionSpec(),
            )
        )
        jax.block_until_ready(f(jnp.zeros((size, 8), jnp.float32)))
