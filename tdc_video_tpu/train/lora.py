"""LoRA as explicit delta parameters (functional, jit-friendly).

Replaces the reference's peft wrapping (tdc/train.py:955-996: LoraConfig over
find_all_linear_names targets + a forced-trainable non-LoRA list).  Instead of
monkey-patching modules, LoRA lives in its own pytree:

    lora = init_lora(key, params["lm"], rank, targets)   # A ~ N(0,.02), B = 0
    merged_lm = apply_lora(params["lm"], lora, alpha, rank)  # w + A@B * alpha/r

apply_lora is traced inside the train step, so only the small A/B leaves carry
gradients; at export time merge_lora_params bakes the deltas in (the
equivalent of utils/merge_lora_weights.py:7-14).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate", "up", "down")


def _names(path) -> Tuple[str, ...]:
    return tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _is_target(path, targets) -> bool:
    names = _names(path)
    return names[-1] == "w" and any(n in targets for n in names)


def init_lora(
    key,
    params: Any,
    rank: int = 128,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Any:
    """{path: {a, b}} for every targeted weight leaf.  Weights may carry a
    stacked leading layer axis ([L, in, out]) — A/B stack along it too."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    out = {}
    paths = [p for p, leaf in leaves if _is_target(p, targets)]
    keys = jax.random.split(key, max(len(paths), 1))
    flat = dict(leaves)
    for k, p in zip(keys, paths):
        leaf = flat[p]
        a = (jax.random.normal(k, (*leaf.shape[:-1], rank), jnp.float32) * 0.02).astype(dtype)
        b = jnp.zeros((*leaf.shape[:-2], rank, leaf.shape[-1]), dtype)
        out["/".join(_names(p))] = {"a": a, "b": b}
    return out


def apply_lora(params: Any, lora: Any, alpha: float, rank: int) -> Any:
    """params with w + (A @ B) * alpha/rank at each lora'd path."""
    scale = alpha / rank

    def merge(path, p):
        key = "/".join(_names(path))
        l = lora.get(key)
        if l is None:
            return p
        delta = jnp.einsum("...ir,...ro->...io", l["a"].astype(jnp.float32), l["b"].astype(jnp.float32))
        return p + (delta * scale).astype(p.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def merge_lora_params(params: Any, lora: Any, alpha: float, rank: int) -> Any:
    """Bake the deltas into a plain param tree (export / serving)."""
    return apply_lora(params, lora, alpha, rank)
