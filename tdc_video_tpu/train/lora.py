"""LoRA as explicit delta parameters (functional, jit-friendly).

Replaces the reference's peft wrapping (tdc/train.py:955-996: LoraConfig over
find_all_linear_names targets + a forced-trainable non-LoRA list).  Instead of
monkey-patching modules, LoRA lives in its own pytree:

    lora = init_lora(key, params["lm"], rank, targets)   # A ~ N(0,.02), B = 0
    lm = graft_lora(params["lm"], lora, alpha, rank)     # y = xW + (xA)B at matmul time
    merged_lm = apply_lora(params["lm"], lora, alpha, rank)  # w + A@B * alpha/r

The train step traces graft_lora (runtime form — no merged weight copies in
memory), so only the small A/B leaves carry gradients; at export time
merge_lora_params bakes the deltas in via apply_lora (the equivalent of
utils/merge_lora_weights.py:7-14).
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
    # "w_q": LoRA over an int8-quantized frozen base (QLoRA analog —
    # models/quant.py + TrainConfig.quantize_frozen); A/B shapes match since
    # w_q keeps the float weight's [.., in, out] layout
    return names[-1] in ("w", "w_q") and any(n in targets for n in names)


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
        if l is None and key.endswith("/w"):
            # adapters initialized against an int8 base store ".../w_q" keys;
            # after dequantize_tree_int8 the leaf is ".../w" again
            l = lora.get(key + "_q")
        if l is None:
            return p
        delta = jnp.einsum("...ir,...ro->...io", l["a"].astype(jnp.float32), l["b"].astype(jnp.float32))
        return p + (delta * scale).astype(p.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def graft_lora(params: Any, lora: Any, alpha: float, rank: int) -> Any:
    """Attach A / (B * alpha/rank) NEXT TO each targeted weight leaf so the
    layer forward computes y = x@W + (x@A)@B at matmul time
    (models/layers.linear "lora_a" branch).  This is the train-step form:
    apply_lora materializes an f32 delta plus a merged copy of every LM
    weight in-graph (~+12 GB at 3B — the difference between stage-3 fitting
    one v5e chip and OOM, PERF.md round 5); grafting adds only the A/B
    leaves themselves.  Stacked [L, ...] weights get stacked [L, in, r] /
    [L, r, out] leaves, which ride the lax.scan layer axis like any other
    layer param.  Gradients flow to the caller's lora tree through the
    grafted references (B carries the alpha/rank scale, differentiably)."""
    scale = alpha / rank
    # tree_map rebuilds every container, so in-place edits below never touch
    # the caller's tree
    out = jax.tree_util.tree_map(lambda x: x, params)
    for key, ab in lora.items():
        names = key.split("/")
        cur = out
        for n in names[:-1]:  # drop the trailing "w": graft beside it
            cur = cur[n]
        cur["lora_a"] = ab["a"]
        cur["lora_b"] = ab["b"] * scale
    return out


def merge_lora_params(params: Any, lora: Any, alpha: float, rank: int) -> Any:
    """Bake the deltas into a plain param tree (export / serving)."""
    return apply_lora(params, lora, alpha, rank)
