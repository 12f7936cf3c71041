"""Training step: value_and_grad + optax, pjit-shardable.

Replaces the reference's HF Trainer + FSDP/DeepSpeed engine stack
(tdc/mm_trainer.py:206, tdc/train.py:1258-1273): the optimizer is optax, the
sharding is GSPMD partition specs (parallel/sharding.py), and one jitted
function is the whole step — forward, backward, collectives, update.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TDCConfig
from ..model import tdc_loss

Params = Any


def make_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    trainable_mask: Optional[Params] = None,
) -> optax.GradientTransformation:
    """AdamW with clipping and an optional per-leaf freeze mask (the
    reference's freeze policy: towers frozen, per-module trainability flags,
    tdc/train.py:996-1090)."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay),
    )
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx


def make_train_step(
    cfg: TDCConfig,
    tx: optax.GradientTransformation,
    max_len: int = 4096,
    max_visual_len: int = 2048,
    attn_impl: Optional[str] = None,
    remat: bool = True,
) -> Callable:
    """Returns step(params, opt_state, batch) -> (params, opt_state, loss).

    attn_impl=None resolves to the platform default (Pallas flash kernel with
    custom_vjp backward on TPU — the reference trains with flash-attn-2,
    tdc/builder.py:71-72)."""
    if attn_impl is None:
        from ..models.attention import default_attn_impl

        attn_impl = default_attn_impl()

    def step(params, opt_state, batch: Dict) -> Tuple[Params, Any, jnp.ndarray]:
        def loss_fn(p):
            return tdc_loss(
                cfg,
                p,
                batch,
                max_len=max_len,
                max_visual_len=max_visual_len,
                attn_impl=attn_impl,
                remat=remat,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
