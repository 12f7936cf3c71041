"""Non-SVA multimodal projector fallbacks.

The live path builds the SVA projector inline (models/sva.py mm_projector);
this module supplies the reference's fallback `mm_projector_type` options
(tdc/multimodal_projector/builder.py:33-52): `linear`, `mlpNx_gelu`, and
`identity`, so stage-1-style ablations configure 1:1.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp

from .layers import init_linear, linear

Params = Any


def init_projector(key, projector_type: str, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    if projector_type == "identity":
        return {"type": "identity", "layers": []}
    if projector_type == "linear":
        return {"type": "linear", "layers": [init_linear(key, d_in, d_out, dtype)]}
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        depth = int(m.group(1))
        keys = jax.random.split(key, depth)
        layers = [init_linear(keys[0], d_in, d_out, dtype)]
        layers += [init_linear(k, d_out, d_out, dtype) for k in keys[1:]]
        return {"type": projector_type, "layers": layers}
    raise ValueError(f"Unknown projector type: {projector_type}")


def projector_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    layers = params["layers"]
    if not layers:
        return x
    x = linear(layers[0], x)
    for p in layers[1:]:
        x = linear(p, jax.nn.gelu(x, approximate=True))
    return x
