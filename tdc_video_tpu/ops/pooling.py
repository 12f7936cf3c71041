"""Adaptive average pooling as static matmuls (MXU-friendly).

The reference leans on torch adaptive_avg_pool1d/2d in the compression path
(tdc/cambrian_arch.py:1634-1637 query pooling, :1568-1588 audio pooling).
On TPU we precompute the pooling weight matrix once (static shapes) and pool
with a single matmul.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] weights replicating torch adaptive_avg_pool1d: output i
    averages input[floor(i*n/k) : ceil((i+1)*n/k)]."""
    w = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


def adaptive_avg_pool_tokens(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Pool the second-to-last axis: [..., N, C] -> [..., n_out, C]."""
    n_in = x.shape[-2]
    w = jnp.asarray(adaptive_pool_matrix(n_in, n_out))
    return jnp.einsum("kn,...nc->...kc", w.astype(x.dtype), x)
