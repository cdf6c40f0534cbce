"""Pairwise-distance kernels (clustering similarity).

Replaces ``scipy.spatial.distance.pdist`` over all face embeddings
(`face/clustering.py:101`) with the matmul identity
``‖x−y‖² = ‖x‖² + ‖y‖² − 2·x·yᵀ`` so the O(n²·d) work lands on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared Euclidean distances, x [N, D] × y [M, D] → [N, M].

    Inputs are mean-centered first (distances are translation-invariant):
    this shrinks the magnitudes entering the ‖x‖²+‖y‖²−2xyᵀ identity and cuts
    float32 cancellation error by orders of magnitude near zero distance.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    symmetric = y is None
    y = x if symmetric else jnp.asarray(y, dtype=jnp.float32)
    mean = x.mean(axis=0, keepdims=True)
    x = x - mean
    y = y - mean
    x2 = jnp.sum(x * x, axis=1)[:, None]
    y2 = jnp.sum(y * y, axis=1)[None, :]
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    out = jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)
    if symmetric:
        # self-distances are exactly zero; the matmul's different reduction
        # order would otherwise leave O(eps·‖x‖²) noise on the diagonal
        n = out.shape[0]
        out = out * (1.0 - jnp.eye(n, dtype=out.dtype))
    return out


@jax.jit
def pairwise_dist(x: jnp.ndarray, y: jnp.ndarray | None = None) -> jnp.ndarray:
    """Euclidean distances (matches ``pdist(..., metric='euclidean')``)."""
    return jnp.sqrt(pairwise_sqdist(x, y))
