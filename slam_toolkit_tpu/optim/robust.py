"""Robust-loss weights for iteratively-reweighted least squares.

The reference uses g2o's Huber kernel on measurement edges
(src/method.cpp:71-80). In IRLS form the Huber loss contributes a
per-residual weight w = min(1, delta / ||r||) applied on top of the
measurement information, which is exactly how we fold it into the
batched normal equations.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss at whitened residual norm r_norm."""
    safe = jnp.maximum(r_norm, 1e-12)
    return jnp.minimum(1.0, delta / safe)


def huber_cost(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Huber rho(||r||): quadratic inside delta, linear outside."""
    quad = 0.5 * r_norm * r_norm
    lin = delta * (r_norm - 0.5 * delta)
    return jnp.where(r_norm <= delta, quad, lin)
