"""Differentiable top-k via perturbed maximum (JAX).

Counterpart of the reference ``lavis/models/topk.py:18-339``
(``PerturbedTopK``, DETR-style): forward returns the average of hard top-k
indicator matrices over Gaussian-perturbed copies of the scores; backward
uses the perturbed-maximum Jacobian estimate
(d/dx E[argtopk(x + sigma z)] ~= E[indicator z^T] / sigma).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _hard_topk_indicators(x, k):
    """(..., n) scores -> (..., k, n) one-hot rows of the top-k positions."""
    n = x.shape[-1]
    _, idx = jax.lax.top_k(x, k)
    return jax.nn.one_hot(idx, n, dtype=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def perturbed_topk(x, rng, k: int, num_samples: int = 500, sigma: float = 0.05):
    """Soft top-k: (B, n) scores -> (B, k, n) soft indicator matrix."""
    out, _ = _perturbed_topk_fwd(x, rng, k, num_samples, sigma)
    return out


def _perturbed_topk_fwd(x, rng, k, num_samples, sigma):
    noise = jax.random.normal(rng, (num_samples,) + x.shape, x.dtype)
    perturbed = x[None] + sigma * noise  # (S, B, n)
    indicators = _hard_topk_indicators(perturbed, k)  # (S, B, k, n)
    out = indicators.mean(axis=0)
    return out, (noise, indicators)


def _perturbed_topk_bwd(k, num_samples, sigma, residuals, g):
    noise, indicators = residuals
    # Jacobian estimate: E[indicator outer z] / sigma  (topk.py:58-74)
    jac = jnp.einsum("sbkn,sbm->bknm", indicators, noise) / (num_samples * sigma)
    dx = jnp.einsum("bkn,bknm->bm", g, jac)
    return dx, None


perturbed_topk.defvjp(_perturbed_topk_fwd, _perturbed_topk_bwd)


class PerturbedTopK:
    """Stateful convenience wrapper mirroring the reference module API."""

    def __init__(self, k: int, num_samples: int = 500, sigma: float = 0.05):
        self.k = k
        self.num_samples = num_samples
        self.sigma = sigma

    def __call__(self, x, rng):
        return perturbed_topk(x, rng, self.k, self.num_samples, self.sigma)
