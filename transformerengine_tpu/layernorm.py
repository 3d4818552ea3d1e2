"""Functional LayerNorm / RMSNorm with custom VJP.

TPU counterpart of the reference functional norm layer (reference:
jax/layernorm.py). Residuals (mu, rsigma) are saved in fwd and reused in
bwd, matching the reference kernel contract.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.normalization import (
    layernorm_bwd, layernorm_fwd, rmsnorm_bwd, rmsnorm_fwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def layernorm(x, gamma, beta, norm_type: str = "layernorm",
              zero_centered_gamma: bool = False, epsilon: float = 1e-6):
    """Normalize ``x`` along its last axis.

    ``norm_type`` is "layernorm" or "rmsnorm" (``beta`` ignored for
    rmsnorm; pass None).
    """
    out, _ = _layernorm_fwd_rule(
        x, gamma, beta, norm_type, zero_centered_gamma, epsilon)
    return out


def _layernorm_fwd_rule(x, gamma, beta, norm_type, zero_centered_gamma, epsilon):
    if norm_type == "layernorm":
        out, mu, rsigma = layernorm_fwd(
            x, gamma, beta, zero_centered_gamma=zero_centered_gamma,
            epsilon=epsilon)
    else:
        assert norm_type == "rmsnorm", norm_type
        out, rsigma = rmsnorm_fwd(
            x, gamma, zero_centered_gamma=zero_centered_gamma, epsilon=epsilon)
        mu = None
    return out, (x, mu, rsigma, gamma)


def _layernorm_bwd_rule(norm_type, zero_centered_gamma, epsilon, res, dz):
    x, mu, rsigma, gamma = res
    if norm_type == "layernorm":
        dx, dgamma, dbeta = layernorm_bwd(
            dz, x, mu, rsigma, gamma, zero_centered_gamma=zero_centered_gamma)
    else:
        dx, dgamma = rmsnorm_bwd(
            dz, x, rsigma, gamma, zero_centered_gamma=zero_centered_gamma)
        dbeta = None
    return dx, dgamma, dbeta


layernorm.defvjp(_layernorm_fwd_rule, _layernorm_bwd_rule)


def rmsnorm(x, gamma, zero_centered_gamma: bool = False, epsilon: float = 1e-6):
    return layernorm(x, gamma, None, "rmsnorm", zero_centered_gamma, epsilon)
