"""LayerNorm / RMSNorm forward and backward.

TPU counterpart of the reference normalization kernels (reference:
common/normalization/ — nvte_layernorm_fwd/bwd, nvte_rmsnorm_fwd/bwd,
zero-centered gamma, FP8-output fusion). Stats are computed in f32 and
returned as residuals (mu, rsigma) exactly like the reference so the
backward never recomputes them.

FP8-output fusion (reference: nvte_layernorm_fwd fp8 epilogue): for
ROWWISE-only quantizes (the per-tensor-scaling layer path) XLA fuses
norm -> scale -> cast into one loop, so these pure-JAX functions ARE
the fused kernel. For dual-orientation quantizes the Pallas boundary
of cast_transpose forces an HBM round-trip of the normalized output;
ops/quantize_kernels.norm_cast_transpose fuses the norm into that
kernel instead (bit-identical to this chain; used by
DelayedScaleQuantizer.quantize_normed when profitable).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _gamma(gamma, zero_centered):
    g = gamma.astype(jnp.float32)
    return g + 1.0 if zero_centered else g


def layernorm_fwd(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    zero_centered_gamma: bool = False,
    epsilon: float = 1e-6,
    quantizer=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (out, mu, rsigma). ``out`` is quantized if a quantizer is
    given (reference: nvte_layernorm_fwd + FP8 epilogue)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rsigma = jax.lax.rsqrt(var + epsilon)
    y = (xf - mu) * rsigma * _gamma(gamma, zero_centered_gamma) \
        + beta.astype(jnp.float32)
    out = y.astype(x.dtype)
    if quantizer is not None:
        out = quantizer.quantize(out)
    return out, mu.squeeze(-1), rsigma.squeeze(-1)


def layernorm_bwd(
    dz: jax.Array,
    x: jax.Array,
    mu: jax.Array,
    rsigma: jax.Array,
    gamma: jax.Array,
    *,
    zero_centered_gamma: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (dx, dgamma, dbeta) (reference: nvte_layernorm_bwd)."""
    h = x.shape[-1]
    xf = x.astype(jnp.float32)
    dzf = dz.astype(jnp.float32)
    mu = mu[..., None]
    rs = rsigma[..., None]
    xhat = (xf - mu) * rs
    g = _gamma(gamma, zero_centered_gamma)
    dxhat = dzf * g
    # dx = rs * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rs * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    red_axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(dzf * xhat, axis=red_axes).astype(gamma.dtype)
    dbeta = jnp.sum(dzf, axis=red_axes).astype(gamma.dtype)
    return dx, dgamma, dbeta


def rmsnorm_fwd(
    x: jax.Array,
    gamma: jax.Array,
    *,
    zero_centered_gamma: bool = False,
    epsilon: float = 1e-6,
    quantizer=None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out, rsigma) (reference: nvte_rmsnorm_fwd)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    rsigma = jax.lax.rsqrt(ms + epsilon)
    out = (xf * rsigma * _gamma(gamma, zero_centered_gamma)).astype(x.dtype)
    if quantizer is not None:
        out = quantizer.quantize(out)
    return out, rsigma.squeeze(-1)


def rmsnorm_bwd(
    dz: jax.Array,
    x: jax.Array,
    rsigma: jax.Array,
    gamma: jax.Array,
    *,
    zero_centered_gamma: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (dx, dgamma) (reference: nvte_rmsnorm_bwd)."""
    h = x.shape[-1]
    xf = x.astype(jnp.float32)
    dzf = dz.astype(jnp.float32)
    rs = rsigma[..., None]
    g = _gamma(gamma, zero_centered_gamma)
    xhat = xf * rs
    dxhat = dzf * g
    m = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rs * (dxhat - xhat * m)).astype(x.dtype)
    red_axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(dzf * xhat, axis=red_axes).astype(gamma.dtype)
    return dx, dgamma


def rmsnorm_bwd_add(dz, x, add, rsigma, gamma, *, zero_centered_gamma=False):
    """rmsnorm_bwd fused with a residual add on dx
    (reference: nvte_rmsnorm_bwd_add)."""
    dx, dgamma = rmsnorm_bwd(
        dz, x, rsigma, gamma, zero_centered_gamma=zero_centered_gamma)
    return (dx + add.astype(dx.dtype)), dgamma
