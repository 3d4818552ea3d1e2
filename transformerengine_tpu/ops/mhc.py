"""Manifold Hyper-Connections (mHC, DeepSeek).

TPU counterpart of the reference's mHC Triton kernel family (reference:
common/triton/mhc.py + pytorch/triton/mhc.py — fused projection, scale,
log-space Sinkhorn, aggregate, expand+combine). The per-token matrices
are tiny (n=4: H is (M, 24)), so on TPU each step is a VPU-friendly
fused elementwise/matmul chain that XLA composes; numerics follow the
paper equations exactly (eq. 14-19, section 4.3.1):

  H   = x @ phi^T,           ms = mean(x^2)
  H_pre  = sigmoid(H[:, :n]   * alpha0 / rms + beta[:n])
  H_post = 2 sigmoid(H[:, n:2n] * alpha1 / rms + beta[n:2n])
  H_res  = Sinkhorn(H[:, 2n:] * alpha2 / rms + beta[2n:])
  out = (f + bias) outer H_post + x @ H_res     (expand-combine)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mhc_projection(x: jax.Array, phi: jax.Array,
                   ) -> Tuple[jax.Array, jax.Array]:
    """H = x @ phi^T and ms = mean(x^2, -1) (reference:
    mhc_fused_projection). x: (M, K); phi: (N=2n+n^2, K)."""
    xf = x.astype(jnp.float32)
    h = xf @ phi.astype(jnp.float32).T
    ms = jnp.mean(jnp.square(xf), axis=-1)
    return h, ms


def mhc_scale(h: jax.Array, alpha: jax.Array, beta: jax.Array,
              ms: jax.Array, n: int = 4, eps: float = 1e-6,
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RMS-scaled gates (reference: mhc_fused_scale, eq. 16-18)."""
    rms = jnp.sqrt(ms + eps)[:, None]
    a = alpha.astype(jnp.float32)
    b = beta.reshape(-1).astype(jnp.float32)
    hf = h.astype(jnp.float32)[:, :2 * n + n * n]
    pre = jax.nn.sigmoid(hf[:, :n] * a[0] / rms + b[:n])
    post = 2.0 * jax.nn.sigmoid(hf[:, n:2 * n] * a[1] / rms + b[n:2 * n])
    res = hf[:, 2 * n:] * a[2] / rms + b[2 * n:]
    return pre, post, res


def mhc_sinkhorn(h_res: jax.Array, iters: int = 20) -> jax.Array:
    """Log-space Sinkhorn normalization to a doubly stochastic matrix
    (reference: mhc_fused_sinkhorn, eq. 19; 20 iterations converge)."""
    logp = h_res.astype(jnp.float32)

    def body(logp, _):
        logp = logp - jax.nn.logsumexp(logp, axis=-1, keepdims=True)
        logp = logp - jax.nn.logsumexp(logp, axis=-2, keepdims=True)
        return logp, ()

    logp, _ = jax.lax.scan(body, logp, None, length=iters)
    return jnp.exp(logp)


def mhc_aggregate(x: jax.Array, h_pre: jax.Array) -> jax.Array:
    """Merge n streams: (..., C, n) x (..., n) -> (..., C)
    (reference: mhc_fused_aggregate)."""
    return jnp.einsum("...cn,...n->...c", x.astype(jnp.float32),
                      h_pre.astype(jnp.float32)).astype(x.dtype)


def mhc_expand_combine(
    f: jax.Array,                  # (..., C) sublayer output
    bias: Optional[jax.Array],     # (C,) or None
    h_post: jax.Array,             # (..., n)
    x: jax.Array,                  # (..., C, n) hyper-connection input
    h_res: jax.Array,              # (..., n, n)
) -> jax.Array:
    """out = (f + bias) ⊗ H_post + x @ H_res
    (reference: mhc_fused_expand_combine)."""
    ff = f.astype(jnp.float32)
    if bias is not None:
        ff = ff + bias.astype(jnp.float32)
    expanded = jnp.einsum("...c,...n->...cn", ff,
                          h_post.astype(jnp.float32))
    mixed = jnp.einsum("...cn,...nm->...cm", x.astype(jnp.float32),
                       h_res.astype(jnp.float32))
    return (expanded + mixed).astype(x.dtype)


def mhc_block(
    x: jax.Array,                  # (s, b, C, n) hyper-connection streams
    sublayer,                      # callable (s, b, C) -> (s, b, C)
    phi: jax.Array,                # (2n+n^2, n*C)
    alpha: jax.Array,              # (3,)
    beta: jax.Array,               # (2n+n^2,)
    *,
    n: int = 4,
    sublayer_bias: Optional[jax.Array] = None,
    sinkhorn_iters: int = 20,
) -> jax.Array:
    """Full hyper-connection wrapper around one transformer sublayer
    (the composition the reference's kernels implement piecewise)."""
    s, b, c, n_ = x.shape
    assert n_ == n
    flat = x.reshape(s * b, c * n)
    h, ms = mhc_projection(flat, phi)
    pre, post, res = mhc_scale(h, alpha, beta, ms, n)
    h_res = mhc_sinkhorn(res.reshape(s, b, n, n), sinkhorn_iters)
    agg = mhc_aggregate(x, pre.reshape(s, b, n))
    f = sublayer(agg)
    return mhc_expand_combine(f, sublayer_bias, post.reshape(s, b, n), x,
                              h_res)
