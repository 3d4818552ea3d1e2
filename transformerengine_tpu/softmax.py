"""Scaled softmax variants for unfused attention.

TPU counterpart of the reference fused-softmax kernel family (reference:
common/fused_softmax/ — nvte_scaled_softmax_*, nvte_scaled_masked_*,
nvte_scaled_upper_triang_masked_*; jax/softmax.py). On TPU the VPU
online-softmax is produced by XLA from this definition; a custom VJP
keeps the backward in the fused form (out * (dz - sum(dz*out))) like the
reference kernels.
"""
from __future__ import annotations

import enum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


class SoftmaxType(enum.Enum):
    """Mirrors the reference softmax kernel variants."""

    SCALED = "scaled"
    SCALED_MASKED = "scaled_masked"
    SCALED_UPPER_TRIANG_MASKED = "scaled_upper_triang_masked"


_NEG_INF = -30000.0  # matches the reference's masked fill in f32-safe range


# Reference name for the fusion-variant enum (jax/softmax.py
# SoftmaxFusionType); the sink-variant enum lives in attention.py
# (AttnSoftmaxType).
SoftmaxFusionType = SoftmaxType


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def softmax(logits, mask, softmax_type: SoftmaxType = SoftmaxType.SCALED,
            scale_factor: float = 1.0):
    out, _ = _softmax_fwd(logits, mask, softmax_type, scale_factor)
    return out


def _apply_mask(x, mask, softmax_type):
    if softmax_type is SoftmaxType.SCALED_UPPER_TRIANG_MASKED:
        q, k = x.shape[-2], x.shape[-1]
        tri = jnp.tril(jnp.ones((q, k), jnp.bool_), k - q)
        x = jnp.where(tri, x, _NEG_INF)
    if mask is not None and softmax_type in (
            SoftmaxType.SCALED_MASKED, SoftmaxType.SCALED_UPPER_TRIANG_MASKED):
        # mask: 1/True = masked out (reference convention)
        x = jnp.where(mask.astype(jnp.bool_), _NEG_INF, x)
    return x


def _softmax_fwd(logits, mask, softmax_type, scale_factor):
    x = logits.astype(jnp.float32) * scale_factor
    x = _apply_mask(x, mask, softmax_type)
    x = x - jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    ex = jnp.exp(x)
    out = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(logits.dtype)
    return out, out


def _softmax_bwd(softmax_type, scale_factor, out, dz):
    outf = out.astype(jnp.float32)
    dzf = dz.astype(jnp.float32)
    dx = outf * (dzf - jnp.sum(dzf * outf, axis=-1, keepdims=True))
    return (dx * scale_factor).astype(dz.dtype), None


softmax.defvjp(_softmax_fwd, _softmax_bwd)


def is_softmax_kernel_available(softmax_type, batch, heads, q_seqlen, k_seqlen,
                                dtype) -> bool:
    """Backend-capability probe mirroring the reference's
    is_softmax_kernel_available (jax/softmax.py). The XLA path handles
    every shape, so this is always True; kept for API parity."""
    return True
