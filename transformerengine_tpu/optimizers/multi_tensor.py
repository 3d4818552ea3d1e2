"""Multi-tensor apply utilities (reference: common/multi_tensor/
l2norm.cu, scale.cu, compute_scale.cu; pytorch/optimizers/
multi_tensor_apply.py — multi_tensor_l2norm, multi_tensor_unscale_l2norm,
multi_tensor_scale, multi_tensor_compute_scale_and_scale_inv).

On TPU a "multi-tensor apply" is one jitted tree pass — XLA fuses the
elementwise chains across leaves — so these are plain functions over
pytrees. They exist for API parity (grad clipping, loss-scale
unscaling, E8M0 scale computation) rather than as kernels.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "multi_tensor_l2norm", "multi_tensor_unscale_l2norm",
    "multi_tensor_scale", "multi_tensor_compute_scale_and_scale_inv",
    "clip_by_global_norm",
]


def _leaf_sq(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf)


def multi_tensor_l2norm(tree, per_tensor: bool = False):
    """Global L2 norm of a pytree (and optionally per-leaf norms).
    Reference: nvte_multi_tensor_l2norm (multi_tensor/l2norm.cu)."""
    sqs = [_leaf_sq(l) for l in jax.tree_util.tree_leaves(tree)]
    total = jnp.sqrt(sum(sqs)) if sqs else jnp.float32(0.0)
    if per_tensor:
        per = jax.tree_util.tree_map(lambda l: jnp.sqrt(_leaf_sq(l)), tree)
        return total, per
    return total


def multi_tensor_unscale_l2norm(tree, inv_scale, per_tensor: bool = False):
    """L2 norm of ``tree * inv_scale`` without materializing the unscaled
    tree (loss-scaling: grad norms in unscaled units). Reference:
    nvte_multi_tensor_unscale_l2norm."""
    inv = jnp.asarray(inv_scale, jnp.float32)
    unscaled = jax.tree_util.tree_map(
        lambda l: l.astype(jnp.float32) * inv, tree)
    return multi_tensor_l2norm(unscaled, per_tensor=per_tensor)


def multi_tensor_scale(tree, scale):
    """``tree * scale`` leaf-wise in the leaf dtype (reference:
    nvte_multi_tensor_scale — loss-scale apply/unapply)."""
    s = jnp.asarray(scale, jnp.float32)
    return jax.tree_util.tree_map(
        lambda l: (l.astype(jnp.float32) * s).astype(l.dtype), tree)


def multi_tensor_compute_scale_and_scale_inv(
    amaxes, max_fp8: float, *, margin: float = 0.0,
    pow_2_scales: bool = False, epsilon: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Per-leaf (scale, scale_inv) from amaxes (reference:
    nvte_multi_tensor_compute_scale_and_scale_inv,
    multi_tensor/compute_scale.cu). ``pow_2_scales`` rounds the scale
    down to a power of two (E8M0-compatible)."""
    def one(amax):
        a = jnp.maximum(jnp.asarray(amax, jnp.float32), epsilon)
        scale = jnp.where(a > 0, max_fp8 / a / (2.0 ** margin),
                          jnp.float32(1.0))
        if pow_2_scales:
            scale = jnp.exp2(jnp.floor(jnp.log2(scale)))
        return scale
    scales = jax.tree_util.tree_map(one, amaxes)
    scale_invs = jax.tree_util.tree_map(lambda s: 1.0 / s, scales)
    return scales, scale_invs


def clip_by_global_norm(tree, max_norm: float,
                        norm: Optional[jax.Array] = None):
    """Scale ``tree`` so its global L2 norm is at most ``max_norm``
    (the multi_tensor_l2norm + multi_tensor_scale composition the
    reference's trainers run for grad clipping). Returns
    (clipped_tree, global_norm)."""
    g = norm if norm is not None else multi_tensor_l2norm(tree)
    factor = jnp.minimum(1.0, max_norm / jnp.maximum(g, 1e-12))
    return multi_tensor_scale(tree, factor), g
