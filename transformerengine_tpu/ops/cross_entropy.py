"""TP-aware fused cross entropy.

TPU counterpart of the reference's Triton online-softmax cross entropy
(reference: common/triton/cross_entropy.py, pytorch/cross_entropy.py
parallel_cross_entropy). Works on full or vocab-sharded logits: under
shard_map with the vocab dimension sharded on ``tp_axis``, the loss is
computed from local partials + two tiny collectives (pmax + psum),
never materializing the gathered logits. XLA keeps the log-softmax
fused, and AD produces the standard (softmax - onehot) backward.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array,        # (..., V_local)
    targets: jax.Array,       # (...) int32 — GLOBAL vocab ids
    *,
    tp_axis: Optional[str] = None,
    label_smoothing: float = 0.0,
    reduction: str = "mean",  # "mean" | "sum" | "none"
    ignore_index: int = -100,
) -> jax.Array:
    x = logits.astype(jnp.float32)
    v_local = x.shape[-1]

    if tp_axis is None:
        offset = 0
        v_total = v_local
    else:
        rank = jax.lax.axis_index(tp_axis)
        offset = rank * v_local
        v_total = v_local * jax.lax.axis_size(tp_axis)

    # Online-softmax statistics with cross-shard reduction. The max shift
    # is numerical-stability only (its gradient contribution cancels), so
    # stop_gradient keeps pmax out of the backward graph.
    m = jax.lax.stop_gradient(jnp.max(x, axis=-1))
    if tp_axis is not None:
        m = jax.lax.stop_gradient(jax.lax.pmax(m, tp_axis))
    se = jnp.sum(jnp.exp(x - m[..., None]), axis=-1)
    if tp_axis is not None:
        se = jax.lax.psum(se, tp_axis)
    lse = m + jnp.log(se)

    local_t = targets - offset
    in_shard = (local_t >= 0) & (local_t < v_local)
    tgt_logit = jnp.take_along_axis(
        x, jnp.clip(local_t, 0, v_local - 1)[..., None], axis=-1)[..., 0]
    tgt_logit = jnp.where(in_shard, tgt_logit, 0.0)
    if tp_axis is not None:
        tgt_logit = jax.lax.psum(tgt_logit, tp_axis)

    nll = lse - tgt_logit
    if label_smoothing > 0.0:
        mean_logit = jnp.mean(x, axis=-1)
        if tp_axis is not None:
            mean_logit = jax.lax.pmean(mean_logit, tp_axis)
        smooth = lse - mean_logit
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth

    valid = targets != ignore_index
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return nll.sum()
    return nll.sum() / jnp.maximum(valid.sum(), 1)


# Reference-parity alias (pytorch/cross_entropy.py name).
parallel_cross_entropy = cross_entropy
