"""Fused MoE router: top-k with score function + aux losses.

TPU counterpart of the reference router kernels (reference:
common/fused_router/ — nvte_fused_topk_with_score_function_*,
nvte_fused_moe_aux_loss_*; pytorch/router.py; jax/cpp_extensions/
router.py). On TPU the router is VPU-bound and small; the fused form is
a single jitted function whose backward XLA derives (the reference
hand-writes both) — numerics match the reference definitions.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def topk_softmax(scores, k):
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


def fused_topk_with_score_function(
    logits: jax.Array,                # (T, E)
    topk: int,
    *,
    score_function: str = "softmax",  # "softmax" | "sigmoid"
    use_pre_softmax: bool = False,    # softmax-then-topk vs topk-then-softmax
    num_groups: int = 0,              # group-limited routing (DeepSeek-style)
    group_topk: int = 0,
    scaling_factor: float = 1.0,
    expert_bias: Optional[jax.Array] = None,   # (E,) selection-only bias
) -> Tuple[jax.Array, jax.Array]:
    """Returns (probs (T, E) with zeros at unselected experts,
    routing_map (T, E) bool). Mirrors nvte_fused_topk_with_score_function
    (fused_router.h)."""
    t, e = logits.shape
    x = logits.astype(jnp.float32)

    if score_function == "sigmoid":
        scores = jax.nn.sigmoid(x)
    elif use_pre_softmax:
        scores = jax.nn.softmax(x, axis=-1)
    else:
        scores = x

    select = scores if expert_bias is None \
        else scores + expert_bias.astype(jnp.float32)

    if num_groups > 0 and group_topk > 0:
        # Group-limited: keep only the best `group_topk` expert groups
        # (ranked by the sum of each group's top-2 selection scores).
        gsize = e // num_groups
        grouped = select.reshape(t, num_groups, gsize)
        g2, _ = jax.lax.top_k(grouped, min(2, gsize))
        gscore = g2.sum(-1)
        _, gidx = jax.lax.top_k(gscore, group_topk)
        gmask = jnp.zeros((t, num_groups), bool).at[
            jnp.arange(t)[:, None], gidx].set(True)
        select = jnp.where(
            jnp.repeat(gmask, gsize, axis=1), select, -jnp.inf)

    _, idx = jax.lax.top_k(select, topk)
    routing_map = jnp.zeros((t, e), bool).at[
        jnp.arange(t)[:, None], idx].set(True)

    if score_function == "softmax" and not use_pre_softmax:
        masked = jnp.where(routing_map, x, -jnp.inf)
        probs = jax.nn.softmax(masked, axis=-1)
        probs = jnp.where(routing_map, probs, 0.0)
    else:
        probs = jnp.where(routing_map, scores, 0.0)
        if score_function == "sigmoid" and topk > 1:
            probs = probs / jnp.maximum(
                probs.sum(-1, keepdims=True), 1e-20)

    return probs * scaling_factor, routing_map


def fused_moe_aux_loss(
    probs: jax.Array,            # (T, E) full routing probabilities
    routing_map: jax.Array,      # (T, E) bool selections
    total_num_tokens: Optional[int] = None,
    *,
    topk: int = 1,
    coeff: float = 1e-2,
) -> jax.Array:
    """Switch-style load-balancing loss (reference:
    nvte_fused_moe_aux_loss_forward; aux_loss = E/(k*T^2) * sum_e
    tokens_per_expert_e * sum_probs_e * coeff)."""
    t, e = probs.shape
    total = total_num_tokens or t
    tokens_per_expert = routing_map.sum(0).astype(jnp.float32)
    prob_sum = probs.astype(jnp.float32).sum(0)
    loss = (tokens_per_expert * prob_sum).sum() * (
        e / (topk * float(total) ** 2))
    return loss * coeff


def compute_routing(
    logits: jax.Array,
    topk: int,
    **kwargs,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Router convenience: probs, map, aux_loss in one call."""
    coeff = kwargs.pop("aux_loss_coeff", 1e-2)
    probs, routing_map = fused_topk_with_score_function(
        logits, topk, **kwargs)
    # Aux loss uses the *full* softmax distribution (reference semantics).
    full = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    aux = fused_moe_aux_loss(full, routing_map, topk=topk, coeff=coeff)
    return probs, routing_map, aux
