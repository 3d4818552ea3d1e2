"""MoE token permutation: dispatch (sort by expert) and combine.

TPU counterpart of the reference permutation stack (reference:
common/permutation/ nvte_permute/nvte_unpermute; pytorch/permutation.py
:35-795; jax/permutation.py:103 token_dispatch / :403 token_combine).
On TPU the permutation is an argsort-based gather — XLA lowers sorts and
gathers natively — producing the expert-contiguous layout that
``lax.ragged_dot`` / the grouped-GEMM kernel consumes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def make_dispatch_indices(
    routing_map: jax.Array,            # (T, E) bool
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute the expert-sorted permutation.

    Returns:
      perm      (T*k_max total slots,) — actually (num_selected,) indices
                 into the flattened (T*E) selection grid, sorted by expert;
      group_sizes (E,) tokens per expert;
      inv_perm  scatter indices to undo the permutation.

    The output length is static: sum over the full (T, E) grid with
    unselected entries sorted to the end (stable sort on key
    expert_id * (selected) + BIG * (not selected)).
    """
    t, e = routing_map.shape
    sel = routing_map.reshape(-1)
    expert_id = jnp.broadcast_to(jnp.arange(e)[None, :], (t, e)).reshape(-1)
    key = jnp.where(sel, expert_id, e)          # unselected sort last
    perm = jnp.argsort(key, stable=True)        # (T*E,)
    group_sizes = routing_map.sum(0).astype(jnp.int32)
    inv_perm = jnp.argsort(perm)
    return perm, group_sizes, inv_perm


def token_dispatch(
    x: jax.Array,                      # (T, H)
    routing_map: jax.Array,            # (T, E) bool
    num_out_tokens: Optional[int] = None,
) -> Tuple[jax.Array, dict]:
    """Replicate each token to its selected experts, expert-contiguous
    (reference: jax/permutation.py:103). Returns (dispatched (N, H), aux)
    where N = num_out_tokens (static; default T*E upper bound — pass
    T*topk for the tight bound) and aux carries what combine needs."""
    t, e = routing_map.shape
    n = num_out_tokens if num_out_tokens is not None else t * e
    perm, group_sizes, inv_perm = make_dispatch_indices(routing_map)
    token_of_slot = perm[:n] // e               # source token per out slot
    valid = jnp.arange(n) < routing_map.sum()
    out = jnp.where(valid[:, None], x[token_of_slot], 0)
    aux = dict(perm=perm, inv_perm=inv_perm, group_sizes=group_sizes,
               token_of_slot=token_of_slot, valid=valid,
               routing_map=routing_map, num_tokens=t)
    return out, aux


def token_combine(
    expert_out: jax.Array,             # (N, H)
    probs: jax.Array,                  # (T, E) combine weights
    aux: dict,
) -> jax.Array:
    """Weighted scatter-add back to token order
    (reference: jax/permutation.py:403)."""
    t, e = probs.shape
    n = expert_out.shape[0]
    perm = aux["perm"][:n]
    token_of_slot = aux["token_of_slot"]
    expert_of_slot = perm % e
    w = probs[token_of_slot, expert_of_slot].astype(expert_out.dtype)
    w = jnp.where(aux["valid"], w, 0)
    contrib = expert_out * w[:, None]
    return jax.ops.segment_sum(contrib, token_of_slot, num_segments=t)


def moe_permute(x, routing_map, num_out_tokens=None):
    """Reference-named alias (pytorch moe_permute)."""
    return token_dispatch(x, routing_map, num_out_tokens)


def moe_unpermute(expert_out, probs, aux):
    """Reference-named alias (pytorch moe_unpermute)."""
    return token_combine(expert_out, probs, aux)
