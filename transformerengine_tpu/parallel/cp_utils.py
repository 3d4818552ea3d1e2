"""Context-parallel causal load-balancing reorders.

TPU counterpart of the reference's CP token reorders (reference:
pytorch context_parallel.py DualChunkSwap doc :4666-4721;
jax/cpp_extensions/attention.py reorder_causal_dual_chunk_swap :1241,
reorder_causal_striped :1293). With causal masking and contiguous
sequence sharding, later ranks do strictly more attention work; these
reorders rebalance the diagonal:

* dual-chunk-swap: split the sequence into 2*cp chunks; rank i gets
  chunks (i, 2*cp-1-i) — each rank sees one early and one late chunk.
* striped: token t goes to rank t % cp (interleaved stripes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def reorder_causal_dual_chunk_swap(x: jax.Array, cp_size: int,
                                   seq_dim: int = 1) -> jax.Array:
    """Global (unsharded) sequence -> load-balanced order. Applying the
    same reorder to q/k/v before sharding over cp and the inverse to the
    output preserves attention semantics when positions travel with the
    tokens (reference: context_parallel.py:4666)."""
    s = x.shape[seq_dim]
    assert s % (2 * cp_size) == 0, (s, cp_size)
    chunk = s // (2 * cp_size)
    order = []
    for i in range(cp_size):
        order += [i, 2 * cp_size - 1 - i]
    idx = jnp.concatenate(
        [jnp.arange(chunk) + c * chunk for c in order])
    return jnp.take(x, idx, axis=seq_dim)


def inverse_reorder_causal_dual_chunk_swap(x: jax.Array, cp_size: int,
                                           seq_dim: int = 1) -> jax.Array:
    s = x.shape[seq_dim]
    chunk = s // (2 * cp_size)
    order = []
    for i in range(cp_size):
        order += [i, 2 * cp_size - 1 - i]
    inv = [0] * (2 * cp_size)
    for pos, c in enumerate(order):
        inv[c] = pos
    idx = jnp.concatenate(
        [jnp.arange(chunk) + p * chunk for p in inv])
    return jnp.take(x, idx, axis=seq_dim)


def reorder_causal_striped(x: jax.Array, cp_size: int,
                           seq_dim: int = 1,
                           stripe_size: int = 1) -> jax.Array:
    """Stripe tokens across ranks: [t0, t_cp, t_2cp, ... | t1, ...]
    (reference: cpp_extensions/attention.py:1293). ``stripe_size`` > 1
    deals contiguous groups of that many tokens round-robin instead of
    single tokens (the reference recommends 128 for THD+SWA striping so
    stripes stay aligned to kernel blocks)."""
    s = x.shape[seq_dim]
    assert s % (cp_size * stripe_size) == 0, (s, cp_size, stripe_size)
    idx = jnp.arange(s).reshape(
        s // (cp_size * stripe_size), cp_size, stripe_size
    ).transpose(1, 0, 2).reshape(-1)
    return jnp.take(x, idx, axis=seq_dim)


def inverse_reorder_causal_striped(x: jax.Array, cp_size: int,
                                   seq_dim: int = 1,
                                   stripe_size: int = 1) -> jax.Array:
    s = x.shape[seq_dim]
    idx = jnp.arange(s).reshape(
        cp_size, s // (cp_size * stripe_size), stripe_size
    ).transpose(1, 0, 2).reshape(-1)
    return jnp.take(x, idx, axis=seq_dim)


def dual_chunk_positions(cp_size: int, local_len: int,
                         rank: jax.Array) -> jax.Array:
    """Absolute token positions of a rank's shard under dual-chunk-swap
    (feed as segment positions / RoPE positions so masking and rotary
    stay correct after the reorder)."""
    chunk = local_len // 2
    first = rank * chunk
    second = (2 * cp_size - 1 - rank) * chunk
    return jnp.concatenate([first + jnp.arange(chunk),
                            second + jnp.arange(chunk)])
