"""MoE block: routing -> dispatch -> expert MLP -> combine, with
optional expert parallelism under shard_map.

TPU counterpart of the reference MoE stack (reference: jax/moe.py:2071
moe() — shard_map EP block with dispatch/combine all-to-alls;
pytorch router+permutation+GroupedLinear assembled by Megatron). The EP
path uses fixed-capacity all-to-alls (Switch-style) so shapes stay
static for XLA; dropped-token stats are returned for observability.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .grouped_dense import grouped_dense
from .ops.activation import _ACT, normalize_activation_type
from .ops.router import compute_routing
from .permutation import token_combine, token_dispatch
from .quantize.quantizer import QuantizerSet, noop_quantizer_set


def _expert_mlp(h, w_up, w_down, group_sizes, acts, qset1, qset2):
    """Grouped MLP over expert-contiguous rows.
    w_up: (E, H, n_act*F), w_down: (E, F, H)."""
    n_act = len(acts)
    ffn = w_down.shape[1]
    z = grouped_dense(h, w_up, group_sizes, quantizer_set=qset1)
    if n_act == 2:
        z = z.reshape(*z.shape[:-1], 2, ffn)
        a = _ACT[acts[0]](z[..., 0, :]) * _ACT[acts[1]](z[..., 1, :])
    else:
        a = _ACT[acts[0]](z)
    a = a.astype(h.dtype)
    return grouped_dense(a, w_down, group_sizes, quantizer_set=qset2)


def moe(
    x: jax.Array,                     # (T, H) or (B, S, H)
    router_weight: jax.Array,         # (H, E)
    w_up: jax.Array,                  # (E, H, n_act*F)
    w_down: jax.Array,                # (E, F, H)
    *,
    topk: int = 2,
    activation_type: Union[str, Sequence[str]] = "swiglu",
    score_function: str = "softmax",
    aux_loss_coeff: float = 1e-2,
    expert_bias: Optional[jax.Array] = None,
    num_groups: int = 0,
    group_topk: int = 0,
    quantizer_sets: Tuple[QuantizerSet, QuantizerSet] = (
        noop_quantizer_set, noop_quantizer_set),
    ep_axis: Optional[str] = None,
    capacity_factor: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (output with x's shape, aux_loss scalar)."""
    orig_shape = x.shape
    h = x.reshape(-1, x.shape[-1])
    t = h.shape[0]
    e = router_weight.shape[-1]
    acts = normalize_activation_type(activation_type)

    logits = (h.astype(jnp.float32) @ router_weight.astype(jnp.float32))
    probs, routing_map, aux_loss = compute_routing(
        logits, topk, score_function=score_function,
        aux_loss_coeff=aux_loss_coeff, expert_bias=expert_bias,
        num_groups=num_groups, group_topk=group_topk)

    if ep_axis is None:
        disp, aux = token_dispatch(h, routing_map, num_out_tokens=t * topk)
        out_e = _expert_mlp(disp, w_up, w_down, aux["group_sizes"], acts,
                            *quantizer_sets)
        out = token_combine(out_e.astype(h.dtype), probs, aux)
    else:
        out = _moe_ep(h, probs, routing_map, w_up, w_down, acts,
                      quantizer_sets, ep_axis, topk, capacity_factor)
    return out.reshape(orig_shape).astype(x.dtype), aux_loss


# ---------------------------------------------------------------------------
# Expert-parallel path (inside shard_map over ep_axis; tokens sharded on
# the batch/token dim, experts sharded on the expert dim)
# ---------------------------------------------------------------------------

def _moe_ep(h, probs, routing_map, w_up, w_down, acts, quantizer_sets,
            ep_axis, topk, capacity_factor):
    """Fixed-capacity dispatch/combine all-to-alls
    (reference: jax/moe.py shard_map EP with a2a; Switch-Transformer
    capacity semantics — overflow tokens are dropped from the expert
    update but still pass through via the residual connection upstream)."""
    ep = jax.lax.axis_size(ep_axis)
    t, hidden = h.shape
    e_local = w_up.shape[0]          # experts resident on this device
    e = e_local * ep
    cap = int(capacity_factor * t * topk / e) + 1
    cap = -(-cap // 8) * 8           # 8-align for TPU tiling

    # Position of each (token, expert) selection within its expert's
    # local send buffer (capacity-limited, first-come-first-served).
    sel = routing_map                              # (T, E)
    pos_in_expert = jnp.cumsum(sel.astype(jnp.int32), axis=0) - 1
    keep = sel & (pos_in_expert < cap)
    dropped = sel.sum() - keep.sum()

    # Build send buffers: (E, cap, H) token payloads per destination expert,
    # scattered via explicit indices (static-size, scan-free).
    tok_idx = jnp.broadcast_to(jnp.arange(t)[:, None], sel.shape)
    k_flat = keep.reshape(-1)
    slot = jnp.where(k_flat, pos_in_expert.reshape(-1), cap)  # cap = drop bin
    eid = jnp.broadcast_to(jnp.arange(e)[None, :], sel.shape).reshape(-1)
    payload = h[tok_idx.reshape(-1)]
    src = jnp.zeros((e, cap + 1, hidden), h.dtype).at[eid, slot].set(
        jnp.where(k_flat[:, None], payload, 0))[:, :cap]

    # all-to-all: (E, cap, H) -> regroup by expert owner.
    recv = jax.lax.all_to_all(
        src.reshape(ep, e_local, cap, hidden), ep_axis, 0, 0, tiled=False)
    # recv: (ep, e_local, cap, H) — tokens from each source device.
    expert_in = recv.transpose(1, 0, 2, 3).reshape(e_local, ep * cap, hidden)

    group_sizes = jnp.full((e_local,), ep * cap, jnp.int32)
    out_e = _expert_mlp(expert_in.reshape(-1, hidden), w_up, w_down,
                        group_sizes, acts, *quantizer_sets)
    out_e = out_e.reshape(e_local, ep, cap, hidden).transpose(1, 0, 2, 3)

    back = jax.lax.all_to_all(out_e, ep_axis, 0, 0, tiled=False)
    back = back.reshape(e, cap, hidden)

    # Combine: gather each kept selection's result, weight, and sum.
    res = jnp.concatenate([back, jnp.zeros((e, 1, hidden), back.dtype)],
                          axis=1)                    # drop bin reads zeros
    gathered = res[eid, slot]                        # (T*E, H)
    w = (probs.reshape(-1) * k_flat).astype(gathered.dtype)
    out = jax.ops.segment_sum(gathered * w[:, None],
                              tok_idx.reshape(-1), num_segments=t)
    return out


def sample_moe_sizes(name: str = "mixtral-8x7b"):
    """Convenience shape presets for tests/benchmarks."""
    presets = {
        "mixtral-8x7b": dict(hidden=4096, ffn=14336, experts=8, topk=2),
        "tiny": dict(hidden=64, ffn=128, experts=4, topk=2),
    }
    return presets[name]
