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


def _expert_mlp(h, w_up, w_down, group_sizes, acts, qset1, qset2,
                kernel_caches=None):
    """Grouped MLP over expert-contiguous rows.
    w_up: (E, H, n_act*F), w_down: (E, F, H)."""
    kc1, kc2 = kernel_caches if kernel_caches is not None else (None, None)
    n_act = len(acts)
    ffn = w_down.shape[1]
    z = grouped_dense(h, w_up, group_sizes, quantizer_set=qset1,
                      kernel_cache=kc1)
    if acts == ("clamped_swiglu",):
        from .ops.activation import clamped_swiglu
        a = clamped_swiglu(z.reshape(*z.shape[:-1], 2, ffn))
    elif n_act == 2:
        z = z.reshape(*z.shape[:-1], 2, ffn)
        a = _ACT[acts[0]](z[..., 0, :]) * _ACT[acts[1]](z[..., 1, :])
    else:
        a = _ACT[acts[0]](z)
    a = a.astype(h.dtype)
    return grouped_dense(a, w_down, group_sizes, quantizer_set=qset2,
                         kernel_cache=kc2)


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
    dropless: bool = True,
    kernel_caches=None,   # (up, down) from quantize_grouped_kernel
) -> Tuple[jax.Array, jax.Array]:
    """Returns (output with x's shape, aux_loss scalar).

    Under EP (``ep_axis``), ``dropless=True`` (default) routes every
    selected token to its expert via exact-size all-to-alls (reference:
    jax/moe.py:2071 fused dropless block; pytorch/permutation.py
    index-based dispatch); ``dropless=False`` keeps the bounded-memory
    Switch-style capacity path where overflow tokens fall back to the
    residual stream."""
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
                            *quantizer_sets, kernel_caches=kernel_caches)
        out = token_combine(out_e.astype(h.dtype), probs, aux)
    elif dropless:
        out = _moe_ep_dropless(h, probs, routing_map, w_up, w_down, acts,
                               quantizer_sets, ep_axis, topk,
                               kernel_caches=kernel_caches)
    else:
        out = _moe_ep(h, probs, routing_map, w_up, w_down, acts,
                      quantizer_sets, ep_axis, topk, capacity_factor,
                      kernel_caches=kernel_caches)
    return out.reshape(orig_shape).astype(x.dtype), aux_loss


# ---------------------------------------------------------------------------
# Expert-parallel path (inside shard_map over ep_axis; tokens sharded on
# the batch/token dim, experts sharded on the expert dim)
# ---------------------------------------------------------------------------

def _excl_cumsum(x, axis=0):
    return jnp.cumsum(x, axis=axis) - x


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ragged_a2a(axis_name, out_rows, x, in_off, send, out_off, recv,
                bwd_out_off):
    """Differentiable exact-size ragged all-to-all. ``bwd_out_off[i]`` is
    the offset in source i's operand where my return chunk lands (i.e.
    i's ``in_off[me]``) — precomputed by the caller from the gathered
    count matrix so the transpose needs no extra collective."""
    buf = jnp.zeros((out_rows, x.shape[1]), x.dtype)
    return jax.lax.ragged_all_to_all(x, buf, in_off, send, out_off, recv,
                                     axis_name=axis_name)


def _ragged_a2a_fwd(axis_name, out_rows, x, in_off, send, out_off, recv,
                    bwd_out_off):
    out = _ragged_a2a(axis_name, out_rows, x, in_off, send, out_off, recv,
                      bwd_out_off)
    return out, (x.shape, in_off, send, out_off, recv, bwd_out_off)


def _ragged_a2a_bwd(axis_name, out_rows, res, g):
    import numpy as np
    x_shape, in_off, send, out_off, recv, bwd_out_off = res
    buf = jnp.zeros(x_shape, g.dtype)
    dx = jax.lax.ragged_all_to_all(
        g, buf, _excl_cumsum(recv), recv, bwd_out_off, send,
        axis_name=axis_name)
    z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dx, z(in_off), z(send), z(out_off), z(recv), z(bwd_out_off))


_ragged_a2a.defvjp(_ragged_a2a_fwd, _ragged_a2a_bwd)


def _moe_ep_dropless(h, probs, routing_map, w_up, w_down, acts,
                     quantizer_sets, ep_axis, topk, kernel_caches=None):
    """Dropless EP: every selected token reaches its expert
    (reference: jax/moe.py:2071 — dropless permutation-based EP block).

    Comm layout: tokens are dispatched expert-contiguous locally (which
    is also destination-device-contiguous), all-to-all'd with exact
    per-pair counts, re-sorted expert-major on the receiver, run through
    the grouped MLP, and routed back through the inverse permutation +
    reverse all-to-all. All shapes are static: the receive buffer is
    sized at the worst case (every selection in the system targeting
    this device's experts, ep * T_local * topk rows); XLA's ragged dot
    skips the padding rows so FLOPs track the true token counts.

    On TPU the transfers use ``lax.ragged_all_to_all`` (exact bytes on
    the wire); XLA:CPU does not implement that op, so off-TPU the same
    exact semantics run over a dense slot-padded ``lax.all_to_all``
    (TE_TPU_MOE_A2A=ragged|dense overrides)."""
    import os
    ep = jax.lax.axis_size(ep_axis)
    me = jax.lax.axis_index(ep_axis)
    t, hidden = h.shape
    e_local = w_up.shape[0]
    s = t * topk                                    # local selections bound
    r_rows = ep * s                                 # worst-case recv rows

    mode = os.environ.get("TE_TPU_MOE_A2A", "")
    use_ragged = (mode == "ragged" or
                  (mode != "dense" and jax.default_backend() == "tpu"))

    disp, aux = token_dispatch(h, routing_map, num_out_tokens=s)
    gs = aux["group_sizes"]                         # (E,) rows per expert
    send_sizes = gs.reshape(ep, e_local).sum(1)     # (ep,) rows per dest dev
    in_off = _excl_cumsum(send_sizes)
    C = jax.lax.all_gather(send_sizes, ep_axis)     # (ep, ep): C[i, j]
    recv_sizes = C[:, me]
    out_off = _excl_cumsum(C, axis=0)[me]           # my chunk's slot at dest j
    bwd_out_off = _excl_cumsum(C, axis=1)[:, me]    # src i's in_off[me]
    # Per-source row counts into each of my local experts.
    GS = jax.lax.all_gather(gs, ep_axis)            # (ep, E)
    csrc = jax.lax.dynamic_slice(GS, (0, me * e_local), (ep, e_local))

    if use_ragged:
        recv_flat = _ragged_a2a(ep_axis, r_rows, disp, in_off, send_sizes,
                                out_off, recv_sizes, bwd_out_off)
        # src i's chunk is packed at excl_cumsum(recv_sizes)[i]; rows
        # inside are expert-minor — flat block starts in src-major order:
        starts = _excl_cumsum(csrc.reshape(-1))
    else:
        dev_of_row = jnp.repeat(jnp.arange(ep), send_sizes,
                                total_repeat_length=s)
        slot = jnp.arange(s) - in_off[dev_of_row]
        send_buf = jnp.zeros((ep, s, hidden), disp.dtype
                             ).at[dev_of_row, slot].set(disp)
        recv_buf = jax.lax.all_to_all(send_buf, ep_axis, 0, 0, tiled=False)
        recv_flat = recv_buf.reshape(r_rows, hidden)
        # src i's chunk occupies slot block [i*s, i*s + recv_sizes[i]).
        starts = (jnp.arange(ep)[:, None] * s
                  + _excl_cumsum(csrc, axis=1)).reshape(-1)

    # Re-sort received rows expert-major (my e_local experts contiguous).
    tot_e = csrc.sum(0)                             # (e_local,) rows/expert
    n_r = tot_e.sum()
    # expert-major flat ordering of the (src, expert) blocks:
    sizes_em = csrc.T.reshape(-1)                   # (e_local*ep,)
    starts_em = starts.reshape(ep, e_local).T.reshape(-1)
    tgt_em = _excl_cumsum(sizes_em)                 # contiguous target space
    p = jnp.arange(r_rows)
    blk = jnp.searchsorted(jnp.cumsum(sizes_em), p, side="right")
    blk = jnp.minimum(blk, sizes_em.shape[0] - 1)
    gather_idx = starts_em[blk] + (p - tgt_em[blk])
    valid_r = p < n_r
    expert_in = jnp.where(valid_r[:, None],
                          recv_flat[jnp.where(valid_r, gather_idx, 0)], 0)
    # Padding rows are zeros; attribute them to the last expert (zero
    # rows produce zero MLP output and are never gathered back).
    group_sizes_local = tot_e.at[-1].add(r_rows - n_r).astype(jnp.int32)

    out_e = _expert_mlp(expert_in, w_up, w_down, group_sizes_local, acts,
                        *quantizer_sets,
                        kernel_caches=kernel_caches).astype(h.dtype)

    # Inverse local sort: back to (src-major, expert-minor) recv layout.
    scat_idx = jnp.where(valid_r, gather_idx, r_rows)
    back_flat = jnp.zeros((r_rows, hidden), out_e.dtype
                          ).at[scat_idx].set(out_e, mode="drop")

    if use_ragged:
        ret = _ragged_a2a(ep_axis, s, back_flat, _excl_cumsum(recv_sizes),
                          recv_sizes, bwd_out_off, send_sizes, out_off)
    else:
        back = jax.lax.all_to_all(back_flat.reshape(ep, s, hidden),
                                  ep_axis, 0, 0, tiled=False)
        ret = back[dev_of_row, slot]

    return token_combine(ret, probs, aux)

def _moe_ep(h, probs, routing_map, w_up, w_down, acts, quantizer_sets,
            ep_axis, topk, capacity_factor, kernel_caches=None):
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
                        group_sizes, acts, *quantizer_sets,
                        kernel_caches=kernel_caches)
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
