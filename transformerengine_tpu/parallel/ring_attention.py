"""Context-parallel attention: all-gather and ring (P2P) strategies.

TPU re-design of the reference's context parallelism (reference:
pytorch/attention/dot_product_attention/context_parallel.py —
AttnFuncWithCPAndKVP2P :1407 / AttnFuncWithCPAndKVAllGather :3018;
jax/cpp_extensions/attention.py FusedRingAttnFwd/BwdPrimitive
:2543/:2758). Both strategies run *inside* ``shard_map`` over the cp
mesh axis with the sequence dimension sharded:

* **all-gather**: KV all-gathered over ICI, one flash call with a
  dynamic q-position offset. Backward reduce-scatters dKV via AD.
* **ring**: KV chunks rotate around the ring with ``lax.ppermute`` while
  each device computes partial attention against the resident chunk and
  merges online in log-sum-exp space. The backward runs the same ring,
  with the dKV accumulator co-rotating with its chunk so it arrives home
  fully reduced after cp steps (the reference's P2P ring equivalent —
  XLA overlaps the ppermute with the next step's compute).

Causal load balancing across ranks uses the striped/dual-chunk reorders
in ``attention_utils.py`` at the caller level.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.flash_attention import NEG_INF, _flash_bwd, _flash_fwd


def _bhsd(x):
    return x.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# All-gather strategy
# ---------------------------------------------------------------------------

def all_gather_attn(
    q: jax.Array,     # (B, L, Hq, D) local sequence shard
    k: jax.Array,     # (B, L, Hkv, D)
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    scaling_factor: Optional[float] = None,
    window_size: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """(reference: AttnFuncWithCPAndKVAllGather, context_parallel.py:3018)"""
    from ..attention import AttnMaskType
    from ..ops.flash_attention import flash_attention

    idx = jax.lax.axis_index(axis_name)
    L = q.shape[1]
    k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    return flash_attention(
        q, k_full, v_full, None,
        attn_mask_type=(AttnMaskType.CAUSAL if causal
                        else AttnMaskType.NO_MASK),
        scaling_factor=scaling_factor,
        window_size=window_size,
        q_position_offset=idx * L)


# ---------------------------------------------------------------------------
# Ring strategy
# ---------------------------------------------------------------------------

def _ring_perm(cp):
    return [(d, (d + 1) % cp) for d in range(cp)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ring_attn(q, k, v, axis_name: str, causal: bool, scale: float,
              window: Tuple[int, int]):
    out, _ = _ring_attn_fwd(q, k, v, axis_name, causal, scale, window)
    return out


def _ring_attn_fwd(q, k, v, axis_name, causal, scale, window):
    cp = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, L, hq, d = q.shape
    assert L % 8 == 0, f"ring attention needs 8-aligned local seqlen, got {L}"
    qt, kt, vt = _bhsd(q), _bhsd(k), _bhsd(v)

    num = jnp.zeros((b, hq, L, d), jnp.float32)
    den = jnp.zeros((b, hq, L), jnp.float32)
    m_run = jnp.full((b, hq, L), NEG_INF, jnp.float32)
    k_cur, v_cur = kt, vt
    for s in range(cp):
        j = (idx - s) % cp                       # chunk resident this step
        qoff = ((idx - j) * L).reshape(1).astype(jnp.int32)
        o_s, lse_s = _flash_fwd(
            qt, k_cur, v_cur, None, None, qoff, scale=scale, causal=causal,
            window=window, offset=0, block_q=512, block_k=512)
        m_new = jnp.maximum(m_run, lse_s)
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        alpha = jnp.where(m_run <= NEG_INF / 2, 0.0,
                          jnp.exp(m_run - m_safe))
        w = jnp.where(lse_s <= NEG_INF / 2, 0.0, jnp.exp(lse_s - m_safe))
        num = num * alpha[..., None] + o_s.astype(jnp.float32) * w[..., None]
        den = den * alpha + w
        m_run = m_new
        if s != cp - 1:
            k_cur, v_cur = jax.lax.ppermute(
                (k_cur, v_cur), axis_name, perm=_ring_perm(cp))

    den_safe = jnp.where(den > 0, den, 1.0)
    o = (num / den_safe[..., None]).astype(q.dtype)
    lse_tot = jnp.where(den > 0, m_run + jnp.log(den_safe), NEG_INF)
    out = o.transpose(0, 2, 1, 3)
    return out, (q, k, v, o, lse_tot)


def _ring_attn_bwd(axis_name, causal, scale, window, res, dout):
    q, k, v, o, lse = res
    cp = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, L, hq, d = q.shape
    qt, kt, vt = _bhsd(q), _bhsd(k), _bhsd(v)
    dot = _bhsd(dout)

    dq = jnp.zeros_like(qt, jnp.float32)
    dk_acc = jnp.zeros_like(kt, jnp.float32)
    dv_acc = jnp.zeros_like(vt, jnp.float32)
    k_cur, v_cur = kt, vt
    for s in range(cp):
        j = (idx - s) % cp
        qoff = ((idx - j) * L).reshape(1).astype(jnp.int32)
        dq_s, dk_s, dv_s, _ = _flash_bwd(
            qt, k_cur, v_cur, o, lse, dot, None, None, qoff, scale=scale,
            causal=causal, window=window, offset=0, block_q=512, block_k=512)
        dq = dq + dq_s.astype(jnp.float32)
        dk_acc = dk_acc + dk_s.astype(jnp.float32)
        dv_acc = dv_acc + dv_s.astype(jnp.float32)
        # Rotate the KV chunk together with its gradient accumulator; after
        # the final rotation (cp total) both are back at the owner.
        k_cur, v_cur, dk_acc, dv_acc = jax.lax.ppermute(
            (k_cur, v_cur, dk_acc, dv_acc), axis_name, perm=_ring_perm(cp))

    return (dq.transpose(0, 2, 1, 3).astype(q.dtype),
            dk_acc.transpose(0, 2, 1, 3).astype(k.dtype),
            dv_acc.transpose(0, 2, 1, 3).astype(v.dtype))


ring_attn.defvjp(_ring_attn_fwd, _ring_attn_bwd)


def ring_attn_under_shard_map(
    q, k, v, sequence_descriptor=None, *, axis_name: str,
    attn_mask_type=None, scaling_factor: Optional[float] = None,
    window_size: Optional[Tuple[int, int]] = None,
):
    """Entry used by attention.fused_attn for CPStrategy.RING."""
    from ..attention import AttnMaskType
    assert sequence_descriptor is None, (
        "ring attention with padded/packed batches not yet supported; "
        "use CP all-gather")
    causal = attn_mask_type.is_causal if attn_mask_type else False
    scale = scaling_factor if scaling_factor is not None \
        else 1.0 / q.shape[-1] ** 0.5
    window = tuple(window_size) if window_size is not None else (-1, -1)
    return ring_attn(q, k, v, axis_name, causal, float(scale), window)


# ---------------------------------------------------------------------------
# Ulysses (A2A) strategy
# ---------------------------------------------------------------------------

def ulysses_attn(
    q: jax.Array,     # (B, L, Hq, D) local sequence shard
    k: jax.Array,     # (B, L, Hkv, D)
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    scaling_factor=None,
    window_size=None,
) -> jax.Array:
    """Ulysses-style context parallelism: all-to-all reshards
    heads<->sequence so each device runs full-sequence attention on a
    head slice (reference: AttnFuncWithCPAndQKVOA2A,
    context_parallel.py:3877, flash_attn_a2a_communicate :438).
    Differentiable through the all-to-alls (AD reverses them)."""
    from ..attention import AttnMaskType
    from ..ops.flash_attention import flash_attention

    p = jax.lax.axis_size(axis_name)
    b, l, hq, d = q.shape
    hkv = k.shape[2]
    assert hq % p == 0 and hkv % p == 0, (
        f"Ulysses needs head counts divisible by cp={p}, got {hq}/{hkv}")

    def seq_to_head(x):
        # (B, L, H, D) -> (B, L*p, H/p, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    def head_to_seq(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    qg, kg, vg = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    out = flash_attention(
        qg, kg, vg, None,
        attn_mask_type=(AttnMaskType.CAUSAL if causal
                        else AttnMaskType.NO_MASK),
        scaling_factor=scaling_factor, window_size=window_size)
    return head_to_seq(out)


def hierarchical_attn(
    q: jax.Array,     # (B, L, Hq, D) — seq sharded over BOTH cp axes
    k: jax.Array,
    v: jax.Array,
    inner_axis: str,  # a2a within (fast ICI neighborhood)
    outer_axis: str,  # ring across (slower links)
    *,
    causal: bool = True,
    scaling_factor=None,
    window_size=None,
) -> jax.Array:
    """Hierarchical context parallelism: Ulysses A2A inside, ring P2P
    outside (reference: cp_comm_type="a2a+p2p",
    context_parallel.py:4726-4741 — A2A within an NVLink node, ring
    across nodes; here: A2A within the fast ICI neighborhood, ring over
    the long axis)."""
    p_in = jax.lax.axis_size(inner_axis)
    hq, hkv = q.shape[2], k.shape[2]
    assert hq % p_in == 0 and hkv % p_in == 0, (hq, hkv, p_in)
    scale = scaling_factor if scaling_factor is not None \
        else 1.0 / q.shape[-1] ** 0.5
    window = tuple(window_size) if window_size is not None else (-1, -1)

    def seq_to_head(x):
        return jax.lax.all_to_all(x, inner_axis, split_axis=2, concat_axis=1,
                                  tiled=True)

    def head_to_seq(x):
        return jax.lax.all_to_all(x, inner_axis, split_axis=1, concat_axis=2,
                                  tiled=True)

    qg, kg, vg = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    out = ring_attn(qg, kg, vg, outer_axis, causal, float(scale), window)
    return head_to_seq(out)
