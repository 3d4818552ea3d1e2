"""Rotary position embeddings (RoPE).

TPU counterpart of the reference fused-RoPE kernels (reference:
common/fused_rope/ — nvte_fused_rope_forward/backward,
nvte_fused_qkv_rope; pytorch/attention/rope.py). On TPU this is a pure
VPU elementwise op that XLA fuses into the surrounding QKV projection,
so no dedicated Pallas kernel is needed; the math (including the
interleaved vs half-rotated layouts and dynamic position offsets for
decode) mirrors the reference.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rope_frequencies(
    dim: int,
    max_seq_len: int,
    *,
    base: float = 10000.0,
    scaling_factor: Optional[float] = None,
) -> jax.Array:
    """Precompute the (max_seq_len, dim) cos/sin phase table input
    ``theta_i(t) = t * base^(-2i/dim)`` (reference: rope.py
    RotaryPositionEmbedding.forward)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_seq_len, dtype=jnp.float32)
    if scaling_factor is not None:
        t = t / scaling_factor
    return jnp.outer(t, inv_freq)  # (S, dim/2)


def apply_rope(
    x: jax.Array,                      # (B, S, H, D)
    freqs: jax.Array,                  # (>=S, rot_dim/2)
    *,
    positions: Optional[jax.Array] = None,   # (B, S) absolute positions
    interleaved: bool = False,
) -> jax.Array:
    """Rotate the leading ``2*freqs.shape[-1]`` channels of ``x``.

    ``interleaved=False`` is the GPT-NeoX/Llama "rotate half" layout,
    ``True`` the GPT-J interleaved layout (reference: fused_rope.h
    interleaved flag).
    """
    b, s, h, d = x.shape
    half = freqs.shape[-1]
    rot = 2 * half
    if positions is not None:
        phase = freqs[positions]                   # (B, S, half)
        phase = phase[:, :, None, :]               # (B, S, 1, half)
    else:
        phase = freqs[:s][None, :, None, :]        # (1, S, 1, half)
    cos = jnp.cos(phase).astype(jnp.float32)
    sin = jnp.sin(phase).astype(jnp.float32)

    xf = x.astype(jnp.float32)
    x_rot, x_pass = xf[..., :rot], xf[..., rot:]
    if interleaved:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(*x_rot.shape)
    else:
        x1 = x_rot[..., :half]
        x2 = x_rot[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([out, x_pass], axis=-1).astype(x.dtype)


def apply_rope_thd(
    x: jax.Array,                      # (T, H, D) packed tokens
    cu_seqlens: jax.Array,             # (N+1,) cumulative sequence lengths
    freqs: jax.Array,                  # (>=max_len, rot_dim/2)
    *,
    interleaved: bool = False,
    start_positions: Optional[jax.Array] = None,   # (N,) per-sequence
) -> jax.Array:
    """RoPE over a THD (packed ragged) batch (reference:
    nvte_fused_rope_forward with qkv_format=thd, fused_rope.h:41 —
    cu_seqlens picks each token's position within its own sequence).

    ``start_positions`` offsets each sequence's first token (the
    reference's start_positions operand; e.g. continued decode)."""
    t = x.shape[0]
    tok = jnp.arange(t, dtype=jnp.int32)
    seq = jnp.searchsorted(cu_seqlens[1:], tok, side="right").astype(jnp.int32)
    pos = tok - cu_seqlens[seq]
    if start_positions is not None:
        pos = pos + start_positions[seq]
    out = apply_rope(x[None], freqs, positions=pos[None],
                     interleaved=interleaved)
    return out[0]


def apply_rope_qkv(
    qkv: jax.Array,                    # (B, S, Hq*D + 2*Hkv*D) fused proj
    freqs: jax.Array,
    *,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    positions: Optional[jax.Array] = None,
    interleaved: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Split a fused QKV projection and rotate Q and K in one pass
    (reference: nvte_fused_qkv_rope — the fused kernel exists on GPU to
    avoid three dispatches; on TPU XLA fuses the slices + rotation into
    the projection epilogue, so this is the API analog only). Returns
    (q, k, v) as (B, S, H, D)."""
    b, s, _ = qkv.shape
    hq, hkv, d = num_q_heads, num_kv_heads, head_dim
    q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
    q = apply_rope(q.reshape(b, s, hq, d), freqs, positions=positions,
                   interleaved=interleaved)
    k = apply_rope(k.reshape(b, s, hkv, d), freqs, positions=positions,
                   interleaved=interleaved)
    return q, k, v.reshape(b, s, hkv, d)
