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
