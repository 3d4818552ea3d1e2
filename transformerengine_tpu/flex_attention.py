"""Flex attention: user-defined score modifiers.

TPU counterpart of the reference's flex/score-mod attention (reference:
jax/cpp_extensions/flex_attention.py — score-mod callables compiled into
the attention graph; pytorch/attention/flex_attention.py adapter). On
TPU the score_mod traces straight into the XLA attention graph; XLA
fuses it into the softmax chain, so no kernel templating is needed.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# score_mod(score, batch_idx, head_idx, q_idx, kv_idx) -> score
ScoreMod = Callable[[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array],
                    jax.Array]
# mask_mod(batch_idx, head_idx, q_idx, kv_idx) -> bool
MaskMod = Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]


def flex_attention(
    q: jax.Array,               # (B, Sq, Hq, D)
    k: jax.Array,               # (B, Skv, Hkv, D)
    v: jax.Array,
    score_mod: Optional[ScoreMod] = None,
    mask_mod: Optional[MaskMod] = None,
    *,
    scaling_factor: Optional[float] = None,
) -> jax.Array:
    """Attention with arbitrary score/mask modification, differentiable
    through the modifier."""
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    group = hq // hkv
    scale = scaling_factor if scaling_factor is not None else 1.0 / d ** 0.5

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if group > 1:
        kf = jnp.repeat(kf, group, axis=2)
        vf = jnp.repeat(vf, group, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale

    bidx = jnp.arange(b)[:, None, None, None]
    hidx = jnp.arange(hq)[None, :, None, None]
    qidx = jnp.arange(sq)[None, None, :, None]
    kidx = jnp.arange(skv)[None, None, None, :]
    if score_mod is not None:
        s = score_mod(s, bidx, hidx, qidx, kidx)
    if mask_mod is not None:
        s = jnp.where(mask_mod(bidx, hidx, qidx, kidx), s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vf).astype(q.dtype)


# -- common modifiers (reference flex-attention examples) -------------------

def causal_mask_mod(b, h, qi, ki):
    return ki <= qi


def relative_position_bias_mod(bias_table: jax.Array) -> ScoreMod:
    """bias_table: (H, 2*max_dist+1) learned relative bias."""
    max_dist = (bias_table.shape[-1] - 1) // 2

    def mod(score, b, h, qi, ki):
        rel = jnp.clip(ki - qi, -max_dist, max_dist) + max_dist
        return score + bias_table[h, rel]
    return mod


def alibi_mod(slopes: jax.Array) -> ScoreMod:
    """ALiBi score modifier (reference: fused-attn ALiBi bias type)."""
    def mod(score, b, h, qi, ki):
        return score - slopes[h] * jnp.abs(qi - ki)
    return mod


def soft_cap_mod(cap: float) -> ScoreMod:
    """Logit soft-capping (Gemma-2 style)."""
    def mod(score, b, h, qi, ki):
        return cap * jnp.tanh(score / cap)
    return mod
