"""Flex attention: user-defined score modifiers.

TPU counterpart of the reference's flex/score-mod attention (reference:
jax/cpp_extensions/flex_attention.py — score-mod callables compiled into
the attention graph; pytorch/attention/flex_attention.py adapter).

Three implementations, selected by ``impl``:

- ``"chunked"`` (default): a flash-style online-softmax sweep over KV
  blocks written as a ``lax.scan`` under a custom VJP — O(Sq * block_k)
  score memory in fwd AND bwd (the backward re-derives each score block
  instead of saving the (Sq, Skv) probability tensor), differentiable
  through q/k/v and through any parameters captured by ``score_mod``
  (extracted with ``jax.closure_convert`` and given real gradients).
- ``"flash"``: traces the score_mod straight into the Pallas flash
  kernel (ops/flash_attention.py). Fastest, but the mod must be
  arithmetic in its arguments (no table gathers — TPU kernels can't
  gather on vector indices), and mask_mods are folded in as a -1e30
  fill, and captured parameters do not receive gradients.
- ``"reference"``: the direct O(Sq*Skv) materialization, kept as the
  numerics ground truth for tests.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

# score_mod(score, batch_idx, head_idx, q_idx, kv_idx) -> score
ScoreMod = Callable[[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array],
                    jax.Array]
# mask_mod(batch_idx, head_idx, q_idx, kv_idx) -> bool
MaskMod = Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]

NEG_INF = -1e30     # m/lse floor
MASKED = -2e30      # masked fill; exp(MASKED - NEG_INF) underflows to 0


def _reference_flex(q, k, v, score_mod, mask_mod, scale):
    """Direct O(Sq*Skv) evaluation (numerics ground truth)."""
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    group = hq // hkv

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
        s = jnp.where(mask_mod(bidx, hidx, qidx, kidx), s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vf).astype(q.dtype)


# ---------------------------------------------------------------------------
# Chunked online-softmax path (custom VJP; O(Sq*block_k) score memory)
# ---------------------------------------------------------------------------

def _idx_grids(b, hkv, group, sq, block_k, k0):
    """(b, h, q, kv) index grids broadcastable against a
    (B, Hkv, G, Sq, block_k) score block. h is the QUERY head index
    hk*group + g."""
    bidx = jnp.arange(b)[:, None, None, None, None]
    hidx = (jnp.arange(hkv)[:, None] * group
            + jnp.arange(group)[None, :])[None, :, :, None, None]
    qidx = jnp.arange(sq)[None, None, None, :, None]
    kidx = (k0 + jnp.arange(block_k))[None, None, None, None, :]
    return bidx, hidx, qidx, kidx


def _block_scores(q5, k_blk, i, skv, scale, block_k, mod, maskm, mod_args):
    """Masked, modified scores for KV block i. Shared by fwd and bwd so
    the bwd replay is bit-identical. Returns (s_raw -> vjp input, s)."""
    b, hkv, group, sq, _ = q5.shape
    s_raw = jnp.einsum("bhgqd,bhkd->bhgqk", q5, k_blk,
                       preferred_element_type=jnp.float32) * scale
    bidx, hidx, qidx, kidx = _idx_grids(b, hkv, group, sq, block_k,
                                        i * block_k)
    s = mod(s_raw, bidx, hidx, qidx, kidx, *mod_args)
    valid = kidx < skv          # KV padding (block-multiple round-up)
    if maskm is not None:
        valid = jnp.logical_and(valid, maskm(bidx, hidx, qidx, kidx))
    return jnp.where(valid, s, MASKED)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _chunked_core(mod, maskm, scale, block_k, skv, q5, k4, v4, mod_args):
    o, _ = _chunked_fwd(mod, maskm, scale, block_k, skv, q5, k4, v4,
                        mod_args)
    return o


def _chunked_fwd(mod, maskm, scale, block_k, skv, q5, k4, v4, mod_args):
    b, hkv, group, sq, d = q5.shape
    nk = k4.shape[2] // block_k

    def body(carry, i):
        m, l, acc = carry
        k_blk = lax.dynamic_slice_in_dim(k4, i * block_k, block_k, axis=2)
        v_blk = lax.dynamic_slice_in_dim(v4, i * block_k, block_k, axis=2)
        s = _block_scores(q5, k_blk, i, skv, scale, block_k, mod, maskm,
                          mod_args)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhgqk,bhkd->bhgqd", p, v_blk,
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    init = (jnp.full((b, hkv, group, sq), NEG_INF, jnp.float32),
            jnp.zeros((b, hkv, group, sq), jnp.float32),
            jnp.zeros((b, hkv, group, sq, d), jnp.float32))
    (m, l, acc), _ = lax.scan(body, init, jnp.arange(nk))
    l_safe = jnp.where(l > 0, l, 1.0)
    o = acc / l_safe[..., None]
    lse = jnp.where(l > 0, m + jnp.log(l_safe), NEG_INF)
    return o, (q5, k4, v4, mod_args, o, lse)


def _chunked_bwd(mod, maskm, scale, block_k, skv, res, do):
    import numpy as np
    q5, k4, v4, mod_args, o, lse = res
    nk = k4.shape[2] // block_k
    delta = jnp.sum(do * o, axis=-1)                # (B,Hkv,G,Sq)
    # Only inexact closure constants get real gradients; integer consts
    # (index tables etc.) take float0 cotangents per JAX convention.
    inexact = tuple(jnp.issubdtype(a.dtype, jnp.inexact) for a in mod_args)

    def body(carry, i):
        dq, dargs = carry
        k_blk = lax.dynamic_slice_in_dim(k4, i * block_k, block_k, axis=2)
        v_blk = lax.dynamic_slice_in_dim(v4, i * block_k, block_k, axis=2)
        s, mod_vjp = jax.vjp(
            lambda q5_, args: _block_scores(q5_, k_blk, i, skv, scale,
                                            block_k, mod, maskm, args),
            q5, mod_args)
        p = jnp.exp(s - lse[..., None])             # masked -> exactly 0
        dv_blk = jnp.einsum("bhgqk,bhgqd->bhkd", p, do,
                            preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhgqd,bhkd->bhgqk", do, v_blk,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None])
        dq_blk, dargs_blk = mod_vjp(ds)
        # dk via a k-side vjp of the same replayed block scores.
        _, k_vjp = jax.vjp(
            lambda k_: _block_scores(q5, k_, i, skv, scale, block_k, mod,
                                     maskm, mod_args), k_blk)
        dk_blk, = k_vjp(ds)
        dq = dq + dq_blk
        dargs = tuple(
            x + g for x, g in zip(
                dargs, (g for g, ix in zip(dargs_blk, inexact) if ix)))
        return (dq, dargs), (dk_blk, dv_blk)

    init = (jnp.zeros_like(q5),
            tuple(jnp.zeros_like(a) for a, ix in zip(mod_args, inexact)
                  if ix))
    (dq, dargs), (dk_blocks, dv_blocks) = lax.scan(body, init,
                                                   jnp.arange(nk))
    # ys stack on axis 0: (nk, B, Hkv, block_k, D) -> (B, Hkv, Skv_p, D)
    dk = jnp.moveaxis(dk_blocks, 0, 2).reshape(k4.shape)
    dv = jnp.moveaxis(dv_blocks, 0, 2).reshape(v4.shape)
    it = iter(dargs)
    dargs_out = tuple(
        next(it) if ix else np.zeros(a.shape, jax.dtypes.float0)
        for a, ix in zip(mod_args, inexact))
    return dq, dk, dv, dargs_out


_chunked_core.defvjp(_chunked_fwd, _chunked_bwd)


def _chunked_flex(q, k, v, score_mod, mask_mod, scale, block_k):
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    group = hq // hkv
    block_k = max(128, min(block_k, -(-skv // 128) * 128))
    skv_p = -(-skv // block_k) * block_k

    # (B, Hkv, G, Sq, D) query / (B, Hkv, Skv_p, D) key-value, f32.
    q5 = q.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        b, hkv, group, sq, d)
    k4 = k.astype(jnp.float32).transpose(0, 2, 1, 3)
    v4 = v.astype(jnp.float32).transpose(0, 2, 1, 3)
    if skv_p != skv:
        k4 = jnp.pad(k4, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v4 = jnp.pad(v4, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))

    # Extract parameters captured by the score_mod closure so they get
    # real gradients (jax.closure_convert: tracers -> explicit args).
    sm = score_mod if score_mod is not None else (
        lambda s, bi, hi, qi, ki: s)
    ex_s = jax.ShapeDtypeStruct((b, hkv, group, sq, block_k), jnp.float32)
    ex_b = jax.ShapeDtypeStruct((b, 1, 1, 1, 1), jnp.int32)
    ex_h = jax.ShapeDtypeStruct((1, hkv, group, 1, 1), jnp.int32)
    ex_q = jax.ShapeDtypeStruct((1, 1, 1, sq, 1), jnp.int32)
    ex_k = jax.ShapeDtypeStruct((1, 1, 1, 1, block_k), jnp.int32)
    mod, consts = jax.closure_convert(sm, ex_s, ex_b, ex_h, ex_q, ex_k)

    o = _chunked_core(mod, mask_mod, float(scale), block_k, skv,
                      q5, k4, v4, tuple(consts))
    return o.reshape(b, hq, sq, d).transpose(0, 2, 1, 3).astype(q.dtype)


def flex_attention(
    q: jax.Array,               # (B, Sq, Hq, D)
    k: jax.Array,               # (B, Skv, Hkv, D)
    v: jax.Array,
    score_mod: Optional[ScoreMod] = None,
    mask_mod: Optional[MaskMod] = None,
    *,
    scaling_factor: Optional[float] = None,
    impl: str = "auto",         # auto | chunked | flash | reference
    block_k: int = 512,
) -> jax.Array:
    """Attention with arbitrary score/mask modification, differentiable
    through the modifier (including parameters captured in its closure
    on the chunked path)."""
    d = q.shape[-1]
    scale = scaling_factor if scaling_factor is not None else 1.0 / d**0.5
    if impl == "auto":
        impl = "chunked"
    if impl == "reference":
        return _reference_flex(q, k, v, score_mod, mask_mod, scale)
    if impl == "chunked":
        return _chunked_flex(q, k, v, score_mod, mask_mod, scale, block_k)
    if impl == "flash":
        from .ops.flash_attention import flash_attention
        mod = score_mod
        if mask_mod is not None:
            inner = score_mod if score_mod is not None else (
                lambda s, *a: s)
            mod = lambda s, bi, hi, qi, ki: jnp.where(
                mask_mod(bi, hi, qi, ki), inner(s, bi, hi, qi, ki),
                NEG_INF)
        if mod is None:
            return flash_attention(q, k, v, scaling_factor=scale)
        return flash_attention(q, k, v, scaling_factor=scale,
                               score_mod=mod)
    raise ValueError(f"unknown flex impl {impl!r}")


# -- common modifiers (reference flex-attention examples) -------------------

def causal_mask_mod(b, h, qi, ki):
    return ki <= qi


def relative_position_bias_mod(bias_table: jax.Array) -> ScoreMod:
    """bias_table: (H, 2*max_dist+1) learned relative bias. Table gather:
    chunked/reference impls only (not kernel-traceable)."""
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


def alibi_arith_mod(num_heads: int) -> ScoreMod:
    """ALiBi with the standard geometric slope computed arithmetically
    from the head index — kernel-traceable (impl='flash')."""
    def mod(score, b, h, qi, ki):
        slope = jnp.exp2(-(h.astype(jnp.float32) + 1.0)
                         * (8.0 / num_heads))
        return score - slope * jnp.abs(qi - ki).astype(jnp.float32)
    return mod


def soft_cap_mod(cap: float) -> ScoreMod:
    """Logit soft-capping (Gemma-2 style). Arithmetic: kernel-traceable."""
    def mod(score, b, h, qi, ki):
        return cap * jnp.tanh(score / cap)
    return mod
