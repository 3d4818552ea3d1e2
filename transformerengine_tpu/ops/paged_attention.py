"""Pallas paged decode attention: page-table gather inside the kernel.

TPU counterpart of the reference's paged KV attention (reference:
cuDNN Paged_KV_* layouts, fused_attn.h:49-54; common/fused_attn/
kv_cache.cu reindexing; pytorch PagedKVCacheManager). The page table is
a scalar-prefetch operand, so each grid step's BlockSpec index map picks
the right physical page — the kernel streams only the pages a sequence
actually owns, never materializing a contiguous view (unlike
inference.kv_cache.paged_gather_kv, the XLA fallback).

Layout: q (B, Hkv, G, D); pages (num_pages, page, Hkv, D) transposed to
(Hkv, num_pages, page, D) outside; page_table (B, max_pages).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _paged_kernel(table_ref, lengths_ref, scale_ref, q_ref, k_ref, v_ref,
                  sink_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  page_size: int, pages_per_seq: int, sm_scale: float,
                  use_sink: bool = False):
    bi, hk, pi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(pi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    length = lengths_ref[bi]
    s_start = pi * page_size

    @pl.when(s_start < length)
    def _body():
        kv_scale = scale_ref[bi]
        q = q_ref[0, 0].astype(jnp.float32)                  # (G, D)
        k = k_ref[0, 0].astype(jnp.float32) * kv_scale       # (page, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        kpos = s_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kpos < length
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.where(m_new <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
        p = jnp.where(mask, jnp.exp(s - m_new[:, :1]), 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        m_ref[...] = m_new
        v = v_ref[0, 0].astype(jnp.float32) * kv_scale
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pi == pages_per_seq - 1)
    def _epilogue():
        l = l_ref[..., :1]
        if use_sink:
            # Softmax sink: same epilogue trick as the flash/decode
            # kernels (one virtual no-value key per head).
            m = m_ref[..., :1]
            s0 = sink_ref[0][..., :1]                # (G, 1)
            m2 = jnp.maximum(m, s0)
            alpha = jnp.where(m2 <= NEG_INF / 2, 0.0, jnp.exp(m - m2))
            l2 = l * alpha + jnp.exp(s0 - m2)
            o_ref[0, 0] = ((acc_ref[...] * alpha) / l2).astype(o_ref.dtype)
        else:
            l_safe = jnp.where(l > 0, l, 1.0)
            o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,            # (B, 1, Hq, D) or (B, Hq, D)
    pages_k: jax.Array,      # (num_pages, page, Hkv, D)
    pages_v: jax.Array,
    page_table: jax.Array,   # (B, max_pages_per_seq) int32, -1 = unused
    lengths: jax.Array,      # (B,)
    *,
    kv_scale: Optional[jax.Array] = None,
    scaling_factor: Optional[float] = None,
    out_dtype=None,
    softmax_sink: Optional[jax.Array] = None,   # (Hq,) sink logits
) -> jax.Array:
    """Decode attention straight over the paged cache."""
    if q.ndim == 3:
        q = q[:, None]
    b, _, hq, d = q.shape
    num_pages, page, hkv, _ = pages_k.shape
    mpps = page_table.shape[1]
    g = hq // hkv
    scale = scaling_factor if scaling_factor is not None else 1.0 / d ** 0.5
    out_dtype = out_dtype or (
        q.dtype if q.dtype in (jnp.bfloat16, jnp.float32) else jnp.bfloat16)
    if kv_scale is None:
        kv_scale = jnp.ones((1,), jnp.float32)

    qg = q[:, 0].reshape(b, hkv, g, d)
    # (Hkv, num_pages, page, D) so page is the second-minor dim per head.
    kt = pages_k.transpose(2, 0, 1, 3)
    vt = pages_v.transpose(2, 0, 1, 3)
    table = jnp.clip(page_table, 0, num_pages - 1).astype(jnp.int32)

    use_sink = softmax_sink is not None
    if use_sink:
        sink = jnp.broadcast_to(
            softmax_sink.astype(jnp.float32).reshape(hkv, g, 1),
            (hkv, g, 128))
        sink_block = (1, g, 128)
        sink_idx = lambda bi, hk, pi, tab, ln, sc: (hk, 0, 0)
    else:
        sink = jnp.zeros((1, 1, 128), jnp.float32)
        sink_block = (1, 1, 128)
        sink_idx = lambda bi, hk, pi, tab, ln, sc: (0, 0, 0)

    grid = (b, hkv, mpps)
    kernel = functools.partial(
        _paged_kernel, page_size=page, pages_per_seq=mpps, sm_scale=scale,
        use_sink=use_sink)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # table, lengths, scale
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda bi, hk, pi, tab, ln, sc:
                         (bi, hk, 0, 0)),
            pl.BlockSpec((1, 1, page, d), lambda bi, hk, pi, tab, ln, sc:
                         (hk, tab[bi, pi], 0, 0)),
            pl.BlockSpec((1, 1, page, d), lambda bi, hk, pi, tab, ln, sc:
                         (hk, tab[bi, pi], 0, 0)),
            pl.BlockSpec(sink_block, sink_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bi, hk, pi, tab, ln, sc:
                               (bi, hk, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, d), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), out_dtype),
        interpret=_interpret(),
    )(table, lengths.astype(jnp.int32),
      jnp.broadcast_to(jnp.asarray(kv_scale, jnp.float32).reshape(-1),
                       (q.shape[0],)), qg, kt, vt, sink)
    return out.reshape(b, 1, hq, d)
