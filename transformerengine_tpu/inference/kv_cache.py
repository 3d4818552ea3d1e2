"""KV cache — quantized cache payloads and the append/attend helpers.

TPU re-design of the reference inference cache stack (reference:
pytorch/attention/inference.py — InferenceParams :55,
NonPagedKVCacheManager :403, PagedKVCacheManager :591;
common/fused_attn/kv_cache.cu nvte_copy_to_kv_cache). Functional: the
cache lives in a Flax "cache" collection (or any pytree the caller
threads), appends are vmapped dynamic-slice writes, and decode attention
is the Pallas kernel in ops/decode_attention.py reading FP8 payloads
directly from HBM.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..quantize.dtypes import dtype_max, float8_e4m3, is_fp8_dtype


@dataclasses.dataclass(frozen=True)
class InferenceParams:
    """Static generation-session parameters (reference:
    inference.py:55)."""

    max_batch_size: int
    max_sequence_length: int
    kv_cache_dtype: jnp.dtype = jnp.bfloat16   # or float8_e4m3
    is_paged: bool = False
    page_size: int = 128
    # FP8 cache scale: None = calibrate from the prefill K/V (whole-batch
    # generation). A fixed value pins the per-layer dequant scale, which
    # continuous batching requires — slot admission must not rescale
    # payloads other slots still read.
    fixed_kv_scale: Optional[float] = None

    @property
    def is_fp8(self) -> bool:
        return is_fp8_dtype(self.kv_cache_dtype)


def quantize_for_cache(x: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    """Scale-and-saturate cast into the cache payload dtype. ``scale``
    is (1,) (whole batch) or (B,) (per slot) against (B, S, H, D)."""
    if not is_fp8_dtype(dtype):
        return x.astype(dtype)
    m = dtype_max(dtype)
    s = jnp.asarray(scale, jnp.float32).reshape(
        (-1,) + (1,) * (x.ndim - 1))
    return jnp.clip(x.astype(jnp.float32) * s, -m, m).astype(dtype)


def calibrate_kv_scale(k: jax.Array, v: jax.Array,
                       margin: float = 2.0,
                       per_slot: bool = False) -> jax.Array:
    """Per-layer scale from the prefill amax with headroom — appended
    decode tokens reuse it (delayed-scaling philosophy; the reference
    keeps per-tensor KV scales in the recipe state and recalibrates per
    cache manager, inference.py:403). ``per_slot`` returns a (B,) scale
    per batch row so continuous-batching admission calibrates each
    request into ITS slot without rescaling live neighbors."""
    kf, vf = jnp.abs(k.astype(jnp.float32)), jnp.abs(v.astype(jnp.float32))
    if per_slot:
        amax = jnp.maximum(jnp.max(kf, axis=(1, 2, 3)),
                           jnp.max(vf, axis=(1, 2, 3)))
    else:
        amax = jnp.maximum(jnp.max(kf), jnp.max(vf)).reshape(1)
    q_max = dtype_max(float8_e4m3)
    return jnp.where(amax > 0, q_max / (amax * margin), 1.0)


def cache_append_bhsd(
    cache_k: jax.Array,      # (B, Hkv, S_max, D) payload dtype
    cache_v: jax.Array,
    lengths: jax.Array,      # (B,)
    k_new: jax.Array,        # (B, S_new, Hkv, D) high precision
    v_new: jax.Array,
    kv_scale: Optional[jax.Array] = None,
):
    """Append into a pre-transposed (B, Hkv, S, D) cache — the layout the
    decode kernel reads directly (no per-step transpose copies)."""
    dtype = cache_k.dtype
    scale = kv_scale if kv_scale is not None else jnp.ones((1,), jnp.float32)
    kq = quantize_for_cache(k_new, scale, dtype).transpose(0, 2, 1, 3)
    vq = quantize_for_cache(v_new, scale, dtype).transpose(0, 2, 1, 3)

    if k_new.shape[1] == 1:
        # Single-token decode append: an indexed scatter updates the
        # cache IN PLACE inside scan loops (1.9 us/step on the decode
        # cache shape) where a vmapped dynamic_update_slice copies each
        # row's whole (Hkv, S, D) slab (62 us/step — 30x slower;
        # scripts/micro_cache_update.py).
        b = jnp.arange(k_new.shape[0])
        cache_k = cache_k.at[b, :, lengths, :].set(kq[:, :, 0, :])
        cache_v = cache_v.at[b, :, lengths, :].set(vq[:, :, 0, :])
        return cache_k, cache_v, lengths + 1

    def put(cache, new, start):
        return jax.lax.dynamic_update_slice(cache, new, (0, start, 0))

    cache_k = jax.vmap(put)(cache_k, kq, lengths)
    cache_v = jax.vmap(put)(cache_v, vq, lengths)
    return cache_k, cache_v, lengths + k_new.shape[1]


def cache_append(
    cache_k: jax.Array,      # (B, S_max, Hkv, D) payload dtype
    cache_v: jax.Array,
    lengths: jax.Array,      # (B,) current filled lengths
    k_new: jax.Array,        # (B, S_new, Hkv, D) high precision
    v_new: jax.Array,
    kv_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Append new tokens at each sequence's current length
    (reference: nvte_copy_to_kv_cache reindex/append)."""
    dtype = cache_k.dtype
    scale = kv_scale if kv_scale is not None else jnp.ones((1,), jnp.float32)
    kq = quantize_for_cache(k_new, scale, dtype)
    vq = quantize_for_cache(v_new, scale, dtype)

    if k_new.shape[1] == 1:
        # Single-token decode append: indexed scatter = in-place inside
        # scan loops (see cache_append_bhsd; the (Hkv, D) row is one
        # native (8, 128) tile at sublane position `lengths`).
        b = jnp.arange(k_new.shape[0])
        cache_k = cache_k.at[b, lengths].set(kq[:, 0])
        cache_v = cache_v.at[b, lengths].set(vq[:, 0])
        return cache_k, cache_v, lengths + 1

    def put(cache, new, start):
        return jax.lax.dynamic_update_slice(cache, new, (start, 0, 0))

    cache_k = jax.vmap(put)(cache_k, kq, lengths)
    cache_v = jax.vmap(put)(cache_v, vq, lengths)
    new_lengths = lengths + k_new.shape[1]
    return cache_k, cache_v, new_lengths


# ---------------------------------------------------------------------------
# Paged cache (reference: PagedKVCacheManager, inference.py:591)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedKVState:
    """Functional paged-cache state. Pages are allocated from a monotone
    free-list; the page table maps (seq, logical page) -> physical page."""

    pages_k: jax.Array        # (num_pages, page_size, Hkv, D)
    pages_v: jax.Array
    page_table: jax.Array     # (B, max_pages_per_seq) int32, -1 = unallocated
    lengths: jax.Array        # (B,)
    free_head: jax.Array      # () int32 — next free physical page


def paged_init(num_pages: int, page_size: int, batch: int,
               max_pages_per_seq: int, hkv: int, d: int,
               dtype=jnp.bfloat16) -> PagedKVState:
    return PagedKVState(
        pages_k=jnp.zeros((num_pages, page_size, hkv, d), dtype),
        pages_v=jnp.zeros((num_pages, page_size, hkv, d), dtype),
        page_table=jnp.full((batch, max_pages_per_seq), -1, jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
        free_head=jnp.zeros((), jnp.int32),
    )


def paged_append_token(state: PagedKVState, k_new: jax.Array, v_new: jax.Array,
                       kv_scale: Optional[jax.Array] = None) -> PagedKVState:
    """Append ONE token per sequence, allocating pages on demand.
    k_new/v_new: (B, 1, Hkv, D)."""
    b = k_new.shape[0]
    page_size = state.pages_k.shape[1]
    dtype = state.pages_k.dtype
    scale = kv_scale if kv_scale is not None else jnp.ones((1,), jnp.float32)
    kq = quantize_for_cache(k_new[:, 0], scale, dtype)
    vq = quantize_for_cache(v_new[:, 0], scale, dtype)

    logical = state.lengths // page_size
    offset = state.lengths % page_size
    needs_page = (offset == 0)
    # Allocate sequentially: rank among allocating sequences this step.
    alloc_rank = jnp.cumsum(needs_page.astype(jnp.int32)) - 1
    new_phys = state.free_head + alloc_rank
    table = state.page_table.at[jnp.arange(b), logical].set(
        jnp.where(needs_page, new_phys,
                  state.page_table[jnp.arange(b), logical]))
    phys = table[jnp.arange(b), logical]
    pages_k = state.pages_k.at[phys, offset].set(kq)
    pages_v = state.pages_v.at[phys, offset].set(vq)
    return PagedKVState(
        pages_k=pages_k, pages_v=pages_v, page_table=table,
        lengths=state.lengths + 1,
        free_head=state.free_head + needs_page.sum().astype(jnp.int32))


def paged_append_prompt(state: PagedKVState, k_new: jax.Array,
                        v_new: jax.Array,
                        kv_scale: Optional[jax.Array] = None,
                        ) -> PagedKVState:
    """Append a full prompt (B, S, Hkv, D) into an EMPTY paged cache
    (prefill). Pages are allocated contiguously per sequence —
    sequence b gets physical pages [free_head + b*npp, ...) — so the
    write is one reshape + scatter (reference: PagedKVCacheManager
    prefill allocation, inference.py:591)."""
    b, s, hkv, d = k_new.shape
    page = state.pages_k.shape[1]
    dtype = state.pages_k.dtype
    scale = kv_scale if kv_scale is not None else jnp.ones((1,), jnp.float32)
    npp = -(-s // page)                        # pages per sequence
    pad = npp * page - s

    def chunks(x):
        xq = quantize_for_cache(x, scale, dtype)
        xq = jnp.pad(xq, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return xq.reshape(b * npp, page, hkv, d)

    phys = (state.free_head
            + jnp.arange(b * npp, dtype=jnp.int32))      # (b*npp,)
    pages_k = state.pages_k.at[phys].set(chunks(k_new))
    pages_v = state.pages_v.at[phys].set(chunks(v_new))
    table = state.page_table.at[:, :npp].set(
        phys.reshape(b, npp))
    return PagedKVState(
        pages_k=pages_k, pages_v=pages_v, page_table=table,
        lengths=state.lengths + s,
        free_head=state.free_head + b * npp)


def paged_gather_kv(state: PagedKVState) -> Tuple[jax.Array, jax.Array]:
    """Materialize (B, S_max, Hkv, D) views from pages (gather path; the
    Pallas paged decode kernel replaces this on the hot path)."""
    b, mpps = state.page_table.shape
    page_size = state.pages_k.shape[1]
    idx = jnp.clip(state.page_table, 0, state.pages_k.shape[0] - 1)
    k = state.pages_k[idx]          # (B, mpps, page, hkv, d)
    v = state.pages_v[idx]
    b_, m_, p_, h_, d_ = k.shape
    return (k.reshape(b_, m_ * p_, h_, d_), v.reshape(b_, m_ * p_, h_, d_))
