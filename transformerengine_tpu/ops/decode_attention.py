"""Pallas TPU decode attention (single-query flash over a KV cache).

The TPU-native replacement for the reference's KV-cache attention path
(reference: common/fused_attn/kv_cache.cu + cuDNN Paged_KV layouts,
pytorch/attention/inference.py). One query token per sequence attends
over its cached history; the kernel streams the cache from HBM in
blocks with an online softmax, dequantizing FP8 payloads in VMEM
(per-layer scalar scale) — decode is HBM-bandwidth-bound, so FP8 cache
halves the bytes.

Grid note: all KV heads are processed per program ((B, S-blocks) grid)
so each cache DMA moves Hkv*block_s*D bytes — per-(batch, head) grids
measured DMA-latency-bound on v5e (128 x 64KB transfers = 0.27 ms/layer;
this layout is ~16 x 0.5 MB).

Layout: q (B, Hkv, G, D) where G = Hq // Hkv, cache (B, S_max, Hkv, D)
transposed to (B, Hkv, S, D) outside, lengths (B,).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_S = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decode_kernel(lengths_ref, scales_ref, q_ref, k_ref, v_ref, sink_ref,
                   o_ref, acc_ref, m_ref, l_ref, *,
                   scale: float, block_s: int, num_s_blocks: int,
                   window_left: int, use_sink: bool = False):
    bi, si = pl.program_id(0), pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    length = lengths_ref[bi]
    s_start = si * block_s
    run = s_start < length
    if window_left >= 0:
        run = jnp.logical_and(run, s_start + block_s >= length - window_left)

    @pl.when(run)
    def _body():
        kv_scale = scales_ref[bi]
        q = q_ref[0].astype(jnp.float32)                     # (Hkv, G, D)
        k = k_ref[0].astype(jnp.float32) * kv_scale          # (Hkv, S, D)
        # batched over kv heads: (Hkv, G, S)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        kpos = s_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = kpos < length
        if window_left >= 0:
            mask = jnp.logical_and(mask, kpos >= length - 1 - window_left)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]                                  # (Hkv, G, 128)
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.where(m_new <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
        p = jnp.where(mask, jnp.exp(s - m_new[:, :, :1]), 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=2, keepdims=True), l_ref.shape)
        m_ref[...] = m_new
        v = v_ref[0].astype(jnp.float32) * kv_scale          # (Hkv, S, D)
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (Hkv, G, D)
        acc_ref[...] = acc_ref[...] * alpha[:, :, :1] + pv

    @pl.when(si == num_s_blocks - 1)
    def _epilogue():
        l = l_ref[..., :1]
        if use_sink:
            # Softmax sink: one virtual no-value key per head joins the
            # denominator (same epilogue trick as the flash kernel).
            m = m_ref[..., :1]
            s0 = sink_ref[..., :1]                   # (Hkv, G, 1)
            m2 = jnp.maximum(m, s0)
            alpha = jnp.where(m2 <= NEG_INF / 2, 0.0, jnp.exp(m - m2))
            l2 = l * alpha + jnp.exp(s0 - m2)
            o_ref[0] = ((acc_ref[...] * alpha) / l2).astype(o_ref.dtype)
        else:
            l_safe = jnp.where(l > 0, l, 1.0)
            o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def _xla_decode_attention(q, k_cache, v_cache, lengths, *, kv_scale,
                          scale, window_left, out_dtype, kv_layout,
                          softmax_sink=None):
    """Decode attention as two XLA batched matmuls with DIRECT fp8 cache
    operands. Measured faster than the Pallas kernel on v5e (105 vs 155
    us/layer at B=8, S=640): the op is 64 tiny matmuls and XLA's batched
    lowering sequences them better than a Mosaic grid; fp8 operand loads
    fuse like the weight GEMMs."""
    b = q.shape[0]
    hq, d = q.shape[2], q.shape[3]
    if kv_layout == "BHSD":
        hkv, s_len = k_cache.shape[1], k_cache.shape[2]
    else:
        # BSHD caches are consumed IN PLACE ("bshd" einsums) — the
        # (Hkv, D) minor dims are native (8, 128) tiles, matching the
        # scatter append's layout, so no per-step transpose/relayout.
        hkv, s_len = k_cache.shape[2], k_cache.shape[1]
    g = hq // hkv
    kv_spec = "bhsd" if kv_layout == "BHSD" else "bshd"
    # Match the cache's precision regime: f32 caches (tests/reference
    # paths) stay f32; fp8/bf16 caches take bf16 operands for MXU speed.
    op_dtype = jnp.float32 if k_cache.dtype == jnp.float32 else jnp.bfloat16
    qg = q[:, 0].reshape(b, hkv, g, d).astype(op_dtype)
    s = jnp.einsum(f"bhgd,{kv_spec}->bhgs", qg, k_cache,
                   preferred_element_type=jnp.float32) * scale
    s = s * kv_scale.reshape(-1, 1, 1, 1)
    kpos = jnp.arange(s_len)[None, None, None, :]
    mask = kpos < lengths[:, None, None, None]
    if window_left >= 0:
        mask = jnp.logical_and(
            mask, kpos >= (lengths[:, None, None, None] - 1 - window_left))
    s = jnp.where(mask, s, NEG_INF)
    if softmax_sink is not None:
        s0 = softmax_sink.astype(jnp.float32).reshape(1, hkv, g, 1)
        aug = jnp.concatenate(
            [s, jnp.broadcast_to(s0, (b, hkv, g, 1))], axis=-1)
        p = jax.nn.softmax(aug, axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(f"bhgs,{kv_spec}->bhgd", p.astype(op_dtype), v_cache,
                   preferred_element_type=jnp.float32)
    o = o * kv_scale.reshape(-1, 1, 1, 1)
    return o.reshape(b, 1, hq, d).astype(out_dtype)


def decode_attention(
    q: jax.Array,          # (B, 1, Hq, D) or (B, Hq, D)
    k_cache: jax.Array,    # (B, S_max, Hkv, D)  (fp8 or bf16 payload)
    v_cache: jax.Array,
    lengths: jax.Array,    # (B,) int32 — valid cache entries per sequence
    *,
    kv_scale: Optional[jax.Array] = None,   # scalar dequant scale (fp8 cache)
    scaling_factor: Optional[float] = None,
    window_left: int = -1,
    block_s: int = DEFAULT_BLOCK_S,
    out_dtype=None,
    kv_layout: str = "BSHD",   # "BHSD" = cache already (B, Hkv, S, D)
    backend: str = "auto",     # "auto" | "xla" | "pallas"
    softmax_sink: Optional[jax.Array] = None,   # (Hq,) sink logits
) -> jax.Array:
    """Returns (B, 1, Hq, D) attention output of the newest token."""
    squeeze = False
    if q.ndim == 3:
        q = q[:, None]
        squeeze = True
    b, one, hq, d = q.shape
    if kv_layout == "BHSD":
        s_max, hkv = k_cache.shape[2], k_cache.shape[1]
    else:
        s_max, hkv = k_cache.shape[1], k_cache.shape[2]
    g = hq // hkv
    scale = scaling_factor if scaling_factor is not None else 1.0 / d ** 0.5
    out_dtype = out_dtype or (
        q.dtype if q.dtype in (jnp.bfloat16, jnp.float32) else jnp.bfloat16)
    if kv_scale is None:
        kv_scale = jnp.ones((1,), jnp.float32)
    # (1,) whole-batch or (B,) per-slot dequant scales.
    kv_scale = jnp.asarray(kv_scale, jnp.float32).reshape(-1)

    import os
    if backend == "auto":
        backend = os.environ.get("TE_TPU_DECODE_BACKEND", "xla")
    if backend == "xla":
        out = _xla_decode_attention(
            q, k_cache, v_cache, lengths, kv_scale=kv_scale,
            scale=float(scale), window_left=window_left, out_dtype=out_dtype,
            kv_layout=kv_layout, softmax_sink=softmax_sink)
        return out if not squeeze else out

    # Prefer the LARGEST block (up to 1024) dividing s_max exactly —
    # padding would copy the whole cache every step, and small blocks are
    # DMA-latency-bound. Allocate caches at multiples of 128.
    chosen = None
    for cand in (1024, 896, 768, 640, 512, 384, 256, 128, 64, 32, 16, 8):
        if cand <= s_max and s_max % cand == 0:
            chosen = cand
            break
    if chosen is not None:
        block_s = chosen
    else:
        block_s = min(block_s, -(-s_max // 8) * 8)
    s_pad = -(-s_max // block_s) * block_s
    if s_pad != s_max:
        axis = 2 if kv_layout == "BHSD" else 1
        pads = [(0, 0)] * 4
        pads[axis] = (0, s_pad - s_max)
        k_cache = jnp.pad(k_cache, pads)
        v_cache = jnp.pad(v_cache, pads)
        s_max = s_pad
    ns = pl.cdiv(s_max, block_s)
    # (B, Hkv, G, D): GQA group in sublanes.
    qg = q[:, 0].reshape(b, hkv, g, d)
    if kv_layout == "BHSD":
        kt, vt = k_cache, v_cache
    else:
        kt = k_cache.transpose(0, 2, 1, 3)
        vt = v_cache.transpose(0, 2, 1, 3)

    use_sink = softmax_sink is not None
    if use_sink:
        sink = jnp.broadcast_to(
            softmax_sink.astype(jnp.float32).reshape(hkv, g, 1),
            (hkv, g, 128))
    else:
        sink = jnp.zeros((1, 1, 128), jnp.float32)
    kernel = functools.partial(
        _decode_kernel, scale=float(scale), block_s=block_s, num_s_blocks=ns,
        window_left=window_left, use_sink=use_sink)
    out = pl.pallas_call(
        kernel,
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # lengths (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # kv scale (1,)
            pl.BlockSpec((1, hkv, g, d), lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_s, d),
                         lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_s, d),
                         lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sink.shape, lambda bi, si: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda bi, si: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((hkv, g, d), jnp.float32),
            pltpu.VMEM((hkv, g, 128), jnp.float32),
            pltpu.VMEM((hkv, g, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s_max * d,
            bytes_accessed=2 * b * hkv * s_max * d * k_cache.dtype.itemsize,
            transcendentals=b * hq * s_max),
        interpret=_interpret(),
    )(lengths.astype(jnp.int32),
      jnp.broadcast_to(kv_scale, (b,)), qg, kt, vt, sink)
    out = out.reshape(b, 1, hq, d)
    return out if not squeeze else out
