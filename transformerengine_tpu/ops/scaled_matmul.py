"""Pallas block-scaled matmul: FP8/FP4 payloads dequantized in VMEM.

The TPU replacement for cuBLASLt block-scaled GEMM (reference:
common/gemm/cublaslt_gemm.cu with MXFP8/NVFP4 scale modes + swizzled
scale layouts). The bench TPU's MXU has no FP8 MAC, so the kernel
upcasts payload tiles to bf16 *in VMEM* with their per-block scales
applied (exact for power-of-two and e4m3 scales) and feeds the MXU —
the full-size dequantized operand never exists in HBM, unlike the
XLA fallback path in ops/gemm.py which materializes it.

Contraction is TN (both operands contract along their stored last
axis), the framework-wide invariant — so block scales always run along
the contraction axis and decompose over K tiles.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(post_ref, expand_ref, lhs_ref, lhs_s_ref, rhs_ref, rhs_s_ref,
            out_ref, acc_ref, *, bs: int, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = lhs_ref[...].astype(jnp.float32)
    b = rhs_ref[...].astype(jnp.float32)
    # Scale refs arrive TRANSPOSED as (TK//bs, TM)/(TK//bs, TN) blocks —
    # the natural (TM, TK//bs) block has a sub-128 lane dim Mosaic
    # rejects (and in-kernel ref lane-slicing is equally unsupported);
    # BlockSpec DMA slices the K tile along sublanes instead.
    # Dequant = one small MXU matmul against a constant 0/1 expansion
    # (TK//bs, TK) to stretch each scale across its 32 lanes, then one
    # elementwise multiply. (The static-slice/concat formulation was
    # measured 6x slower than even the XLA fallback — Mosaic lowers the
    # 16-way concat as serial relayouts.)
    expand = expand_ref[...]                     # (TK//bs, TK) f32
    sexp_a = jax.lax.dot_general(
        lhs_s_ref[...].T, expand, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (TM, TK)
    sexp_b = jax.lax.dot_general(
        rhs_s_ref[...].T, expand, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (TN, TK)
    acc_ref[...] += jax.lax.dot_general(
        (a * sexp_a).astype(jnp.bfloat16), (b * sexp_b).astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        out_ref[...] = acc_ref[...] * post_ref[0]


def scaled_tn_matmul(
    lhs: jax.Array,          # (M, K) quantized payload
    lhs_scales: jax.Array,   # (M, K // bs) f32 dequant multipliers
    rhs: jax.Array,          # (N, K) quantized payload
    rhs_scales: jax.Array,   # (N, K // bs) f32
    *,
    block_size: int,
    post_scale: Optional[jax.Array] = None,   # scalar epilogue (NVFP4 2nd level)
    tile: Tuple[int, int, int] = (256, 256, 512),
) -> jax.Array:
    """out[m, n] = sum_k (lhs[m,k] * ls[m,k//bs]) * (rhs[n,k] * rs[n,k//bs])"""
    m, k = lhs.shape
    n = rhs.shape[0]
    bs = block_size
    tm = min(tile[0], m)
    tn = min(tile[1], n)
    tk = min(tile[2], k)
    assert m % tm == 0 and n % tn == 0 and k % tk == 0 and tk % bs == 0, (
        (m, n, k), (tm, tn, tk), bs)
    grid = (m // tm, n // tn, k // tk)
    post = (post_scale if post_scale is not None
            else jnp.ones((1,), jnp.float32)).reshape(1).astype(jnp.float32)
    # Transposed (K//bs, M)/(K//bs, N) f32 scale layout for sublane-side
    # K-tile blocking (see _kernel); the transpose is 1/bs of payload
    # traffic.
    lhs_s_t = lhs_scales.astype(jnp.float32).T
    rhs_s_t = rhs_scales.astype(jnp.float32).T
    # 0/1 block-expansion matrix: expand[ib, ib*bs + t] = 1.
    expand = jnp.repeat(jnp.eye(tk // bs, dtype=jnp.float32), bs, axis=1)

    return pl.pallas_call(
        functools.partial(_kernel, bs=bs, nk=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tk // bs, tk), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // bs, tm), lambda i, j, kk: (kk, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk), lambda i, j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // bs, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + n * k + 4 * m * n,
            transcendentals=0),
        interpret=_interpret(),
    )(post, expand, lhs, lhs_s_t, rhs, rhs_s_t)
