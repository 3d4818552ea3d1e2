"""Grouped (ragged) matmul for MoE expert computation.

TPU counterpart of the reference grouped GEMM (reference:
common/gemm/cublaslt_grouped_gemm.cu + cutlass_grouped_gemm.cu;
jax/cpp_extensions/gemm.py GroupedGemmPrimitive :1463). On TPU,
``lax.ragged_dot`` lowers to the native XLA ragged-dot (megablox-style
MXU tiling, skewed group sizes handled by the compiler); quantized
operands take the same exact dequant-to-bf16 path as ops/gemm.tn_dot.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..quantize.tensor import ScaledTensor1x, is_scaled


def _dq(t):
    """Dequantize a ScaledTensor to bf16 exactly (pow2/per-tensor scales)."""
    if not is_scaled(t):
        return t, jnp.float32(1.0)
    if t.scaling_mode.is_tensor_scaling:
        return (t.data.astype(jnp.bfloat16),
                t.scale_inv.astype(jnp.float32).reshape(()))
    # Barrier: without it XLA fuses the dequant INTO the ragged dot as a
    # "convolution_select_fusion" that re-dequantizes the operand for
    # every output tile — profiled at 22 TF/s vs ~70 for the same dot
    # reading a materialized bf16 operand (MoE MXFP8 rung).
    out = t.dequantize().astype(jnp.bfloat16)
    return jax.lax.optimization_barrier(out), jnp.float32(1.0)


def grouped_gemm(
    x,                       # (N, K) expert-contiguous rows (or ScaledTensor)
    kernels,                 # (E, K, M) stacked expert weights (or Scaled)
    group_sizes: jax.Array,  # (E,)
) -> jax.Array:
    """out[n] = x[n] @ kernels[expert_of(n)] — N rows grouped by expert."""
    xb, sx = _dq(x)
    kb, sk = _dq(kernels)
    out = jax.lax.ragged_dot(
        xb, kb, group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.float32)
    return out * (sx * sk)


def grouped_gemm_tn(
    x,                       # (N, K) expert-contiguous rows (or ScaledTensor)
    kernels_t,               # (E, M, K) TN-stored expert weights (or Scaled)
    group_sizes: jax.Array,  # (E,)
) -> jax.Array:
    """Grouped GEMM with the kernel stored transposed (E, M, K) so that
    block scales run along the stored last axis == the contraction axis
    for BOTH operands (the repo's TN invariant; reference MXFP8 grouped
    GEMM quantizes the kernel along K the same way,
    common/gemm/cublaslt_grouped_gemm.cu).

    The dequantized kernel is transposed back to (E, K, M) and fed to
    the STANDARD ragged_dot form: the (((1,),(2,))) ragged_dot_general
    spelling looks equivalent but XLA has no custom-call lowering for
    it and falls back to a dense all-experts convolution + mask — 8x
    the FLOPs at E=8 (profiled 43 ms vs ~6 for the same GEMM through
    the megablox custom call). The transpose is one bf16 relayout copy,
    ~2 orders of magnitude cheaper."""
    xb, sx = _dq(x)
    kb, sk = _dq(kernels_t)
    out = jax.lax.ragged_dot(
        xb, jnp.swapaxes(kb, 1, 2), group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.float32)
    return out * (sx * sk)


def grouped_gemm_dgrad(
    g,                       # (N, M) expert-contiguous cotangent
    kernels_t,               # (E, M, K) TN-stored expert weights (or Scaled)
    group_sizes: jax.Array,
) -> jax.Array:
    """dX[n] = G[n] @ W[e]^T with the kernel in TN storage: contracts M
    of both operands, no transpose materialized."""
    gb, sg = _dq(g)
    kb, sk = _dq(kernels_t)
    dims = jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((1,), (1,)), ((), ())),
        lhs_ragged_dimensions=[0],
        rhs_group_dimensions=[0],
    )
    out = jax.lax.ragged_dot_general(
        gb, kb, group_sizes.astype(jnp.int32), dims,
        preferred_element_type=jnp.float32)
    return out * (sg * sk)


def grouped_gemm_dw(
    x,                       # (N, K) expert-contiguous
    g,                       # (N, M) expert-contiguous cotangent
    group_sizes: jax.Array,
    num_experts: int,
) -> jax.Array:
    """Per-expert wgrad: dW[e] = X_e^T @ G_e -> (E, K, M) via the ragged
    contraction mode of ragged_dot_general."""
    xb, sx = _dq(x)
    gb, sg = _dq(g)
    dims = jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((0,), (0,)), ((), ())),
        lhs_ragged_dimensions=[0],
        rhs_group_dimensions=[],
    )
    out = jax.lax.ragged_dot_general(
        xb, gb, group_sizes.astype(jnp.int32), dims,
        preferred_element_type=jnp.float32)
    return out * (sx * sg)
