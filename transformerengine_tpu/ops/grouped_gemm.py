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
    return t.dequantize().astype(jnp.bfloat16), jnp.float32(1.0)


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
