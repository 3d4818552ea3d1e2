"""Grouped (per-expert) quantization for MoE.

TPU counterpart of the reference's GroupedQuantizer / GroupedTensor
(reference: jax/quantize/quantizer.py:881 GroupedQuantizer,
pytorch/tensor/grouped_tensor.py:68, common grouped-quantize kernels).
Expert-contiguous rows get one scale per expert group; the grouped GEMM
applies the per-expert scale product on its output rows, which is exact
for per-tensor (per-group) scaling.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import qmath
from .scaling_modes import ScalingMode
from .tensor import ScaledTensor1x


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedScaledTensor:
    """Expert-grouped quantized rows: one scale per group."""

    data: jax.Array          # (N, K) payload, rows grouped by expert
    scale_inv: jax.Array     # (E,) f32 dequant multipliers
    group_sizes: jax.Array   # (E,) rows per group
    amax: Optional[jax.Array]    # (E,) per-group amax
    dq_dtype: jnp.dtype = dataclasses.field(metadata=dict(static=True))

    @property
    def num_groups(self) -> int:
        return self.scale_inv.shape[0]

    def row_scale_inv(self) -> jax.Array:
        """(N,) per-row dequant multiplier."""
        return jnp.repeat(self.scale_inv, self.group_sizes,
                          total_repeat_length=self.data.shape[0])

    def dequantize(self) -> jax.Array:
        return (self.data.astype(jnp.float32)
                * self.row_scale_inv()[:, None]).astype(self.dq_dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedKernelTensor:
    """Stacked expert kernels with one scale per expert."""

    data: jax.Array          # (E, K, M) payload
    scale_inv: jax.Array     # (E,)
    amax: Optional[jax.Array]
    dq_dtype: jnp.dtype = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedQuantizer:
    """Per-group current-scaling quantizer
    (reference: jax/quantize/quantizer.py:881)."""

    q_dtype: jnp.dtype = dataclasses.field(metadata=dict(static=True))
    num_groups: int = dataclasses.field(default=1, metadata=dict(static=True))

    def quantize_rows(self, x: jax.Array, group_sizes: jax.Array
                      ) -> GroupedScaledTensor:
        n = x.shape[0]
        e = self.num_groups
        expert_of_row = jnp.repeat(jnp.arange(e), group_sizes,
                                   total_repeat_length=n)
        row_amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)
        amax = jax.ops.segment_max(row_amax, expert_of_row, num_segments=e)
        amax = jnp.where(jnp.isfinite(amax), amax, 0.0)
        scale = qmath.compute_scale_from_amax(amax, self.q_dtype)   # (E,)
        data = qmath.saturate_cast(
            x.astype(jnp.float32) * scale[expert_of_row][:, None],
            self.q_dtype)
        return GroupedScaledTensor(
            data=data, scale_inv=1.0 / scale, group_sizes=group_sizes,
            amax=amax, dq_dtype=jnp.dtype(x.dtype))

    def quantize_kernels(self, kernels: jax.Array) -> GroupedKernelTensor:
        amax = jnp.max(jnp.abs(kernels.astype(jnp.float32)), axis=(1, 2))
        scale = qmath.compute_scale_from_amax(amax, self.q_dtype)
        data = qmath.saturate_cast(
            kernels.astype(jnp.float32) * scale[:, None, None], self.q_dtype)
        return GroupedKernelTensor(
            data=data, scale_inv=1.0 / scale, amax=amax,
            dq_dtype=jnp.dtype(kernels.dtype))


def grouped_gemm_scaled(
    x: GroupedScaledTensor,
    w: GroupedKernelTensor,
    group_sizes: jax.Array,
) -> jax.Array:
    """ragged_dot on payloads with per-group scale product on output."""
    out = jax.lax.ragged_dot(
        x.data.astype(jnp.bfloat16), w.data.astype(jnp.bfloat16),
        group_sizes.astype(jnp.int32), preferred_element_type=jnp.float32)
    row_scale = (x.row_scale_inv()
                 * jnp.repeat(w.scale_inv, group_sizes,
                              total_repeat_length=x.data.shape[0]))
    return out * row_scale[:, None]
