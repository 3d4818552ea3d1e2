"""Scaling modes for quantized tensors.

Mirrors the reference scaling-mode set (reference:
common/include/transformer_engine/transformer_engine.h:99-119 and
jax/quantize/scaling_modes.py) re-expressed for a pure-JAX data model:
every mode knows its block shape and the dtype/shape of its scale
metadata so kernels and pytree code stay mode-agnostic.
"""
from __future__ import annotations

import enum
from typing import Tuple

import jax.numpy as jnp

from .dtypes import decode_e8m0, float8_e4m3


class ScalingMode(enum.Enum):
    """How scale factors relate to the quantized payload."""

    NO_SCALING = 0
    # One fp32 scale for the whole tensor, computed from an amax *history*
    # carried across steps (reference: NVTE_DELAYED_TENSOR_SCALING).
    DELAYED_TENSOR_SCALING = 1
    # One fp32 scale computed from the current tensor's amax.
    CURRENT_TENSOR_SCALING = 2
    # One E8M0 (power-of-two) scale per 32 contiguous elements along the
    # quantization axis (reference: NVTE_MXFP8_1D_SCALING).
    MXFP8_1D_SCALING = 3
    # One fp32 scale per 128 contiguous elements (reference: NVTE_BLOCK_SCALING_1D).
    BLOCK_SCALING_1D = 4
    # One fp32 scale per 128x128 tile (reference: NVTE_BLOCK_SCALING_2D).
    BLOCK_SCALING_2D = 5
    # Two-level: one E4M3 scale per 16 elements plus one fp32 per-tensor
    # scale (reference: NVTE_NVFP4_1D_SCALING).
    NVFP4_1D_SCALING = 6
    # Two-level with (16, 16) blocks — the reference's
    # QParams.fp4_2d_quantization weight mode.
    NVFP4_2D_SCALING = 7

    # ---- static metadata ------------------------------------------------
    @property
    def is_tensor_scaling(self) -> bool:
        return self in (
            ScalingMode.NO_SCALING,
            ScalingMode.DELAYED_TENSOR_SCALING,
            ScalingMode.CURRENT_TENSOR_SCALING,
        )

    @property
    def is_block_scaling(self) -> bool:
        return not self.is_tensor_scaling

    @property
    def is_nvfp4(self) -> bool:
        return self in (ScalingMode.NVFP4_1D_SCALING,
                        ScalingMode.NVFP4_2D_SCALING)

    @property
    def block_shape(self) -> Tuple[int, int]:
        """(rows, cols) covered by one scale when quantizing along the last axis."""
        return {
            ScalingMode.NO_SCALING: (1, 1),
            ScalingMode.DELAYED_TENSOR_SCALING: (1, 1),
            ScalingMode.CURRENT_TENSOR_SCALING: (1, 1),
            ScalingMode.MXFP8_1D_SCALING: (1, 32),
            ScalingMode.BLOCK_SCALING_1D: (1, 128),
            ScalingMode.BLOCK_SCALING_2D: (128, 128),
            ScalingMode.NVFP4_1D_SCALING: (1, 16),
            ScalingMode.NVFP4_2D_SCALING: (16, 16),
        }[self]

    @property
    def scale_dtype(self):
        if self is ScalingMode.MXFP8_1D_SCALING:
            # e8m0 bits stored as biased-exponent uint8 (no TPU e8m0 dtype).
            return jnp.uint8
        if self.is_nvfp4:
            return float8_e4m3
        return jnp.float32

    def decode_scale_inv(self, scale_inv):
        """Stored scale metadata -> fp32 dequant multipliers."""
        if self is ScalingMode.MXFP8_1D_SCALING:
            return decode_e8m0(scale_inv)
        return scale_inv.astype(jnp.float32)

    def scale_shape(self, data_shape: Tuple[int, ...], flatten_axis: int = -1):
        """Shape of the scale array for a tensor of ``data_shape`` quantized
        along its last axis. For 2D block scaling the leading-rows block is
        applied over the flattened leading dims.
        """
        if self.is_tensor_scaling:
            return (1,)
        br, bc = self.block_shape
        if len(data_shape) == 0:
            return (1,)
        rows = 1
        for d in data_shape[:-1]:
            rows *= d
        cols = data_shape[-1]
        return (-(-rows // br), -(-cols // bc))
