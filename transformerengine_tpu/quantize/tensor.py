"""Quantized-tensor pytrees.

The TPU analog of the reference's ``NVTETensor`` data contract
(reference: common/include/transformer_engine/transformer_engine.h:66-94
and jax/quantize/tensor.py:185,576): a quantized payload plus scale
metadata plus (optionally) the recorded amax, carried as a registered
pytree so it flows transparently through jit / vmap / shard_map / scan.

Unlike the CUDA implementation there is no notion of "swizzled" scale
layout — we own the matmul kernels, so scales are stored in the natural
block-grid layout produced by quantization.
"""
from __future__ import annotations

import dataclasses
from functools import reduce
import operator
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .dtypes import dtype_max, is_fp4_dtype
from .scaling_modes import ScalingMode


def _prod(xs) -> int:
    return reduce(operator.mul, xs, 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaledTensor1x:
    """A single-usage quantized tensor.

    ``data`` is stored exactly as a consumer kernel will read it: for
    ``layout == "N"`` (rowwise) it has the logical shape; for
    ``layout == "T"`` (colwise) it is stored transposed, with the
    quantization axis again innermost. Block scales always apply along
    the last axis of the *stored* array (after flattening leading dims).

    ``scale_inv`` holds the dequantization multipliers:
      * tensor scaling  -> shape (1,), fp32
      * MXFP8           -> E8M0 per 32-block
      * block 1D/2D     -> fp32 per 128 / 128x128 block
      * NVFP4           -> E4M3 per 16-block, with the second-level
                           per-tensor scale in ``tensor_scale_inv``.
    """

    data: jax.Array
    scale_inv: jax.Array
    amax: Optional[jax.Array]
    # Second-level fp32 per-tensor scale (NVFP4 two-level scaling).
    tensor_scale_inv: Optional[jax.Array]
    # -- static metadata --
    scaling_mode: ScalingMode = dataclasses.field(metadata=dict(static=True))
    dq_dtype: jnp.dtype = dataclasses.field(metadata=dict(static=True))
    layout: str = dataclasses.field(default="N", metadata=dict(static=True))
    # Boundary between "row" dims and "col" dims of the stored data when
    # treated as a 2D matrix for block-scale purposes.
    flatten_axis: int = dataclasses.field(default=-1, metadata=dict(static=True))
    # True for tensors that LIVE in HBM across steps (prequantized weights,
    # KV caches): matmuls feed the fp8 payload directly so XLA streams
    # 1 byte/param. False (default) for in-graph quantized tensors, where
    # an explicit bf16 cast fuses into the producing quantize instead.
    resident: bool = dataclasses.field(default=False, metadata=dict(static=True))

    def __post_init__(self):
        assert self.layout in ("N", "T"), self.layout

    # -- helpers ----------------------------------------------------------
    @property
    def ndim(self):
        return self.data.ndim

    @property
    def shape(self):
        return self.data.shape

    def _2d_shape(self) -> Tuple[int, int]:
        fa = self.flatten_axis % max(self.data.ndim, 1)
        return (_prod(self.data.shape[:fa]), _prod(self.data.shape[fa:]))

    def dequantize(self) -> jax.Array:
        """Reconstruct the high-precision tensor (in stored orientation)."""
        rows, cols = self._2d_shape()
        if self.scaling_mode.is_tensor_scaling:
            out = (self.data.reshape(rows, cols).astype(jnp.float32)
                   * self.scale_inv.astype(jnp.float32).reshape(()))
            return out.reshape(self.data.shape).astype(self.dq_dtype)
        br, bc = self.scaling_mode.block_shape
        s = self.scaling_mode.decode_scale_inv(self.scale_inv)
        # Trim scale padding (scale grids may be padded for TPU tiling).
        gr, gc = -(-rows // br), -(-cols // bc)
        s = s[:gr, :gc]
        if br > 1:
            s = jnp.repeat(s, br, axis=0)[:rows]
        # MXFP8/NVFP4 into bf16: payload (<=4-bit significand) times
        # scale (pow2 / <=4-bit significand) is EXACT in bf16 — and the
        # blocked broadcast form fuses where a jnp.repeat along the
        # scaled axis materializes a full-size relayouted operand
        # (profiled ~5.7 ms per dequantized expert stack on the MoE
        # rung).
        exact_bf16 = (self.scaling_mode.name.startswith(("MXFP8", "NVFP4"))
                      and self.dq_dtype == jnp.bfloat16
                      and self.tensor_scale_inv is None)
        mul_t = jnp.bfloat16 if exact_bf16 else jnp.float32
        if gc * bc == cols:
            x3 = self.data.reshape(rows, gc, bc).astype(mul_t)
            out = x3 * s.astype(mul_t)[:, :, None]
            out = out.reshape(rows, cols)
        else:
            sf = jnp.repeat(s, bc, axis=1)[:, :cols]
            out = (self.data.reshape(rows, cols).astype(mul_t)
                   * sf.astype(mul_t))
        if self.tensor_scale_inv is not None:
            out = (out.astype(jnp.float32)
                   * self.tensor_scale_inv.astype(jnp.float32).reshape(()))
        return out.reshape(self.data.shape).astype(self.dq_dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaledTensor2x:
    """Rowwise + colwise usages of the same logical tensor.

    The forward GEMM consumes the rowwise usage; the wgrad/dgrad GEMMs
    consume the colwise usage. For block-scaled recipes these are
    *numerically different* quantizations (blocks run along different
    axes), which is why both payloads exist
    (reference: jax/quantize/tensor.py:576).
    """

    rowwise: ScaledTensor1x
    colwise: ScaledTensor1x

    @property
    def scaling_mode(self):
        return self.rowwise.scaling_mode

    def dequantize(self) -> jax.Array:
        return self.rowwise.dequantize()


ScaledTensor = (ScaledTensor1x, ScaledTensor2x)


def is_scaled(x) -> bool:
    return isinstance(x, ScaledTensor)


def _qdq_kernel_cls():
    from .microbatch import QDQKernel
    return QDQKernel


def get_rowwise(x):
    if isinstance(x, ScaledTensor2x):
        return x.rowwise
    if isinstance(x, _qdq_kernel_cls()):
        # Block-scaled weight workspace (microbatch.QDQKernel): the
        # rowwise usage is the pre-dequantized bf16 (K, N) array.
        return x.row
    return x


def get_colwise(x):
    if isinstance(x, ScaledTensor2x):
        return x.colwise
    if isinstance(x, _qdq_kernel_cls()):
        return x.col
    return x


def make_scaled_tensor(
    data,
    scale_inv,
    *,
    scaling_mode: ScalingMode,
    dq_dtype,
    amax=None,
    tensor_scale_inv=None,
    layout: str = "N",
    flatten_axis: int = -1,
    resident: bool = False,
) -> ScaledTensor1x:
    return ScaledTensor1x(
        data=data,
        scale_inv=scale_inv,
        amax=amax,
        tensor_scale_inv=tensor_scale_inv,
        scaling_mode=scaling_mode,
        dq_dtype=jnp.dtype(dq_dtype),
        layout=layout,
        flatten_axis=flatten_axis,
        resident=resident,
    )
