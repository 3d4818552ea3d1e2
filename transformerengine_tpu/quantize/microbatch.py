"""Microbatch weight-quantization caching (gradient accumulation).

TPU counterpart of the reference's FP8 weight-workspace cache keyed on
``is_first_microbatch`` (reference: pytorch/module/base.py:744
``quantize_weight`` — weights are quantized once per optimizer step and
the quantized usages are reused across the grad-accumulation
microbatches; pytorch/module/linear.py threads the cached workspace into
fwd/dgrad).

The functional form: :func:`quantize_kernel` quantizes a kernel ONCE
(also returning the kernel quantizer with its amax observation applied,
matching the reference's "weight amax is observed on the first
microbatch only"), and the resulting :class:`KernelCache` is passed to
``dense(..., kernel_cache=...)`` on every microbatch. The layer then
skips the per-call kernel quantize entirely — under grad accumulation of
N microbatches that removes N-1 redundant kernel cast(+transpose)
passes, which XLA cannot CSE across jit invocations.

Gradients still flow to the raw (master) kernel argument; the cache is a
constant input whose cotangent is structurally zero (float0 for the
integer scale grids).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from .quantizer import QuantizeLayout, QuantizerSet
from .tensor import ScaledTensor1x, ScaledTensor2x

__all__ = ["KernelCache", "quantize_kernel", "quantize_grouped_kernel",
           "zero_cotangent"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KernelCache:
    """Quantized usages of one kernel, reused across microbatches.

    ``q`` is a ScaledTensor2x (block-scaled recipes: rowwise for dgrad,
    colwise for the fwd GEMM) or a rowwise ScaledTensor1x (per-tensor
    scaling: one payload serves fwd/dgrad/wgrad via q_dot).

    ``amax``: the weight amax observed at cache-build time. Layer bwds
    feed it to the kernel quantizer's end-of-step update, so every
    microbatch's quantizer-set cotangent carries the SAME once-per-step
    weight observation (idempotent under the overwrite-with-gradient
    convention — whichever microbatch's cotangent the caller keeps, the
    kernel state rolled exactly once with this amax).
    """

    q: Union[ScaledTensor1x, ScaledTensor2x]
    amax: Optional[jax.Array] = None


def _all_tensor_scaling(qset: QuantizerSet) -> bool:
    from ..dense import all_tensor_scaling
    return all_tensor_scaling(qset)


def quantize_kernel(
    kernel: jax.Array,
    quantizer_set: QuantizerSet,
    n_cdims: int = 1,
) -> tuple[Optional[KernelCache], QuantizerSet]:
    """Quantize ``kernel`` (contracting dims leading) once per step.

    Returns ``(cache, quantizer_set)``: the cache to pass to every
    microbatch's ``dense(..., kernel_cache=cache)``; the set is
    returned unchanged. The weight amax rides the cache — each
    microbatch's bwd applies ``kernel.update(cache.amax)`` so the
    quantizer-set cotangent (overwrite-with-gradient) carries the
    once-per-step weight observation no matter which microbatch's
    cotangent the caller keeps. For unquantized runs returns
    ``(None, set)``.
    """
    if quantizer_set.x is None or quantizer_set.kernel is None:
        return None, quantizer_set
    k = 1
    for d in kernel.shape[:n_cdims]:
        k *= d
    n = kernel.size // k
    k2d = kernel.reshape(k, n)
    if _all_tensor_scaling(quantizer_set):
        q = quantizer_set.kernel.quantize(k2d, layout=QuantizeLayout.ROWWISE)
        amax = getattr(q, "amax", None)
        return KernelCache(q=q, amax=amax), quantizer_set
    q = quantizer_set.kernel.quantize(k2d)
    amax = getattr(q.rowwise if isinstance(q, ScaledTensor2x) else q,
                   "amax", None)
    if isinstance(q, ScaledTensor2x):
        # Block scaling: cache the dequantized bf16 usages (QDQKernel).
        qdq = QDQKernel(
            row=q.rowwise.dequantize().astype(jnp.bfloat16),
            col=q.colwise.dequantize().astype(jnp.bfloat16))
        return KernelCache(q=qdq, amax=amax), quantizer_set
    return KernelCache(q=q, amax=amax), quantizer_set


def zero_cotangent(tree):
    """Structurally-zero cotangent for a pytree that may hold integer
    leaves (uint8 E8M0 scale grids need float0 tangents under JAX's
    custom_vjp contract; fp8 payloads are inexact and take fp8 zeros)."""
    def z(x):
        if hasattr(x, "dtype") and not jnp.issubdtype(x.dtype, jnp.inexact):
            return np.zeros(np.shape(x), dtype=jax.dtypes.float0)
        return jnp.zeros_like(x)
    return jax.tree_util.tree_map(z, tree)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QDQKernel:
    """Block-scaled DENSE weight workspace: both dequantized bf16
    orientations of the once-per-step quantized kernel. Same rationale
    as GroupedQDQKernel below: on TPUs without a low-precision MXU the
    block-scaled GEMM dequantizes to bf16 anyway, and caching the
    dequantized values removes the per-microbatch dequant
    materialization (r3 measured the 8192x4096x28672 MXFP8 fwd GEMM at
    12.6 ms materialized-dequant vs 10.6 for the same bf16 operand).
    Values are IDENTICAL to dequant-in-GEMM (the in-GEMM operand is
    rounded to bf16 either way). get_rowwise/get_colwise in
    quantize/tensor.py return the matching orientation."""

    row: jax.Array   # (K, N) QDQ'd bf16 — dgrad usage
    col: jax.Array   # (N, K) QDQ'd bf16 — fwd-GEMM (TN) usage


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedQDQKernel:
    """Block-scaled expert-weight workspace: BOTH dequantized bf16
    orientations of the once-per-step quantized kernels.

    On TPUs without a low-precision MXU the block-scaled grouped GEMM
    dequantizes to bf16 anyway; caching the dequantized values directly
    removes the per-microbatch dequant pass AND the (E, M, K)->(E, K, M)
    transpose copy of the full expert weights from the fwd hot path
    (~1.4 GB of relayout per microbatch on the Mixtral-geometry rung),
    at the cost of holding two bf16 weight copies — the same trade the
    reference's FP8 weight workspace makes (pytorch/module/base.py:744).
    Numerics are IDENTICAL to dequant-in-GEMM (pow2 dequant is exact)."""

    nn: jax.Array    # (E, K, M) QDQ'd bf16 — fwd ragged_dot form
    tn: jax.Array    # (E, M, K) QDQ'd bf16 — dgrad (contract M) form


def quantize_grouped_kernel(
    kernel: jax.Array,               # (E, K, M) stacked expert kernels
    quantizer_set: QuantizerSet,
) -> tuple[Optional[KernelCache], QuantizerSet]:
    """Grouped analog of :func:`quantize_kernel` for
    ``grouped_dense(..., kernel_cache=...)`` (reference:
    pytorch/module/base.py quantize_weight covers GroupedLinear too).
    Per-tensor recipes cache the (E, K, M) payload; block-scaled recipes
    cache a :class:`GroupedQDQKernel` (see its docstring)."""
    if quantizer_set.x is None or quantizer_set.kernel is None:
        return None, quantizer_set
    from ..grouped_dense import _q1x
    if quantizer_set.x.scaling_mode.is_tensor_scaling:
        q, _ = _q1x(quantizer_set.kernel, kernel)
        amax = getattr(q, "amax", None)
        return KernelCache(q=q, amax=amax), quantizer_set
    q, _ = _q1x(quantizer_set.kernel, jnp.swapaxes(kernel, 1, 2))
    amax = getattr(q, "amax", None)
    tn = q.dequantize().astype(jnp.bfloat16)
    qdq = GroupedQDQKernel(nn=jnp.swapaxes(tn, 1, 2), tn=tn)
    return KernelCache(q=qdq, amax=amax), quantizer_set
