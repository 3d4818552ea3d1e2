"""Quantized grouped dense (expert) layer with custom VJP.

TPU counterpart of the reference GroupedLinear (reference:
pytorch/module/grouped_linear.py; jax/dense.py:318 grouped_dense). Rows
of ``x`` are expert-contiguous (output of token_dispatch); weights are
stacked (E, K, M); the three GEMMs (fwd/dgrad/wgrad) are XLA ragged
dots. Tensor-scaling recipes fold the per-tensor scales into the GEMM
output; block-scaled recipes (MXFP8/blockwise) quantize both operands
with scales along the contraction axis (kernel stored TN as (E, M, K))
and dequantize exactly into the ragged dot (reference:
jax/quantize/quantizer.py:881 GroupedQuantizer,
common/gemm/cublaslt_grouped_gemm.cu).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.grouped_gemm import (grouped_gemm, grouped_gemm_dgrad,
                               grouped_gemm_dw, grouped_gemm_tn)
from .quantize.quantizer import QuantizerSet, noop_quantizer_set
from .quantize.tensor import get_rowwise
from .utils.pytree import Static


def _amax_of(t):
    rw = get_rowwise(t)
    a = getattr(rw, "amax", None)
    return a if a is not None else jnp.float32(0.0)


def _q1x(quantizer, x):
    """Quantize rowwise-only: scales run along the stored last axis,
    which callers arrange to be the contraction axis (TN invariant)."""
    if quantizer is None:
        return x, jnp.float32(0.0)
    import dataclasses
    from .quantize.quantizer import QuantizeLayout
    q = dataclasses.replace(quantizer, q_layout=QuantizeLayout.ROWWISE)
    t = q.quantize(x)
    return t, _amax_of(t)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grouped_dense(num_experts, x, kernel, group_sizes, quantizer_set,
                   kernel_cache):
    out, _ = _gd_fwd(num_experts, x, kernel, group_sizes, quantizer_set,
                     kernel_cache)
    return out


def _gd_fwd(num_experts, x, kernel, group_sizes, quantizer_set,
            kernel_cache):
    if quantizer_set.x is None:
        out = grouped_gemm(x, kernel, group_sizes)
        res = (x, kernel, group_sizes, None, None)
    elif quantizer_set.x.scaling_mode.is_tensor_scaling:
        qx, ax = _q1x(quantizer_set.x, x)
        if kernel_cache is not None:
            qk, ak = kernel_cache.q, None
        else:
            qk, ak = _q1x(quantizer_set.kernel, kernel)
        out = grouped_gemm(qx, qk, group_sizes)
        res = (qx, qk, group_sizes, ax, ak)
    else:
        # Block-scaled (MXFP8 / blockwise): quantize both operands with
        # scales along the contraction axis (K), which requires the
        # kernel stored transposed (E, M, K) — the grouped analog of the
        # TN dense path (reference: jax/quantize/quantizer.py:881
        # GroupedQuantizer + cublaslt_grouped_gemm.cu MXFP8 path).
        qx, ax = _q1x(quantizer_set.x, x)
        from .quantize.microbatch import GroupedQDQKernel
        if kernel_cache is not None:
            qk, ak = kernel_cache.q, None
        else:
            # Build the QDQ workspace INLINE for the plain (non-
            # microbatch) step too: the default per-step path otherwise
            # pays two in-GEMM dequant materializations of the full
            # expert weights on top of the quantize (r4: plain MXFP8
            # step 0.643x bf16 vs 0.985x with the microbatch
            # workspace). Values are identical (dequant-in-GEMM rounds
            # to bf16 either way). MXFP8 goes through the single-pass
            # Pallas QDQ+transpose kernel — the XLA chain materializes
            # every stage separately (r5 profile: swap copies 13 ms +
            # quantize 7.8 + dequant mul 6.3 + convert 3.5 + broadcast
            # 1.9 per step on the Mixtral-geometry rung).
            qk = ak = None
            from .quantize.scaling_modes import ScalingMode
            if (quantizer_set.kernel is not None
                    and quantizer_set.kernel.scaling_mode
                    is ScalingMode.MXFP8_1D_SCALING):
                from .ops.quantize_kernels import (_fused_enabled,
                                                   mxfp8_qdq_2x_grouped)
                if _fused_enabled():
                    out = mxfp8_qdq_2x_grouped(
                        kernel, quantizer_set.kernel.q_dtype)
                    if out is not None:
                        qk = GroupedQDQKernel(nn=out[0], tn=out[1])
                        ak = jnp.float32(0.0)
            if qk is None:
                qt, ak = _q1x(quantizer_set.kernel,
                              jnp.swapaxes(kernel, 1, 2))
                tn = qt.dequantize().astype(jnp.bfloat16)
                qk = GroupedQDQKernel(nn=jnp.swapaxes(tn, 1, 2), tn=tn)
        if isinstance(qk, GroupedQDQKernel):
            # Workspace holds the dequantized bf16 fwd form directly —
            # no per-microbatch dequant or (E,M,K)->(E,K,M) transpose.
            out = grouped_gemm(qx, qk.nn, group_sizes)
        else:
            out = grouped_gemm_tn(qx, qk, group_sizes)
        res = (qx, qk, group_sizes, ax, ak)
    meta = Static((x.shape, kernel.shape, x.dtype, kernel.dtype))
    return out.astype(x.dtype), (res, meta, quantizer_set, kernel_cache)


def _gd_bwd(num_experts, residuals, g):
    res, meta, quantizer_set, kernel_cache = residuals
    x_shape, k_shape, x_dtype, k_dtype = meta.value
    xq, kq, group_sizes, ax, ak = res

    if quantizer_set.x is None:
        gq, ag = g, jnp.float32(0.0)
        d_qset = quantizer_set
    else:
        if kernel_cache is not None:
            # Cache-time weight amax; same once-per-step roll in every
            # microbatch cotangent (see dense._update_set).
            ak = kernel_cache.amax
        gq, ag = _q1x(quantizer_set.dgrad, g)
        d_qset = QuantizerSet(
            x=quantizer_set.x.update(ax),
            kernel=(quantizer_set.kernel if ak is None
                    else quantizer_set.kernel.update(ak)),
            dgrad=quantizer_set.dgrad.update(ag))

    if (quantizer_set.x is not None
            and not quantizer_set.x.scaling_mode.is_tensor_scaling):
        # TN storage: kq is already (E, M, K); contract M directly.
        from .quantize.microbatch import GroupedQDQKernel
        if isinstance(kq, GroupedQDQKernel):
            kq = kq.tn
        dx = grouped_gemm_dgrad(gq, kq, group_sizes).astype(x_dtype)
    else:
        # dX[n] = G[n] @ W[e]^T  — ragged dot against transposed kernels.
        kt = (kq.data if hasattr(kq, "data") else kq)
        if hasattr(kq, "data"):
            import dataclasses
            kt = dataclasses.replace(kq, data=jnp.swapaxes(kq.data, 1, 2))
        else:
            kt = jnp.swapaxes(kq, 1, 2)
        dx = grouped_gemm(gq, kt, group_sizes).astype(x_dtype)
    dw = grouped_gemm_dw(xq, gq, group_sizes, num_experts).astype(k_dtype)
    from .quantize.microbatch import zero_cotangent
    return (dx.reshape(x_shape), dw.reshape(k_shape), None, d_qset,
            zero_cotangent(kernel_cache))


_grouped_dense.defvjp(_gd_fwd, _gd_bwd)


def grouped_dense(
    x: jax.Array,              # (N, K) expert-contiguous
    kernel: jax.Array,         # (E, K, M)
    group_sizes: jax.Array,    # (E,)
    *,
    quantizer_set: QuantizerSet = noop_quantizer_set,
    kernel_cache=None,
) -> jax.Array:
    """``kernel_cache``: once-per-step quantized expert kernels from
    :func:`~transformerengine_tpu.quantize.microbatch.
    quantize_grouped_kernel` — skips the per-microbatch kernel quantize
    (and the TN swap for block scaling); bwd observes the cache-time
    weight amax. Rebuild after every optimizer step."""
    assert kernel.ndim == 3 and x.shape[-1] == kernel.shape[1], (
        f"shapes {x.shape} x {kernel.shape}")
    return _grouped_dense(kernel.shape[0], x, kernel, group_sizes,
                          quantizer_set, kernel_cache)


# ---------------------------------------------------------------------------
# Per-expert (grouped) quantization variant
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grouped_dense_gq(gq, x, kernel, group_sizes):
    out, _ = _gd_gq_fwd(gq, x, kernel, group_sizes)
    return out


def _gd_gq_fwd(gq, x, kernel, group_sizes):
    from .quantize.grouped import grouped_gemm_scaled
    qx = gq.quantize_rows(x, group_sizes)
    qk = gq.quantize_kernels(kernel)
    out = grouped_gemm_scaled(qx, qk, group_sizes).astype(x.dtype)
    meta = Static((x.shape, kernel.shape, x.dtype, kernel.dtype))
    return out, (qx, qk, group_sizes, meta)


def _gd_gq_bwd(gq, residuals, g):
    from .ops.grouped_gemm import grouped_gemm_dw
    qx, qk, group_sizes, meta = residuals
    x_shape, k_shape, x_dtype, k_dtype = meta.value
    e = k_shape[0]
    qg = gq.quantize_rows(g, group_sizes)
    # dX[n] = G[n] @ W[e]^T, scales per row
    dx = jax.lax.ragged_dot(
        qg.data.astype(jnp.bfloat16),
        jnp.swapaxes(qk.data, 1, 2).astype(jnp.bfloat16),
        group_sizes.astype(jnp.int32), preferred_element_type=jnp.float32)
    n = x_shape[0]
    row_s = qg.row_scale_inv() * jnp.repeat(
        qk.scale_inv, group_sizes, total_repeat_length=n)
    dx = (dx * row_s[:, None]).astype(x_dtype)
    # dW[e] = X_e^T G_e, scale product per expert
    dw = grouped_gemm_dw(qx.data.astype(jnp.bfloat16),
                         qg.data.astype(jnp.bfloat16), group_sizes, e)
    dw = (dw * (qx.scale_inv * qg.scale_inv)[:, None, None]).astype(k_dtype)
    return dx.reshape(x_shape), dw.reshape(k_shape), None


_grouped_dense_gq.defvjp(_gd_gq_fwd, _gd_gq_bwd)


def grouped_dense_gq(x, kernel, group_sizes, grouped_quantizer):
    """Grouped dense with per-expert scales (reference: GroupedQuantizer
    + GroupedLinear). ``grouped_quantizer.num_groups`` must equal E."""
    assert grouped_quantizer.num_groups == kernel.shape[0], (
        grouped_quantizer.num_groups, kernel.shape)
    return _grouped_dense_gq(grouped_quantizer, x, kernel, group_sizes)
