"""Scaled matmul — the TPU replacement for cuBLASLt FP8 GEMM.

Design (reference counterpart: common/gemm/cublaslt_gemm.cu +
jax/cpp_extensions/gemm.py:487):

* Every quantized GEMM contracts along the **last stored axis of both
  operands** ("TN" in BLAS terms) — the same invariant the reference's
  FP8 GEMMs require. Block scales always run along the stored last axis,
  so the contraction axis is exactly the scaled axis and per-block scale
  application decomposes over the dot product.
* Per-tensor scaling: feed the fp8 payloads straight into
  `lax.dot_general` (XLA uses the native low-precision MXU path on TPU
  generations that have one, and upcasts otherwise) and apply the two
  scalar scales on the f32 accumulator.
* Block scaling (MXFP8 / FP8-block / NVFP4): dequantize-to-bf16 fused
  into the matmul. With power-of-two scales this is *exact* (pow2
  scaling preserves the mantissa), so numerics match a true in-kernel
  scaled matmul. (An in-VMEM-dequant Pallas MXU kernel was built and
  benchmarked in r2-r3: 247 ms vs XLA's 58 ms on its target rung even
  after the expansion-matrix dequant rewrite — DELETED in r4 per the r1
  matvec precedent; XLA's materialized-dequant + near-peak matmul IS
  the block-scaled path on v5e.)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..quantize.scaling_modes import ScalingMode
from ..quantize.tensor import ScaledTensor1x, is_scaled


def _dq_block_to_bf16(t: ScaledTensor1x) -> jax.Array:
    rows, cols = t._2d_shape()
    br, bc = t.scaling_mode.block_shape
    s = t.scaling_mode.decode_scale_inv(t.scale_inv)
    gr, gc = -(-rows // br), -(-cols // bc)
    s = s[:gr, :gc]
    if br > 1:
        s = jnp.repeat(s, br, axis=0)[:rows]
    x = t.data.reshape(rows, cols)
    if gc * bc != cols:
        # Ragged trailing block: fall back to the materialized expansion.
        sf = jnp.repeat(s, bc, axis=1)[:, :cols]
        return (x.astype(jnp.float32) * sf).astype(jnp.bfloat16).reshape(
            t.data.shape)
    # (rows, gc, bc) * (rows, gc, 1) keeps the scale expansion a
    # BROADCAST that fuses into the convert chain. A jnp.repeat along
    # the scaled axis materializes a full-size f32 operand instead —
    # profiled at ~1.4 ms per 470 MB relayout copy on the MXFP8
    # TransformerLayer rung.
    #
    # MXFP8 (power-of-two scales) and NVFP4 (e4m3 scales): the bf16
    # multiply is EXACT — payload significands are <=4 bits and scale
    # significands <=4 bits, so every product fits bf16's 8-bit
    # significand — and the all-bf16 chain halves the broadcast traffic
    # the compiler materializes. FP8-block (arbitrary f32 scales) keeps
    # the f32 multiply.
    exact_bf16 = t.scaling_mode.name.startswith(("MXFP8", "NVFP4"))
    mul_t = jnp.bfloat16 if exact_bf16 else jnp.float32
    x3 = x.astype(mul_t).reshape(rows, gc, bc)
    out = (x3 * s.astype(mul_t)[:, :, None]).astype(jnp.bfloat16)
    return out.reshape(t.data.shape)


def q_dot(lhs, rhs, lhs_cdim: int, rhs_cdim: int, precision=None) -> jax.Array:
    """2D quantized matmul contracting ``lhs_cdim`` of lhs with
    ``rhs_cdim`` of rhs; operands are plain arrays or ScaledTensor1x.

    Per-tensor scaling imposes NO layout constraint (the scale is a
    scalar), so any contraction axes are allowed — this is what lets the
    layers keep only ONE quantized orientation and aim dgrad/wgrad at
    whatever axes the stored payloads already have (the reference needs
    cast-transpose kernels here purely because cuBLAS FP8 requires TN;
    XLA's dot_general does not). Block-scaled operands must contract
    along their stored last axis (the scaled axis).
    """
    # Resident quantized weight x small-M activation (decode): explicit
    # N-tiled Pallas GEMM with pipelined weight DMA (ops/decode_matmul).
    # Auto-on for TPU decode shapes since r4 (fp8 1194 -> 1371 tok/s).
    if (is_scaled(rhs) and rhs.scaling_mode.is_tensor_scaling
            and rhs.resident and rhs.data.ndim == 2
            and rhs_cdim % rhs.data.ndim == 1):
        from .decode_matmul import decode_tn_matvec, use_decode_matvec
        lhs_plain = not is_scaled(lhs)
        lhs2d = lhs if lhs_plain else lhs.data
        if (lhs2d.ndim == 2 and lhs_cdim % 2 == 1
                and (lhs_plain or (lhs.scaling_mode.is_tensor_scaling
                                   and not lhs.scaling_mode.is_block_scaling))
                and use_decode_matvec(lhs2d.shape[0], rhs.data.shape[0],
                                      lhs2d.shape[1])):
            s = rhs.scale_inv.astype(jnp.float32).reshape(())
            if not lhs_plain:
                s = s * lhs.scale_inv.astype(jnp.float32).reshape(())
            return decode_tn_matvec(lhs2d, rhs.data, s)

    # (A custom small-M FP8 matvec kernel was benchmarked here in round 1:
    # 75 GB/s vs XLA's 755 GB/s direct-fp8 dot, and it crashed the remote
    # compiler on some tilings — removed. XLA's convert-fused dot with a
    # resident fp8 operand IS the speed-of-light decode path on v5e.)

    post_scale = jnp.float32(1.0)

    def _2d_rows(t, cdim):
        shape = t.data.shape if is_scaled(t) else t.shape
        n = 1
        for i, d in enumerate(shape):
            if i != cdim % len(shape):
                n *= d
        return n

    def prep(t, cdim, opp_rows):
        nonlocal post_scale
        if not is_scaled(t):
            return t
        if t.scaling_mode.is_tensor_scaling:
            post_scale = post_scale * t.scale_inv.astype(jnp.float32).reshape(())
            if t.resident:
                # HBM-resident payload (prequantized weight / cache): feed
                # fp8 DIRECTLY so XLA streams 1 byte/param (755 GB/s
                # measured; an astype here would hoist out of decode loops
                # and materialize a bf16 copy).
                return t.data
            # In-graph quantized tensor: the bf16 cast fuses into the
            # producing quantize; direct fp8 operands measured SLOWER for
            # training steps (0.73x vs 0.87x of bf16).
            return t.data.astype(jnp.bfloat16)
        assert cdim == t.data.ndim - 1, (
            "block-scaled operands must contract along the stored last "
            "axis (scales run along it)")
        if t.tensor_scale_inv is not None:
            post_scale = post_scale * t.tensor_scale_inv.astype(jnp.float32).reshape(())
        x = _dq_block_to_bf16(t)
        if opp_rows > 1024:
            # Materialize the dequantized operand instead of letting XLA
            # fuse it into the dot: an input fusion recomputes the
            # dequant for every output tile that re-reads this operand.
            # Measured on the 8192x4096x28672 MXFP8 fwd GEMM: fused
            # 14.66 ms vs materialized 12.60 (bf16 10.63). With a small
            # opposing dim (decode matvecs) each element is read once,
            # so fusion is free and the barrier would only add a
            # round-trip.
            x = jax.lax.optimization_barrier(x)
        return x

    a = prep(lhs, lhs_cdim, _2d_rows(rhs, rhs_cdim))
    b = prep(rhs, rhs_cdim, _2d_rows(lhs, lhs_cdim))
    out = jax.lax.dot_general(
        a, b, dimension_numbers=(((lhs_cdim,), (rhs_cdim,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    return out * post_scale


def block_resident_dot(x2d, kern) -> jax.Array:
    """fwd GEMM against a BlockResidentKernel ((K, N) block-scaled
    resident payload). Small-M decode shapes run the KN-layout Pallas
    kernel (in-VMEM dequant, ops/decode_matmul.decode_kn_matvec);
    everything else materializes the bf16 dequant once behind a
    barrier (prefill reads each weight for many rows, so the
    materialization amortizes — and XLA's input fusion would otherwise
    recompute the dequant per output tile, the r3 MXFP8 finding)."""
    from .decode_matmul import decode_kn_matvec, use_decode_matvec
    m, k = x2d.shape
    n = kern.n
    if k == kern.k and use_decode_matvec(m, n, k):
        return decode_kn_matvec(
            x2d, kern.payload, kern.scale, kern.out_scale,
            block=kern.block, packed=kern.packed)
    w = kern.dequantize_kn()
    if m > 1024:
        w = jax.lax.optimization_barrier(w)
    out = jax.lax.dot_general(
        x2d, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if kern.out_scale is not None:
        out = out * kern.out_scale.astype(jnp.float32).reshape(())
    return out


def prequant_dot(x2d, colwise, x_quantizer=None) -> jax.Array:
    """fwd GEMM against any PrequantizedKernel.colwise storage, with the
    optional activation quantize (TE_TPU_PREQUANT_X_QUANT) applied in
    whatever form the storage supports: ScaledTensor storages take the
    quantized activation into the dot; the KN block-resident storage
    QDQs the activation (same operand values — both paths dequantize to
    bf16 before the MXU on v5e) and feeds the Pallas dequant kernel."""
    from ..quantize.prequant import BlockResidentKernel
    from ..quantize.tensor import get_rowwise
    if isinstance(colwise, BlockResidentKernel):
        if x_quantizer is not None:
            qx = get_rowwise(x_quantizer.quantize(x2d))
            x2d = qx.dequantize().astype(jnp.bfloat16)
        return block_resident_dot(x2d, colwise)
    if x_quantizer is not None:
        return tn_dot(get_rowwise(x_quantizer.quantize(x2d)), colwise)
    return resident_dot(x2d, colwise)


def resident_dot(x2d, colwise) -> jax.Array:
    """fwd GEMM against a PrequantizedKernel.colwise — a quantized
    ScaledTensor, a BlockResidentKernel, OR a plain resident (N, K)
    array (bf16 layout prep, prequantize_kernels(recipe=None)).
    Small-M decode shapes route to the N-tiled Pallas kernels for ALL."""
    from ..quantize.prequant import BlockResidentKernel
    if isinstance(colwise, BlockResidentKernel):
        return block_resident_dot(x2d, colwise)
    if not is_scaled(colwise) and not is_scaled(x2d):
        from .decode_matmul import decode_tn_matvec, use_decode_matvec
        m, k = x2d.shape
        if use_decode_matvec(m, colwise.shape[0], k):
            return decode_tn_matvec(x2d, colwise, None)
    return tn_dot(x2d, colwise)


def tn_dot(lhs, rhs, precision=None) -> jax.Array:
    """out[i, j] = sum_k lhs[i, k] * rhs[j, k], with lhs/rhs either plain
    arrays or ScaledTensor1x. Leading dims of each operand are flattened
    by the caller; this takes strict 2D operands and returns f32.
    """
    lk = (lhs.data.ndim if is_scaled(lhs) else lhs.ndim) - 1
    rk = (rhs.data.ndim if is_scaled(rhs) else rhs.ndim) - 1
    return q_dot(lhs, rhs, lk, rk, precision=precision)


def dequantize_any(x) -> jax.Array:
    return x.dequantize() if is_scaled(x) else x
