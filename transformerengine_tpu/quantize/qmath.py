"""Pure-JAX quantization math for every scaling mode.

These functions are the numerical ground truth for the framework: the
Pallas kernels in ``transformerengine_tpu.ops`` must match them (the same
role the CPU reference helpers in the reference's tests/cpp/test_common.cu
play). They are also the production path on backends where a Pallas
kernel is not available — XLA fuses them well enough for correctness
work and CPU testing.

All functions operate on a 2D view (rows, cols) with the quantization
axis innermost; callers handle reshapes/transposes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .dtypes import (
    E8M0_BIAS, FP4_GRID, FP4_STORAGE_DTYPE, decode_e8m0, dtype_max,
    float4_e2m1, float8_e4m3, float8_e8m0, is_fp4_dtype)
from .scaling_modes import ScalingMode

_F32_TINY = jnp.float32(2.0 ** -126)


def decode_scale_inv(scale_inv: jax.Array, mode: ScalingMode) -> jax.Array:
    """Decode stored scale_inv metadata to fp32 multipliers."""
    return mode.decode_scale_inv(scale_inv)


def compute_amax(x: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def compute_scale_from_amax(amax, q_dtype, margin: float = 0.0) -> jax.Array:
    """fp32 scale such that amax * scale ~= q_max (reference:
    pytorch/quantization.py default scaling update / recipe kernels)."""
    q_max = dtype_max(q_dtype)
    amax = jnp.asarray(amax, jnp.float32)
    scale = (q_max / amax) * (2.0 ** -margin)
    # Guard zero / non-finite amax -> keep scale at 1.
    ok = jnp.isfinite(scale) & (scale > 0) & (amax > 0) & jnp.isfinite(amax)
    return jnp.where(ok, scale, jnp.float32(1.0))


_FP4_VALS = jnp.asarray(FP4_GRID, jnp.float32)
# Midpoints between adjacent fp4 grid values, with ties resolved to the
# even-mantissa neighbour (IEEE round-to-nearest-even on the e2m1 grid).
_FP4_BOUNDS = jnp.asarray([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0], jnp.float32)
_FP4_TIE_UP = jnp.asarray([False, True, False, True, False, True, False])


def cast_to_fp4_grid(x: jax.Array) -> jax.Array:
    """Round-to-nearest-even onto the FP4 E2M1 value grid, stored in an
    e4m3 byte (the bench TPU has no fp4 hardware dtype; values are
    bit-faithful to e2m1)."""
    xf = x.astype(jnp.float32)
    ax = jnp.clip(jnp.abs(xf), 0.0, 6.0)
    lo = jnp.searchsorted(_FP4_BOUNDS, ax, side="left")
    hi = jnp.searchsorted(_FP4_BOUNDS, ax, side="right")
    k = jnp.clip(lo, 0, 6)
    idx = jnp.where((lo != hi) & _FP4_TIE_UP[k], hi, lo)
    mag = _FP4_VALS[jnp.clip(idx, 0, 7)]
    return (jnp.sign(xf) * mag).astype(FP4_STORAGE_DTYPE)


def _stochastic_cast_fp4(x: jax.Array, key) -> jax.Array:
    """Exactly unbiased stochastic rounding onto the FP4 grid."""
    xf = x.astype(jnp.float32)
    ax = jnp.clip(jnp.abs(xf), 0.0, 6.0)
    # lower grid neighbour index
    il = jnp.clip(jnp.searchsorted(_FP4_VALS, ax, side="right") - 1, 0, 7)
    iu = jnp.clip(il + 1, 0, 7)
    lo, up = _FP4_VALS[il], _FP4_VALS[iu]
    p = jnp.where(up > lo, (ax - lo) / jnp.maximum(up - lo, _F32_TINY), 0.0)
    u = jax.random.uniform(key, x.shape, jnp.float32)
    mag = jnp.where(u < p, up, lo)
    return (jnp.sign(xf) * mag).astype(FP4_STORAGE_DTYPE)


def saturate_cast(x: jax.Array, q_dtype) -> jax.Array:
    """Cast with saturation (ml_dtypes fp8/fp4 casts overflow to NaN)."""
    if is_fp4_dtype(q_dtype):
        return cast_to_fp4_grid(x)
    m = dtype_max(q_dtype)
    return jnp.clip(x.astype(jnp.float32), -m, m).astype(q_dtype)


def _rand_u32(key, shape):
    return jax.random.bits(key, shape, jnp.uint32)


def stochastic_cast(x: jax.Array, q_dtype, key) -> jax.Array:
    """Stochastic rounding f32 -> fp8/fp4 via mantissa randomization.

    Adds uniform random bits below the target mantissa and truncates —
    the standard SR construction (used by the reference's NVFP4 recipe
    for gradients; here in pure JAX, the Pallas path uses the TPU PRNG).
    Subnormal targets round with slightly coarser granularity; acceptable
    within the recipe's error envelope. FP4 uses an exact table-based SR.
    """
    if is_fp4_dtype(q_dtype):
        return _stochastic_cast_fp4(x, key)
    d = jnp.dtype(q_dtype)
    mant = {jnp.dtype(float4_e2m1): 1, jnp.dtype(float8_e4m3): 3}.get(d, 2)
    drop = 23 - mant
    m = dtype_max(q_dtype)
    xc = jnp.clip(x.astype(jnp.float32), -m, m)
    bits = jax.lax.bitcast_convert_type(xc, jnp.uint32)
    r = _rand_u32(key, x.shape) & jnp.uint32((1 << drop) - 1)
    bits = (bits + r) & jnp.uint32(~((1 << drop) - 1) & 0xFFFFFFFF)
    xt = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.clip(xt, -m, m).astype(q_dtype)


def _cast(x, q_dtype, key=None):
    if key is None:
        return saturate_cast(x, q_dtype)
    return stochastic_cast(x, q_dtype, key)


# ---------------------------------------------------------------------------
# Per-tensor scaling
# ---------------------------------------------------------------------------

def tensor_scale_quantize(x, q_dtype, scale, key=None):
    """Quantize with a given fp32 scale. Returns (data, scale_inv, amax)."""
    amax = compute_amax(x)
    scale = jnp.asarray(scale, jnp.float32)
    data = _cast(x.astype(jnp.float32) * scale, q_dtype, key)
    return data, (1.0 / scale).reshape(1), amax


def current_scale_quantize(x, q_dtype, key=None):
    amax = compute_amax(x)
    scale = compute_scale_from_amax(amax, q_dtype)
    data = _cast(x.astype(jnp.float32) * scale, q_dtype, key)
    return data, (1.0 / scale).reshape(1), amax


# ---------------------------------------------------------------------------
# Block scaling helpers
# ---------------------------------------------------------------------------

def _block_amax(x2d, br: int, bc: int) -> jax.Array:
    """Per-(br, bc)-block amax of a 2D array, padding ragged edges."""
    r, c = x2d.shape
    gr, gc = -(-r // br), -(-c // bc)
    xp = jnp.pad(jnp.abs(x2d.astype(jnp.float32)), ((0, gr * br - r), (0, gc * bc - c)))
    return xp.reshape(gr, br, gc, bc).max(axis=(1, 3))


def _expand_scales(s, br, bc, r, c):
    return jnp.repeat(jnp.repeat(s, br, axis=0), bc, axis=1)[:r, :c]


def _pow2_floor_exp(v):
    """floor(log2(v)) via exponent extraction (exact, no libm)."""
    bits = jax.lax.bitcast_convert_type(jnp.maximum(v, _F32_TINY), jnp.int32)
    return (bits >> 23) - 127


def mxfp8_quantize(x2d, q_dtype=float8_e4m3, key=None):
    """OCP MX quantization: E8M0 scale per (1, 32) block.

    shared_exponent = floor(log2(block_amax)) - emax(elem dtype), clamped
    to E8M0 range (reference: common/cast/mxfp8 kernels). The scale is
    returned as biased-exponent uint8 — the exact e8m0 bit pattern —
    because the bench TPU has no e8m0 hardware dtype.
    """
    r, c = x2d.shape
    br, bc = 1, 32
    amax = _block_amax(x2d, br, bc)
    emax_elem = {jnp.dtype(float8_e4m3): 8}.get(jnp.dtype(q_dtype), 8)
    exp = jnp.clip(_pow2_floor_exp(amax) - emax_elem, -E8M0_BIAS, E8M0_BIAS)
    exp = jnp.where(amax > 0, exp, 0)
    scale_inv = jnp.exp2(-exp.astype(jnp.float32))
    data = _cast(x2d.astype(jnp.float32) * _expand_scales(scale_inv, br, bc, r, c),
                 q_dtype, key)
    return data, (exp + E8M0_BIAS).astype(jnp.uint8)


def block_quantize(x2d, q_dtype, br: int, bc: int, pow2_scales: bool = True, key=None):
    """FP8 1D/2D block scaling with fp32 scales (reference: Float8BlockScaling).

    Returns (data, scale_inv[f32 grid]).
    """
    r, c = x2d.shape
    amax = _block_amax(x2d, br, bc)
    q_max = dtype_max(q_dtype)
    if pow2_scales:
        # Largest power of two <= q_max / amax  (force_pow_2_scales=True default)
        exp = _pow2_floor_exp(jnp.float32(q_max) / jnp.maximum(amax, _F32_TINY))
        scale = jnp.exp2(exp.astype(jnp.float32))
    else:
        scale = q_max / jnp.maximum(amax, _F32_TINY)
    scale = jnp.where((amax > 0) & jnp.isfinite(scale), scale, 1.0)
    data = _cast(x2d.astype(jnp.float32) * _expand_scales(scale, br, bc, r, c), q_dtype, key)
    return data, (1.0 / scale)


# ---------------------------------------------------------------------------
# NVFP4 (two-level block scaling)
# ---------------------------------------------------------------------------

def nvfp4_quantize(x2d, key=None, global_amax: Optional[jax.Array] = None,
                   block_shape=(1, 16), four_over_six: bool = False):
    """NVFP4: FP4E2M1 data, E4M3 scale per block ((1,16) 1D or (16,16) 2D
    weight mode), fp32 per-tensor second-level scale (reference:
    common/cast/nvfp4, recipe/nvfp4.cu; QParams.fp4_2d_quantization).

    Returns (data_fp4, block_scale_inv[e4m3], tensor_scale_inv[f32(1,)], amax).
    """
    r, c = x2d.shape
    br, bc = block_shape
    amax = compute_amax(x2d) if global_amax is None else jnp.asarray(global_amax, jnp.float32)
    fp4_max = dtype_max(float4_e2m1)   # 6.0
    e4m3_max = dtype_max(float8_e4m3)  # 448.0
    # Second level: map the largest block-scale (amax/6) to E4M3 max.
    tensor_scale = jnp.where(amax > 0, amax / (fp4_max * e4m3_max), jnp.float32(1.0))
    block_amax = _block_amax(x2d, br, bc)

    def encode(s_dec):
        s_e4m3 = saturate_cast(s_dec / tensor_scale, float8_e4m3)
        s_eff = s_e4m3.astype(jnp.float32) * tensor_scale
        inv = jnp.where(s_eff > 0, 1.0 / jnp.maximum(s_eff, _F32_TINY), 0.0)
        data = _cast(x2d.astype(jnp.float32)
                     * _expand_scales(inv, br, bc, r, c), float4_e2m1, key)
        return data, s_e4m3, s_eff

    data, s_e4m3, s_eff = encode(block_amax / fp4_max)
    if four_over_six:
        # Four Over Six (reference: cast/nvfp4/quantize_4over6_nvfp4.cuh):
        # a second candidate expands the block scale 1.5x so FP4 value 4
        # covers the range value 6 covers normally; per block, keep the
        # encoding with lower squared dequantization error (ties -> 6).
        data4, s4_e4m3, s4_eff = encode(block_amax / 4.0)

        def block_err(d, eff):
            dq = d.astype(jnp.float32) * _expand_scales(eff, br, bc, r, c)
            e = jnp.square(x2d.astype(jnp.float32) - dq)
            gr, gc = -(-r // br), -(-c // bc)
            ep = jnp.pad(e, ((0, gr * br - r), (0, gc * bc - c)))
            return ep.reshape(gr, br, gc, bc).sum(axis=(1, 3))

        use4 = block_err(data4, s4_eff) < block_err(data, s_eff)
        s_e4m3 = jnp.where(use4, s4_e4m3, s_e4m3)
        use4_full = _expand_scales(use4, br, bc, r, c)
        data = jnp.where(use4_full, data4, data)
    return data, s_e4m3, tensor_scale.reshape(1), amax
