"""Low-precision dtype tables for the TPU Transformer Engine.

Mirrors the numerics envelope of the reference implementation
(reference: transformer_engine/common/recipe/__init__.py:29-50 and
common/include/transformer_engine/transformer_engine.h:25-38) but is
expressed purely in terms of JAX/ml_dtypes types — there is no C enum.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Canonical low-precision dtypes (all native ml_dtypes, usable as jnp dtypes).
float8_e4m3 = jnp.float8_e4m3fn
float8_e5m2 = jnp.float8_e5m2
float8_e8m0 = jnp.float8_e8m0fnu  # power-of-two scale dtype for MXFP8
float4_e2m1 = jnp.float4_e2m1fn

# Maximum representable magnitudes (reference: recipe/__init__.py:47-49).
DTYPE_MAX = {
    jnp.dtype(float8_e4m3): 448.0,
    jnp.dtype(float8_e5m2): 57344.0,
    jnp.dtype(float4_e2m1): 6.0,
    jnp.dtype(jnp.bfloat16): float(jnp.finfo(jnp.bfloat16).max),
    jnp.dtype(jnp.float16): 65504.0,
    jnp.dtype(jnp.float32): float(np.finfo(np.float32).max),
    jnp.dtype(jnp.int8): 127.0,
}

# Smallest positive normal (used for underflow stats in the debug toolkit).
DTYPE_TINY = {
    jnp.dtype(float8_e4m3): 2.0 ** -6,
    jnp.dtype(float8_e5m2): 2.0 ** -14,
    jnp.dtype(float4_e2m1): 0.5,
}


def dtype_max(dtype) -> float:
    """Max representable magnitude of ``dtype``."""
    return DTYPE_MAX[jnp.dtype(dtype)]


def is_fp8_dtype(dtype) -> bool:
    return jnp.dtype(dtype) in (jnp.dtype(float8_e4m3), jnp.dtype(float8_e5m2))


def is_fp4_dtype(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.dtype(float4_e2m1)


# ---------------------------------------------------------------------------
# TPU compatibility shims (see memory note tpu-v5e-dtype-constraints):
# E8M0 and FP4 are not hardware dtypes on the bench TPU generation, so we
# store MXFP8 scales as biased-exponent uint8 and FP4 payloads as
# fp4-grid-snapped values in an e4m3 byte. Both are bit-faithful to the
# reference formats.
# ---------------------------------------------------------------------------
E8M0_BIAS = 127
# Storage dtype used for NVFP4 payloads (values constrained to the e2m1 grid).
FP4_STORAGE_DTYPE = float8_e4m3

# The 8 non-negative values representable in FP4 E2M1.
FP4_GRID = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)


def encode_e8m0(scale_f32):
    """Power-of-two fp32 scale -> biased exponent uint8 (e8m0 bits)."""
    import jax
    bits = jax.lax.bitcast_convert_type(scale_f32.astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF).astype(jnp.uint8)


def decode_e8m0(e):
    """Biased-exponent uint8 -> fp32 power-of-two scale."""
    return jnp.exp2(e.astype(jnp.float32) - E8M0_BIAS)
