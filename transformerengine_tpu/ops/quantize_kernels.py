"""Pallas fused quantize kernels: cast + transpose + amax in one pass.

TPU counterpart of the reference cast/transpose kernel family
(reference: common/cast/ nvte_quantize*, common/transpose/
cast_transpose_fusion.cu). The pure-JAX path (quantize/qmath.py) is the
numerical ground truth; these kernels produce bit-identical outputs
while reading the input once: one HBM read yields the rowwise payload,
the colwise (transposed) payload, and the amax, instead of XLA's
three separate passes.

Used for tensor-scaling (scale known up front: delayed scaling, or
current scaling after a cheap amax pass) and MXFP8 (per-(1,32) E8M0
block scales computed in-tile for both orientations).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quantize.dtypes import E8M0_BIAS, dtype_max, float8_e4m3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ceil_div(a, b):
    return -(-a // b)


def _fused_enabled() -> bool:
    import os
    env = os.environ.get("TE_TPU_FUSED_QUANTIZE", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def pick_tile(d: int, cap: int = 256, align: int = 8) -> Optional[int]:
    """Largest tile from (cap, 256, 128) dividing d, or d itself if small."""
    for t in (cap, 256, 128):
        if t <= cap and d % t == 0:
            return t
    if d <= cap and d % align == 0:
        return d
    return None



# ---------------------------------------------------------------------------
# Tensor-scaling fused cast + transpose + amax
# ---------------------------------------------------------------------------

def _cast_transpose_kernel(scale_ref, x_ref, row_ref, col_ref, amax_ref, *,
                           q_max: float, q_dtype):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        amax_ref[0] = jnp.float32(0.0)

    x = x_ref[...].astype(jnp.float32)
    amax_ref[0] = jnp.maximum(amax_ref[0], jnp.max(jnp.abs(x)))
    scale = scale_ref[0]
    y = jnp.clip(x * scale, -q_max, q_max)
    row_ref[...] = y.astype(q_dtype)
    col_ref[...] = y.T.astype(q_dtype)


def cast_transpose(
    x2d: jax.Array,              # (M, N)
    scale: jax.Array,            # (1,) f32 quantize scale
    q_dtype,
    *,
    tile: Tuple[int, int] = (256, 256),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (rowwise (M,N) q_dtype, colwise (N,M) q_dtype, amax f32).
    Single HBM pass (reference: nvte_cast_transpose)."""
    m, n = x2d.shape
    tm = min(tile[0], _ceil_div(m, 8) * 8)
    tn = min(tile[1], _ceil_div(n, 128) * 128)
    grid = (_ceil_div(m, tm), _ceil_div(n, tn))
    # Out-of-bounds tile reads would pollute amax; require alignment and
    # let the caller pad (framework layers use 128-multiple shapes).
    assert m % tm == 0 and n % tn == 0, (
        f"cast_transpose needs tile-aligned shapes, got {x2d.shape} with "
        f"tile ({tm},{tn})")
    row, col, amax = pl.pallas_call(
        functools.partial(_cast_transpose_kernel,
                          q_max=dtype_max(q_dtype), q_dtype=q_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), q_dtype),
            jax.ShapeDtypeStruct((n, m), q_dtype),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ],
        interpret=_interpret(),
    )(scale.reshape(1), x2d)
    return row, col, amax


# ---------------------------------------------------------------------------
# MXFP8 fused dual-orientation quantize
# ---------------------------------------------------------------------------

def _mxfp8_kernel(x_ref, row_ref, col_ref, srow_ref, scol_ref, *,
                  q_dtype, emax_elem: int):
    x = x_ref[...].astype(jnp.float32)
    tm, tn = x.shape

    def block_quant(v, axis_len):
        # v: (R, C) with 32-blocks along the last axis
        r, c = v.shape
        vb = jnp.abs(v).reshape(r, c // 32, 32)
        amax = vb.max(axis=2)
        bits = jax.lax.bitcast_convert_type(
            jnp.maximum(amax, jnp.float32(2.0 ** -126)), jnp.int32)
        exp = jnp.clip((bits >> 23) - 127 - emax_elem, -E8M0_BIAS, E8M0_BIAS)
        exp = jnp.where(amax > 0, exp, 0)
        s_inv = jnp.exp2(-exp.astype(jnp.float32))
        q_max = dtype_max(q_dtype)
        y = jnp.clip(v.reshape(r, c // 32, 32) * s_inv[:, :, None],
                     -q_max, q_max)
        return y.reshape(r, c).astype(q_dtype), (exp + E8M0_BIAS).astype(jnp.uint8)

    yr, sr = block_quant(x, tn)
    row_ref[...] = yr
    srow_ref[...] = sr
    yc, sc = block_quant(x.T, tm)
    col_ref[...] = yc
    scol_ref[...] = sc


def mxfp8_quantize_2x(
    x2d: jax.Array,             # (M, N), M and N multiples of 32
    q_dtype=float8_e4m3,
    *,
    tile: Tuple[int, int] = (256, 256),
):
    """Fused MXFP8 rowwise+colwise quantize: one read, both payloads and
    both E8M0 scale grids (reference: common/cast/mxfp8 +
    cast_transpose_fusion)."""
    m, n = x2d.shape
    assert m % 32 == 0 and n % 32 == 0, x2d.shape
    tm = min(tile[0], m)
    tn = min(tile[1], n)
    assert m % tm == 0 and n % tn == 0, (x2d.shape, (tm, tn))
    grid = (m // tm, n // tn)
    emax = 8  # e4m3
    row, col, srow, scol = pl.pallas_call(
        functools.partial(_mxfp8_kernel, q_dtype=q_dtype, emax_elem=emax),
        grid=grid,
        in_specs=[pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn // 32), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tm // 32), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), q_dtype),
            jax.ShapeDtypeStruct((n, m), q_dtype),
            jax.ShapeDtypeStruct((m, n // 32), jnp.uint8),
            jax.ShapeDtypeStruct((n, m // 32), jnp.uint8),
        ],
        interpret=_interpret(),
    )(x2d)
    return row, col, srow, scol
