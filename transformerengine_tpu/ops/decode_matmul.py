"""Pallas decode-GEMM: small-M activations against an HBM-resident
quantized weight, N-tiled.

Motivation (r4 decode profile): at B=8 the decode GEMMs are
MXU-occupancy-bound (M=8 uses 8/128 systolic rows) and XLA's small-M
lowering adds per-op overheads on top. This kernel runs the (M, K) x
(block_n, K)^T stripes directly; XLA's memory-space-assignment still
stages the weight into scoped VMEM around the call with async slices
that overlap ACROSS ops (that staging measured FASTER than in-kernel
HBM DMA — see _kernel_hbm).

History: an r1 small-M matvec lost 10x to XLA (75 GB/s) — it tiled K
with a tiny accumulator and serialized on DMA latency. This kernel
keeps K whole per stripe (up to 7 MB of VMEM per buffer) and tiles N
only. MEASURED WIN (v5e, r4): fp8 decode 6.70 -> 5.83 ms/step
(1194 -> 1371 tok/s) on the 16L 8B-geometry rung, with 100% greedy
token agreement vs the XLA path. Default auto-on for resident
tensor-scaling payloads with M <= 16 on TPU (TE_TPU_DECODE_MATVEC).

Reference analog: cuBLASLt FP8 GEMV/decode path (cublaslt_gemm.cu).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def use_decode_matvec(m: int, n: int, k: int) -> bool:
    env = os.environ.get("TE_TPU_DECODE_MATVEC", "auto")
    if env == "0":
        return False
    if env != "1" and _interpret():
        # auto = TPU only: the interpret-mode kernel would slow every
        # small CPU test; "1" forces (used by the parity test).
        return False
    # m <= 32 measured faster than the XLA lowering (B=32 decode:
    # 7.92 -> 7.28 ms/step); larger m untested -> fall back.
    max_m = int(os.environ.get("TE_TPU_DECODE_MATVEC_MAX_M", "32"))
    return m <= max_m and n >= 1024 and k >= 1024 and k % 128 == 0


def _kernel(x_ref, w_ref, s_ref, o_ref, *, out_scale: bool):
    # x: (M, K) bf16 resident in VMEM across all grid steps;
    # w: (block_n, K) quantized payload stripe; o: (M, block_n) f32.
    x = x_ref[...]
    w = w_ref[...]
    acc = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if out_scale:
        acc = acc * s_ref[0]
    o_ref[...] = acc


def _kernel_hbm(x_ref, w_hbm, s_ref, o_ref, w_buf, sem, *,
                out_scale: bool, block_n: int, num_steps: int):
    # Manual double-buffered HBM->VMEM stripe DMA (ANY-space weight).
    # MEASURED SLOWER than the blocked-BlockSpec variant (6.02 vs 5.83
    # ms/step on the 16L fp8 decode rung): with blocked specs XLA's
    # memory-space-assignment stages the weights into scoped VMEM with
    # async slices that overlap ACROSS ops (layer L+1's weights load
    # during layer L's compute) — cross-op overlap an in-kernel DMA
    # cannot express. Kept as TE_TPU_DECODE_MATVEC_HBM=1 for future
    # compilers; default off.
    i = pl.program_id(0)

    def copy_in(step, slot):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(step * block_n, block_n), :],
            w_buf.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _prologue():
        copy_in(0, 0).start()

    @pl.when(i + 1 < num_steps)
    def _prefetch():
        copy_in(i + 1, (i + 1) % 2).start()

    copy_in(i, i % 2).wait()
    acc = jax.lax.dot_general(
        x_ref[...], w_buf[i % 2], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if out_scale:
        acc = acc * s_ref[0]
    o_ref[...] = acc


def _e2m1_code_to_e4m3_bits(code_i32):
    """4-bit e2m1 code -> the exact e4m3 byte for the same value.

    e2m1 magnitudes {0, .5, 1, 1.5, 2, 3, 4, 6} re-encode exactly in
    e4m3 (1 mantissa bit <= 3): for codes with exponent > 0 the byte is
    ``mag*4 + 48`` (exponent rebias 1->7 shifts by 6<<3, mantissa moves
    up 2 bits); the two subnormals {0, 0.5} map to {0, 0x30} = mag*48.
    Sign bit moves from bit 3 to bit 7. All int32 VPU ops, no lookup.
    (Reference value grid: common/cast/nvfp4 kernels.)"""
    mag = code_i32 & 7
    byte = jnp.where(mag < 2, mag * 48, mag * 4 + 48)
    return byte | ((code_i32 & 8) << 4)


def _unpack_nibbles_to_bf16(packed_u8):
    """(rows, n) uint8 split-plane packed e2m1 codes -> two (rows, n)
    bf16 halves (low nibbles = code rows [0, rows), high = [rows, 2*rows))."""
    p = packed_u8.astype(jnp.int32)
    out = []
    for code in (p & 15, p >> 4):
        bits = _e2m1_code_to_e4m3_bits(code).astype(jnp.uint8)
        from ..quantize.dtypes import float8_e4m3
        e4 = jax.lax.bitcast_convert_type(bits, jnp.dtype(float8_e4m3))
        out.append(e4.astype(jnp.bfloat16))
    return out


def _kn_kernel(x_ref, w_ref, s_ref, os_ref, o_ref, *,
               block: int, packed: bool, out_scale: bool,
               chunk_rows: int):
    """Block-scaled KN-layout decode GEMM stripe.

    w: (K, bn) quantized payload (or (K/2, bn) packed nibbles);
    s: (K/block, bn) bf16 block scales. The dequant reshape
    (rows, bn) -> (rows/block, block, bn) splits the MAJOR (sublane)
    axis — a free row-regrouping view in Mosaic — so the scale
    expansion is a sublane broadcast, not a lane shuffle (lane-wise
    16-way expansions measured 2x slower in the r2 quantize kernels;
    the (N, K) storage orientation would need exactly that).

    The dequant+dot runs over static ``chunk_rows``-row K-chunks with
    f32 accumulation: the materialized bf16 dequant stripe shrinks to
    one chunk (a whole-K bn=512 K=4096 stripe measured 20.96M scoped
    VMEM vs the 16M limit — the convert/scale/dot-operand temporaries
    do not collapse)."""
    x = x_ref[...]
    s = s_ref[...]
    bn = o_ref.shape[1]
    m = x.shape[0]
    acc = jnp.zeros((m, bn), jnp.float32)
    k_store = w_ref.shape[0]
    gc = chunk_rows // block               # scale rows per chunk
    for i in range(k_store // chunk_rows):
        rows = slice(i * chunk_rows, (i + 1) * chunk_rows)
        if packed:
            lo, hi = _unpack_nibbles_to_bf16(w_ref[rows, :])
            g0 = i * gc
            gh = (k_store + i * chunk_rows) // block
            for part, srows, xoff in (
                    (lo, slice(g0, g0 + gc), i * chunk_rows),
                    (hi, slice(gh, gh + gc), k_store + i * chunk_rows)):
                wb = (part.reshape(gc, block, bn)
                      * s[srows][:, None, :]).reshape(chunk_rows, bn)
                acc = acc + jax.lax.dot_general(
                    x[:, xoff:xoff + chunk_rows], wb,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            wb = (w_ref[rows, :].astype(jnp.bfloat16).reshape(gc, block, bn)
                  * s[i * gc:(i + 1) * gc][:, None, :]).reshape(
                chunk_rows, bn)
            acc = acc + jax.lax.dot_general(
                x[:, rows], wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    if out_scale:
        acc = acc * os_ref[0]
    o_ref[...] = acc


def decode_kn_matvec(
    x: jax.Array,             # (M, K) bf16/f32 activations (small M)
    payload: jax.Array,       # (K, N) quantized bytes | (K/2, N) packed
    scale: jax.Array,         # (K/block, N) bf16 block scales
    out_scale=None,           # optional scalar second-level scale
    *,
    block: int,
    packed: bool = False,
    block_n: Optional[int] = None,
) -> jax.Array:               # (M, N) f32
    m, k = x.shape
    n = payload.shape[1]
    k_store = payload.shape[0]
    assert k_store == (k // 2 if packed else k), (x.shape, payload.shape)
    assert scale.shape == (k // block, n), (scale.shape, k, block, n)
    if block_n is None:
        env_bn = os.environ.get("TE_TPU_DECODE_MATVEC_BN")
        if env_bn:
            block_n = int(env_bn)
        else:
            # Stripe width bound by the double-buffered payload block.
            block_n = 512
            while (block_n > 128
                   and 2 * k_store * block_n * payload.dtype.itemsize
                   > 8 * 2 ** 20):
                block_n //= 2
    while n % block_n:
        block_n //= 2
    assert block_n >= 128, (n, block_n)
    # In-kernel K-chunking keeps the dequant temporaries (~4 bf16/int32
    # stripe-sized values; Mosaic stack-allocates them per chunk) inside
    # scoped VMEM regardless of K.
    chunk_rows = k_store
    per_row = block_n * (10 if packed else 8)
    while (chunk_rows * per_row > 4 * 2 ** 20
           and chunk_rows % 2 == 0 and (chunk_rows // 2) % block == 0):
        chunk_rows //= 2
    s = (jnp.asarray(out_scale, jnp.float32).reshape(1)
         if out_scale is not None else jnp.ones((1,), jnp.float32))
    xin = x.astype(jnp.bfloat16) if x.dtype != jnp.float32 else x
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=(k_store * n * payload.dtype.itemsize
                        + scale.size * 2 + m * k * 2),
        transcendentals=0)
    return pl.pallas_call(
        functools.partial(_kn_kernel, block=block, packed=packed,
                          out_scale=out_scale is not None,
                          chunk_rows=chunk_rows),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_store, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // block, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=_interpret(),
    )(xin, payload, scale.astype(jnp.bfloat16), s)


def decode_tn_matvec(
    x: jax.Array,            # (M, K) bf16/f32 activations (small M)
    w_payload: jax.Array,    # (N, K) quantized payload (fp8) or bf16
    scale_inv: Optional[jax.Array] = None,   # scalar dequant scale
    *,
    block_n: Optional[int] = None,
) -> jax.Array:              # (M, N) f32
    m, k = x.shape
    n = w_payload.shape[0]
    assert w_payload.shape[1] == k, (x.shape, w_payload.shape)
    if block_n is None:
        # 512 stripes for 1-byte payloads (measured config); halve for
        # bf16 so the double-buffered stripes stay within scoped VMEM.
        # TE_TPU_DECODE_MATVEC_BN overrides for sweeps.
        env_bn = os.environ.get("TE_TPU_DECODE_MATVEC_BN")
        if env_bn:
            block_n = int(env_bn)
        else:
            block_n = 512 if w_payload.dtype.itemsize == 1 else 256
    while n % block_n:
        block_n //= 2
    assert block_n >= 128, (n, block_n)
    s = (jnp.asarray(scale_inv, jnp.float32).reshape(1)
         if scale_inv is not None else jnp.ones((1,), jnp.float32))
    grid = (n // block_n,)
    xin = x.astype(jnp.bfloat16) if x.dtype != jnp.float32 else x
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=n * k * w_payload.dtype.itemsize + m * k * 2,
        transcendentals=0)
    hbm_mode = os.environ.get("TE_TPU_DECODE_MATVEC_HBM", "0") == "1"
    if hbm_mode and not _interpret():
        # Double buffer must fit scoped VMEM alongside x and the out
        # stripe: cap the two stripes at ~8 MB.
        while (2 * block_n * k * w_payload.dtype.itemsize > 8 * 2 ** 20
               and block_n > 128):
            block_n //= 2
        while n % block_n:
            block_n //= 2
        grid = (n // block_n,)
        return pl.pallas_call(
            functools.partial(_kernel_hbm,
                              out_scale=scale_inv is not None,
                              block_n=block_n, num_steps=grid[0]),
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, block_n, k), w_payload.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=cost,
            interpret=False,
        )(xin, w_payload, s)
    out = pl.pallas_call(
        functools.partial(_kernel, out_scale=scale_inv is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=_interpret(),
    )(xin, w_payload, s)
    return out
