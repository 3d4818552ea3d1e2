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

from ..quantize.dtypes import (
    E8M0_BIAS, FP4_STORAGE_DTYPE, dtype_max, float8_e4m3)


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


def _norm_cast_transpose_kernel(scale_ref, x_ref, gamma_ref, beta_ref,
                                row_ref, col_ref, amax_ref, rsig_ref,
                                mu_ref, *, q_max: float, q_dtype,
                                norm: str, zcg: bool, eps: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        amax_ref[0] = jnp.float32(0.0)

    x = x_ref[...].astype(jnp.float32)
    g = gamma_ref[...].astype(jnp.float32)
    if zcg:
        g = g + 1.0
    if norm == "layernorm":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        mu_ref[...] = mu
    else:
        xc = x
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    rsig_ref[...] = rsig
    y = xc * rsig * g
    if beta_ref is not None:
        y = y + beta_ref[...].astype(jnp.float32)
    # Match the unfused chain bit-exactly (repo invariant: kernels ==
    # qmath): normalization_fwd casts to the input dtype before the
    # quantizer sees the values.
    y = y.astype(x_ref.dtype).astype(jnp.float32)
    amax_ref[0] = jnp.maximum(amax_ref[0], jnp.max(jnp.abs(y)))
    q = jnp.clip(y * scale_ref[0], -q_max, q_max)
    row_ref[...] = q.astype(q_dtype)
    col_ref[...] = q.T.astype(q_dtype)


def norm_cast_transpose(
    x2d: jax.Array,              # (M, H)
    gamma: jax.Array,            # (H,)
    beta: Optional[jax.Array],   # (H,) or None
    scale: jax.Array,            # (1,) f32 quantize scale (delayed)
    q_dtype,
    *,
    norm: str = "rmsnorm",       # "rmsnorm" | "layernorm"
    zero_centered_gamma: bool = False,
    epsilon: float = 1e-6,
):
    """Fused normalization + dual-orientation quantize: one HBM read of
    ``x`` yields the rowwise payload, the colwise payload, the amax of
    the NORMALIZED values, and the (mu,) rsigma residuals — the
    normalized bf16 intermediate is never written to HBM (reference:
    common/normalization/ FP8-output fusion, nvte_layernorm_fwd fp8).
    Returns (row (M,H), col (H,M), amax (1,), rsigma (M,1)[, mu (M,1)]).
    """
    m, h = x2d.shape
    assert h % 128 == 0 and m % 8 == 0, (m, h)
    tm = 256
    while tm > 8 and (tm * h * 4 > 6 * 2 ** 20 or m % tm):
        tm //= 2
    assert m % tm == 0, (m, tm)
    with_beta = beta is not None
    ln = norm == "layernorm"

    def kern(scale_ref, x_ref, gamma_ref, *rest):
        if with_beta:
            beta_ref, *outs = rest
        else:
            beta_ref, outs = None, list(rest)
        row_ref, col_ref, amax_ref, rsig_ref = outs[:4]
        mu_ref = outs[4] if ln else None
        _norm_cast_transpose_kernel(
            scale_ref, x_ref, gamma_ref, beta_ref, row_ref, col_ref,
            amax_ref, rsig_ref, mu_ref, q_max=dtype_max(q_dtype),
            q_dtype=q_dtype, norm=norm, zcg=zero_centered_gamma,
            eps=epsilon)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [scale.reshape(1), x2d, gamma.reshape(1, h)]
    if with_beta:
        in_specs.append(pl.BlockSpec((1, h), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(beta.reshape(1, h))
    out_specs = [
        pl.BlockSpec((tm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, h), q_dtype),
        jax.ShapeDtypeStruct((h, m), q_dtype),
        jax.ShapeDtypeStruct((1,), jnp.float32),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
    ]
    if ln:
        out_specs.append(pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m, 1), jnp.float32))
    return pl.pallas_call(
        kern, grid=(m // tm,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=_interpret())(*args)


# ---------------------------------------------------------------------------
# MXFP8 fused dual-orientation quantize
# ---------------------------------------------------------------------------

def _e8m0_exp(amax, emax_elem):
    """Shared E8M0 exponent rule (bit-matches qmath): floor-log2 of the
    block amax minus the element emax, clipped to the E8M0 range."""
    bits = jax.lax.bitcast_convert_type(
        jnp.maximum(amax, jnp.float32(2.0 ** -126)), jnp.int32)
    exp = jnp.clip((bits >> 23) - 127 - emax_elem, -E8M0_BIAS, E8M0_BIAS)
    return jnp.where(amax > 0, exp, 0)


def _mxfp8_pair(v, vt, expand, q_dtype, emax_elem):
    """Payload of ``v`` (R, C) quantized along 32-wide lane blocks, plus
    the TRANSPOSED scale grid (C//32, R).

    Mosaic has no 2D->3D vector reshape, so the block amaxes come from
    static SUBLANE slices of ``vt`` == v.T (amax of the same 32 values —
    bit-equal either way). The payload is then one multiply against the
    scale grid stretched across its 32 lanes by a tiny 0/1 MXU matmul
    (``expand``, (C//32, C)) — exact, since each output is a single
    s*1 product. The previous formulation concatenated 16 lane-sliced
    payload pieces per tile, which Mosaic lowered as serial relayouts
    (measured 146 -> 280 GB/s on an (8192, 14336) quantize)."""
    q_max = dtype_max(q_dtype)
    c = v.shape[1]
    es = []
    for ib in range(c // 32):
        pt = vt[ib * 32:(ib + 1) * 32, :]
        amax_t = jnp.max(jnp.abs(pt), axis=0, keepdims=True)    # (1, R)
        es.append(_e8m0_exp(amax_t, emax_elem))
    e_t = jnp.concatenate(es, axis=0)                           # (C//32, R)
    s_inv_t = jnp.exp2(-e_t.astype(jnp.float32))
    sexp = jax.lax.dot_general(
        s_inv_t.T, expand, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (R, C)
    y = jnp.clip(v * sexp, -q_max, q_max).astype(q_dtype)
    return y, e_t + E8M0_BIAS


def _mxfp8_kernel(expand_n_ref, expand_m_ref, x_ref, row_ref, col_ref,
                  srow_ref, scol_ref, *, q_dtype, emax_elem: int):
    # Scale grids leave the kernel TRANSPOSED as int32: a (tm, tn//32)
    # uint8 block has an 8-lane minor dim, which Mosaic rejects (lane dim
    # must be a 128-multiple); the transposed int32 block (tn//32, tm) is
    # (8, 256) — natively tileable. The caller transposes back (scale
    # grids are 32x smaller than payloads, so the extra pass is ~3%).
    x = x_ref[...].astype(jnp.float32)
    xt = x.T
    row, srow_t = _mxfp8_pair(x, xt, expand_n_ref[...], q_dtype, emax_elem)
    row_ref[...] = row
    srow_ref[...] = srow_t
    col, scol_t = _mxfp8_pair(xt, x, expand_m_ref[...], q_dtype, emax_elem)
    col_ref[...] = col
    scol_ref[...] = scol_t


def _expand_mat(blocks: int, bs: int = 32):
    """0/1 lane-stretch matrix: expand[ib, ib*bs + t] = 1."""
    return jnp.repeat(jnp.eye(blocks, dtype=jnp.float32), bs, axis=1)


# ---------------------------------------------------------------------------
# NVFP4 fused RHT + two-level cast (rowwise + colwise in one pass)
# ---------------------------------------------------------------------------
#
# TPU collapse of the reference's 8.5k-LoC hadamard_transform kernel
# family (reference: common/hadamard_transform/, fused row-cast /
# col-RHT-cast / +amax variants): a first pass reads the tensor once and
# produces BOTH global amaxes (plain and rotated — NVFP4's two-level
# scaling needs them before any cast), a second pass re-reads it once
# and emits the rowwise payload, the RHT'd colwise payload, and both
# E4M3 block-scale grids. The 16x16 rotation happens in VMEM on the
# tile; nothing rotated ever touches HBM at full precision.

_FP4_BOUNDS = (0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0)
_FP4_TIE_UP = (False, True, False, True, False, True, False)
_FP4_VALS = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)
_F32_TINY = 2.0 ** -126


def _fp4_grid_round(y):
    """Round-to-nearest(-even on grid ties) onto the FP4 E2M1 value grid;
    bit-identical to qmath.cast_to_fp4_grid (same table, vectorized as
    comparison counts since Pallas has no gather)."""
    ax = jnp.clip(jnp.abs(y), 0.0, 6.0)
    lo = sum((ax > b).astype(jnp.int32) for b in _FP4_BOUNDS)
    hi = sum((ax >= b).astype(jnp.int32) for b in _FP4_BOUNDS)
    k = jnp.clip(lo, 0, 6)
    tie_up = sum(((k == i) & t) for i, t in enumerate(_FP4_TIE_UP))
    idx = jnp.where((lo != hi) & tie_up, hi, lo)
    idx = jnp.clip(idx, 0, 7)
    mag = sum(jnp.where(idx == i, jnp.float32(v), 0.0)
              for i, v in enumerate(_FP4_VALS))
    return jnp.sign(y) * mag


def _fp4_grid_round_sr(y, ubits):
    """Stochastic rounding onto the FP4 grid: same construction as
    qmath._stochastic_cast_fp4 (exactly unbiased between neighbours) but
    driven by the TPU PRNG (`ubits` uint32)."""
    ax = jnp.clip(jnp.abs(y), 0.0, 6.0)
    il = jnp.clip(
        sum((ax >= v).astype(jnp.int32) for v in _FP4_VALS) - 1, 0, 7)
    iu = jnp.clip(il + 1, 0, 7)
    lo = sum(jnp.where(il == i, jnp.float32(v), 0.0)
             for i, v in enumerate(_FP4_VALS))
    up = sum(jnp.where(iu == i, jnp.float32(v), 0.0)
             for i, v in enumerate(_FP4_VALS))
    p = jnp.where(up > lo, (ax - lo) / jnp.maximum(up - lo, _F32_TINY), 0.0)
    u = (ubits >> 8).astype(jnp.float32) * (2.0 ** -24)
    mag = jnp.where(u < p, up, lo)
    return jnp.sign(y) * mag


def _rht_rotate(v, rht_bd):
    """Apply the 16x16 RHT along the last axis of a 2D tile.

    On TPU: one block-diagonal (C, C) MXU matmul (Mosaic has no 2D->3D
    vector reshape). In interpret mode: the (., 16) @ (16, 16) form,
    whose f32 summation order bit-matches quantize/hadamard.apply_rht —
    the CPU bit-exactness tests rely on that (on real TPU the MXU's f32
    rounding differs from CPU regardless of form)."""
    if _interpret():
        r, c = v.shape
        rht16 = rht_bd[:16, :16]
        return jnp.matmul(v.reshape(r, c // 16, 16), rht16,
                          precision="highest").reshape(r, c)
    return jnp.matmul(v, rht_bd, precision="highest")


def _nvfp4_amax_kernel(rht_ref, x_ref, arow_ref, acol_ref, *, with_rht):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        arow_ref[0] = jnp.float32(0.0)
        acol_ref[0] = jnp.float32(0.0)

    x = x_ref[...].astype(jnp.float32)
    arow_ref[0] = jnp.maximum(arow_ref[0], jnp.max(jnp.abs(x)))
    if with_rht:
        rot = _rht_rotate(x.T, rht_ref[...])
        acol_ref[0] = jnp.maximum(acol_ref[0], jnp.max(jnp.abs(rot)))


def nvfp4_amax_2x(x2d: jax.Array, rht_matrix,
                  tile: Tuple[int, int]) -> Tuple[jax.Array, jax.Array]:
    """(amax(|x|), amax(|rht(x^T)|)) in one HBM read. Without RHT the
    second equals the first (transpose preserves amax)."""
    m, n = x2d.shape
    tm, tn = tile
    with_rht = rht_matrix is not None
    # Block-diagonal kron(I, rht) sized to the rotated axis (tm): the
    # in-kernel RHT is then one 2D MXU matmul (no 3D vector reshape).
    rht_in = jnp.kron(
        jnp.eye(tm // 16, dtype=jnp.float32),
        jnp.asarray(rht_matrix if with_rht else jnp.eye(16), jnp.float32))
    arow, acol = pl.pallas_call(
        functools.partial(_nvfp4_amax_kernel, with_rht=with_rht),
        grid=(m // tm, n // tn),
        in_specs=[pl.BlockSpec((tm, tm), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((1,), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)],
        interpret=_interpret(),
    )(rht_in, x2d)
    if not with_rht:
        acol = arow
    return arow[0], acol[0]


def _nvfp4_quantize_block(v, ts, key_bits):
    """Two-level NVFP4 quantize of a 2D tile along (1,16) blocks given
    the per-tensor scale ``ts``; mirrors qmath.nvfp4_quantize.encode.
    Blocks are walked with static lane slices (Mosaic has no 2D->3D
    vector reshape). Returns (payload (R,C), scales (R, C//16) f32 —
    values already on the E4M3 grid)."""
    r, c = v.shape
    ys, ss = [], []
    for ib in range(c // 16):
        p = v[:, ib * 16:(ib + 1) * 16]
        bamax = jnp.max(jnp.abs(p), axis=1, keepdims=True)      # (R, 1)
        s_dec = bamax / 6.0
        s_e4m3 = jnp.clip(s_dec / ts, -448.0, 448.0).astype(float8_e4m3)
        s_eff = s_e4m3.astype(jnp.float32) * ts
        inv = jnp.where(s_eff > 0, 1.0 / jnp.maximum(s_eff, _F32_TINY),
                        0.0)
        ys.append(p * inv)
        ss.append(s_e4m3.astype(jnp.float32))
    y = jnp.concatenate(ys, axis=1)
    if key_bits is None:
        data = _fp4_grid_round(y)
    else:
        data = _fp4_grid_round_sr(y, key_bits)
    return data.astype(FP4_STORAGE_DTYPE), jnp.concatenate(ss, axis=1)


def _nvfp4_cast_kernel(ts_ref, seed_ref, rht_ref, x_ref, row_ref, srow_ref,
                       col_ref, scol_ref, *, with_rht, stochastic):
    i, j = pl.program_id(0), pl.program_id(1)
    x = x_ref[...].astype(jnp.float32)
    if stochastic:
        pltpu.prng_seed(seed_ref[0], i, j)
        rb = pltpu.prng_random_bits(x.shape).astype(jnp.uint32)
        cb = pltpu.prng_random_bits((x.shape[1], x.shape[0])).astype(jnp.uint32)
    else:
        rb = cb = None
    # Scale grids leave the kernel TRANSPOSED as f32 — a (tm, tn//16)
    # fp8 block has a 16-lane minor dim (Mosaic needs 128-multiples);
    # the transposed f32 block (tn//16, tm) tiles natively. The caller
    # transposes back and re-narrows to E4M3 (exact: values are already
    # on the E4M3 grid).
    row, srow = _nvfp4_quantize_block(x, ts_ref[0], rb)
    row_ref[...] = row
    srow_ref[...] = srow.T
    xt = x.T
    if with_rht:
        xt = _rht_rotate(xt, rht_ref[...])
    col, scol = _nvfp4_quantize_block(xt, ts_ref[1], cb)
    col_ref[...] = col
    scol_ref[...] = scol.T


def nvfp4_quantize_2x(
    x2d: jax.Array,                      # (M, N), both multiples of 16
    ts_row: jax.Array,                   # () f32 per-tensor scale, rowwise
    ts_col: jax.Array,                   # () f32 per-tensor scale, colwise
    rht_matrix: Optional[jax.Array],     # (16,16) f32 or None
    *,
    seed: Optional[jax.Array] = None,    # uint32 () -> stochastic rounding
    tile: Tuple[int, int] = (256, 256),
):
    """Fused NVFP4 quantize: one read emits rowwise (M,N) + colwise
    RHT'd (N,M) payloads and both (.,/16) E4M3 block-scale grids.

    Deterministic rounding is bit-identical to qmath.nvfp4_quantize
    (tests enforce); stochastic rounding uses the in-kernel TPU PRNG
    (same unbiased construction, different stream — TPU only)."""
    m, n = x2d.shape
    tm, tn = tile
    assert m % tm == 0 and n % tn == 0 and tm % 16 == 0 and tn % 16 == 0, (
        x2d.shape, tile)
    ts = jnp.stack([jnp.asarray(ts_row, jnp.float32).reshape(()),
                    jnp.asarray(ts_col, jnp.float32).reshape(())])
    seed_arr = (jnp.zeros((1,), jnp.uint32) if seed is None
                else jnp.asarray(seed, jnp.uint32).reshape(1))
    with_rht = rht_matrix is not None
    rht_in = jnp.kron(
        jnp.eye(tm // 16, dtype=jnp.float32),
        jnp.asarray(rht_matrix if with_rht else jnp.eye(16), jnp.float32))
    row, srow, col, scol = pl.pallas_call(
        functools.partial(_nvfp4_cast_kernel, with_rht=with_rht,
                          stochastic=seed is not None),
        grid=(m // tm, n // tn),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tm), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // 16, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm // 16, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), FP4_STORAGE_DTYPE),
            jax.ShapeDtypeStruct((n // 16, m), jnp.float32),
            jax.ShapeDtypeStruct((n, m), FP4_STORAGE_DTYPE),
            jax.ShapeDtypeStruct((m // 16, n), jnp.float32),
        ],
        interpret=_interpret(),
    )(ts, seed_arr, rht_in, x2d)
    return (row, srow.T.astype(float8_e4m3),
            col, scol.T.astype(float8_e4m3))


def _mxfp8_norm_kernel(expand_n_ref, expand_m_ref, x_ref, gamma_ref,
                       beta_ref, row_ref, col_ref, srow_ref, scol_ref,
                       rsig_ref, mu_ref, *, q_dtype, emax_elem: int,
                       norm: str, zcg: bool, eps: float):
    x = x_ref[...].astype(jnp.float32)
    g = gamma_ref[...].astype(jnp.float32)
    if zcg:
        g = g + 1.0
    if norm == "layernorm":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        mu_ref[...] = mu
    else:
        xc = x
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    rsig_ref[...] = rsig
    y = xc * rsig * g
    if beta_ref is not None:
        y = y + beta_ref[...].astype(jnp.float32)
    # Chain parity: normalization_fwd rounds to the input dtype before
    # the quantizer reads the values.
    y = y.astype(x_ref.dtype).astype(jnp.float32)
    yt = y.T
    row, srow_t = _mxfp8_pair(y, yt, expand_n_ref[...], q_dtype, emax_elem)
    row_ref[...] = row
    srow_ref[...] = srow_t
    if col_ref is not None:
        col, scol_t = _mxfp8_pair(yt, y, expand_m_ref[...], q_dtype,
                                  emax_elem)
        col_ref[...] = col
        scol_ref[...] = scol_t


def mxfp8_norm_quantize_2x(
    x2d: jax.Array,             # (M, H); H = normalized axis
    gamma: jax.Array,           # (H,)
    beta: Optional[jax.Array],  # (H,) or None
    q_dtype=float8_e4m3,
    *,
    norm: str = "rmsnorm",
    zero_centered_gamma: bool = False,
    epsilon: float = 1e-6,
    rowwise_only: bool = False,
):
    """Fused normalization + MXFP8 quantize: one HBM read of ``x``
    yields the payload(s), E8M0 scale grid(s), and the norm residuals —
    the normalized bf16 intermediate never round-trips HBM between the
    XLA norm and the Pallas quantize (reference: common/normalization/
    FP8-output fusion + cast_transpose_fusion). Bit-identical to
    normalization.*_fwd -> mxfp8_quantize_2x / _1x.
    Returns (row, col, srow, scol, rsigma (M,1)[, mu (M,1)]); with
    ``rowwise_only`` col/scol are None (the inference primal's
    single-orientation path)."""
    m, h = x2d.shape
    assert m % 32 == 0 and h % 32 == 0, x2d.shape
    # Full-width tiles (LN needs whole rows); three f32 stripe-sized
    # temporaries (x, y, yt) + the H-wide expander bound VMEM.
    tm = 256
    while tm > 32 and (3 * tm * h * 4 + (h // 32) * h * 4 > 10 * 2 ** 20
                       or m % tm):
        tm //= 2
    assert m % tm == 0, (m, tm)
    emax = 8  # e4m3
    expand_n = _expand_mat(h // 32)
    expand_m = _expand_mat(tm // 32)
    ln = norm == "layernorm"
    with_beta = beta is not None

    def kern(en_ref, em_ref, x_ref, gamma_ref, *rest):
        if with_beta:
            beta_ref, *outs = rest
        else:
            beta_ref, outs = None, list(rest)
        if rowwise_only:
            row_ref, srow_ref, rsig_ref = outs[:3]
            col_ref = scol_ref = None
            mu_ref = outs[3] if ln else None
        else:
            row_ref, col_ref, srow_ref, scol_ref, rsig_ref = outs[:5]
            mu_ref = outs[5] if ln else None
        _mxfp8_norm_kernel(
            en_ref, em_ref, x_ref, gamma_ref, beta_ref, row_ref, col_ref,
            srow_ref, scol_ref, rsig_ref, mu_ref,
            q_dtype=q_dtype, emax_elem=emax, norm=norm,
            zcg=zero_centered_gamma, eps=epsilon)

    in_specs = [
        pl.BlockSpec(expand_n.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(expand_m.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [expand_n, expand_m, x2d, gamma.reshape(1, h)]
    if with_beta:
        in_specs.append(pl.BlockSpec((1, h), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(beta.reshape(1, h))
    out_specs = [
        pl.BlockSpec((tm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((m, h), q_dtype)]
    if not rowwise_only:
        out_specs.append(pl.BlockSpec((h, tm), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((h, m), q_dtype))
    out_specs.append(pl.BlockSpec((h // 32, tm), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((h // 32, m), jnp.int32))
    if not rowwise_only:
        out_specs.append(pl.BlockSpec((tm // 32, h), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m // 32, h), jnp.int32))
    out_specs.append(pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((m, 1), jnp.float32))
    if ln:
        out_specs.append(pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m, 1), jnp.float32))
    outs = pl.pallas_call(
        kern, grid=(m // tm,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=_interpret())(*args)
    if rowwise_only:
        row, srow = outs[0], outs[1]
        return (row, None, srow.T.astype(jnp.uint8), None) + tuple(outs[2:])
    row, col, srow, scol = outs[0], outs[1], outs[2], outs[3]
    return ((row, col, srow.T.astype(jnp.uint8), scol.T.astype(jnp.uint8))
            + tuple(outs[4:]))


def _mxfp8_qdq_kernel(expand_ref, x_ref, nn_ref, tn_ref, *, q_dtype,
                      emax_elem: int):
    """MXFP8 quantize-dequantize + transpose in one pass: the r5 MoE
    profile showed the plain (non-microbatch) grouped step burning
    ~32.5 ms/step in XLA-materialized stages (swap copies 13, quantize
    7.8, dequant mul 6.3, convert 3.5, broadcast 1.9) to produce the
    two bf16 QDQ orientations the GEMMs actually consume. One tile
    read yields both. Quantization blocks run along K (the sublane
    axis of the (K, M) input tile), matching the rowwise quantize of
    the swapped (M, K) view bit-exactly; the pow2 dequant multiply is
    exact in bf16."""
    import os
    x = x_ref[0].astype(jnp.float32)            # (tk, tm) — K x M
    q_max = dtype_max(q_dtype)
    tk, tm = x.shape
    es = []
    for ib in range(tk // 32):
        pt = x[ib * 32:(ib + 1) * 32, :]
        amax_t = jnp.max(jnp.abs(pt), axis=0, keepdims=True)   # (1, tm)
        es.append(_e8m0_exp(amax_t, emax_elem))
    e_t = jnp.concatenate(es, axis=0)                          # (tk//32, tm)
    if os.environ.get("TE_TPU_QDQ_VARIANT", "sublane") == "lanes":
        # Original formulation: transpose x to put K on lanes, expand
        # scales by MXU stretch, transpose the result back for nn —
        # two transposes (one f32, one bf16).
        s_inv = jax.lax.dot_general(
            jnp.exp2(-e_t.astype(jnp.float32)).T, expand_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (tm, tk)
        s_deq = jax.lax.dot_general(
            jnp.exp2(e_t.astype(jnp.float32)).T, expand_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = jnp.clip(x.T * s_inv, -q_max, q_max).astype(q_dtype)
        qdq_t = (y.astype(jnp.float32) * s_deq).astype(jnp.bfloat16)
        tn_ref[0] = qdq_t
        nn_ref[0] = qdq_t.T
        return
    # Default: quantize in the input orientation (K blocks on SUBLANES)
    # with free row-regroup view broadcasts, one bf16 transpose for tn.
    # (A full-bf16-domain variant — exact for pow2 scales — measured
    # 8.69 vs 8.32 ms: the VPU does not double-rate bf16 chains here.)
    s_inv = jnp.exp2(-e_t.astype(jnp.float32))[:, None, :]     # (tk/32,1,tm)
    s_deq = jnp.exp2(e_t.astype(jnp.float32))[:, None, :]
    x3 = x.reshape(tk // 32, 32, tm)
    y = jnp.clip(x3 * s_inv, -q_max, q_max).astype(q_dtype)
    qdq = (y.astype(jnp.float32) * s_deq).astype(jnp.bfloat16)
    qdq = qdq.reshape(tk, tm)
    nn_ref[0] = qdq
    tn_ref[0] = qdq.T


def mxfp8_qdq_2x_grouped(kernel_ekm: jax.Array, q_dtype=float8_e4m3):
    """(E, K, M) expert kernels -> BOTH QDQ'd bf16 GEMM orientations
    (nn (E, K, M), tn (E, M, K)) in ONE HBM pass, bit-identical to
    quantize(swapaxes(k)) -> dequantize -> swapaxes (reference weight
    workspace semantics, pytorch/module/base.py:744). Returns None when
    shapes are unaligned."""
    import os
    e, k, m = kernel_ekm.shape
    env_t = os.environ.get("TE_TPU_QDQ_TILE")     # "tk,tm" sweep knob
    # r5 sweep (clean micro, sublane variant): 512,512 = 8.32 ms /
    # 339 GB/s on the (8,4096,14336) stack vs 10.78 for the first-cut
    # lanes variant at 256,256.
    tk0, tm0 = (map(int, env_t.split(","))) if env_t else (512, 512)
    tk, tm = tk0, tm0
    while tk > 32 and k % tk:
        tk //= 2
    while tm > 128 and m % tm:
        tm //= 2
    if k % tk or m % tm or tk % 32:
        return None
    expand = _expand_mat(tk // 32)
    nn, tn = pl.pallas_call(
        functools.partial(_mxfp8_qdq_kernel, q_dtype=q_dtype, emax_elem=8),
        grid=(e, k // tk, m // tm),
        in_specs=[
            pl.BlockSpec(expand.shape, lambda ei, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, tm), lambda ei, i, j: (ei, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tk, tm), lambda ei, i, j: (ei, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, tk), lambda ei, i, j: (ei, j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e, k, m), jnp.bfloat16),
            jax.ShapeDtypeStruct((e, m, k), jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(expand, kernel_ekm)
    return nn, tn


def _mxfp8_1x_kernel(expand_ref, x_ref, out_ref, s_ref, *, q_dtype,
                     emax_elem: int, colwise: bool):
    x = x_ref[...].astype(jnp.float32)
    xt = x.T
    if colwise:
        col, scol_t = _mxfp8_pair(xt, x, expand_ref[...], q_dtype,
                                  emax_elem)
        out_ref[...] = col
        s_ref[...] = scol_t
    else:
        row, srow_t = _mxfp8_pair(x, xt, expand_ref[...], q_dtype,
                                  emax_elem)
        out_ref[...] = row
        s_ref[...] = srow_t


def mxfp8_quantize_1x(
    x2d: jax.Array,             # (M, N), M and N multiples of 32
    q_dtype=float8_e4m3,
    *,
    colwise: bool = False,
    tile: Tuple[int, int] = (256, 256),
):
    """Fused single-orientation MXFP8 quantize. The colwise variant
    transposes IN VMEM (the input is the untransposed (M, N) array), so
    no bf16 transpose is ever materialized in HBM — the win over the
    generic qmath path, which quantizes an HBM-materialized x.T.
    Bit-matches the corresponding half of :func:`mxfp8_quantize_2x`."""
    m, n = x2d.shape
    assert m % 32 == 0 and n % 32 == 0, x2d.shape
    tm = min(tile[0], m)
    tn = min(tile[1], n)
    assert m % tm == 0 and n % tn == 0, (x2d.shape, (tm, tn))
    grid = (m // tm, n // tn)
    emax = 8  # e4m3
    if colwise:
        out_specs = [
            pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm // 32, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n, m), q_dtype),
            jax.ShapeDtypeStruct((m // 32, n), jnp.int32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // 32, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((m, n), q_dtype),
            jax.ShapeDtypeStruct((n // 32, m), jnp.int32),
        ]
    # The colwise payload's scaled axis is M: its expand matrix
    # stretches tm//32 blocks.
    expand = _expand_mat((tm if colwise else tn) // 32)
    data, s_t = pl.pallas_call(
        functools.partial(_mxfp8_1x_kernel, q_dtype=q_dtype, emax_elem=emax,
                          colwise=colwise),
        grid=grid,
        in_specs=[
            pl.BlockSpec(expand.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(expand, x2d)
    return data, s_t.T.astype(jnp.uint8)


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
    expand_n = _expand_mat(tn // 32)
    expand_m = _expand_mat(tm // 32)
    row, col, srow, scol = pl.pallas_call(
        functools.partial(_mxfp8_kernel, q_dtype=q_dtype, emax_elem=emax),
        grid=grid,
        in_specs=[
            pl.BlockSpec(expand_n.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(expand_m.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // 32, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm // 32, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), q_dtype),
            jax.ShapeDtypeStruct((n, m), q_dtype),
            jax.ShapeDtypeStruct((n // 32, m), jnp.int32),
            jax.ShapeDtypeStruct((m // 32, n), jnp.int32),
        ],
        interpret=_interpret(),
    )(expand_n, expand_m, x2d)
    return (row, col,
            srow.T.astype(jnp.uint8), scol.T.astype(jnp.uint8))
