"""Pallas TPU flash attention (forward + backward).

The TPU-native replacement for the reference's cuDNN fused attention
(reference: common/fused_attn/fused_attn_f16_arbitrary_seqlen.cu and
pytorch FlashAttention backend). Online-softmax tiling over KV blocks
with f32 accumulators in VMEM; causal/padding/sliding-window masking is
evaluated per block from positions and segment ids so no (Sq, Skv) mask
is ever materialized, and fully-masked blocks are skipped.

Layout: kernels operate on (B, H, S, D). GQA is supported by mapping
query head h to kv head h // group in the BlockSpec index maps.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.pytree import Static

# Swept on v5e prefill (B4/S2048/H32/GQA8/D128, causal), bf16 MXU operands:
#   r1 f32 kernel: (512,1024) 69.3 TF/s; r2 enumerated-grid + 8-lane LSE:
#   (eff 256,2048) 97-111 TF/s in the same tunnel window ((256,1024) 75-86).
#   NOTE the axon tunnel's sustained throughput drifts ~2.5x across tens of
#   minutes — only compare configs benchmarked back-to-back.
DEFAULT_BLOCK_Q = 512
# Swept on v5e causal prefill (scripts/profile_flash_blocks.py, one
# window): bk=1024 beats 2048 by 1.55x — with block_k == S every q row
# computes scores against ALL keys and masks half away (2x wasted MXU),
# while bk<=512 drowns in the ~4us/grid-step floor (2.46/1.59/1.81/4.54
# ms for bk 2048/1024/512/256 at B4 S2048 H32 GQA4).
DEFAULT_BLOCK_K = 1024
# Inner sub-tile width for the fwd online-softmax loop. Swept on v5e
# (scripts/profile_flash_inner.py): sub-tiling LOSES — Mosaic does not
# overlap MXU and VPU across the unrolled sub-tiles, so smaller tiles
# only add per-sub-tile m/l/acc overhead (pct_of_gemm 33/27/25/21 for
# off/1024/512/256). Default off; kept as a knob for future compilers.
INNER_K = int(os.environ.get("TE_TPU_FLASH_INNER_K", "1000000"))
# Packed-rows cap (group * block_q); see _effective_blocks.
MAX_ROWS = int(os.environ.get("TE_TPU_FLASH_MAX_ROWS", "1024"))
# Sub-tile width for masked-edge skipping in the enumerated-steps
# kernels: partially-masked (diagonal) blocks compute only the
# reachable SPLIT_SUB-wide k sub-tiles (fwd: one full-width softmax
# update, per-sub-tile guarded MXU+VPU; bwd: independent guarded
# sub-tiles), removing most causal over-compute at block_k=1024 without
# shrinking the grid. 0 disables. This differs from INNER_K sub-tiling
# (which repeated the m/l/acc chain per sub-tile on EVERY block and
# lost); here full blocks stay monolithic. Swept on v5e (scripts/
# prof_flash_split.py, same-trace device-lane): 512 beats 256 (guard
# overhead) and 0 — fwd 1.904->1.796 ms/call, bwd 4.594->4.317 at
# bq512/bk1024 B4/S2048/H32/GQA4; bwd bk2048 5.70->5.16 ms.
SPLIT_SUB = int(os.environ.get("TE_TPU_FLASH_SPLIT_SUB", "512"))
# Route FULL blocks through the two-pass split body as well (see
# _fwd_kernel_steps) — experimental MXU/VPU pipelining knob.
ALLSPLIT = os.environ.get("TE_TPU_FLASH_ALLSPLIT", "0") == "1"


def _split_width(block_k: int) -> int:
    """Sub-tile width for masked-edge skipping; 0 when disabled or the
    block is too small to split."""
    if SPLIT_SUB <= 0 or block_k <= SPLIT_SUB or block_k % SPLIT_SUB != 0:
        return 0
    return SPLIT_SUB

# Kernel ablation knobs for perf archaeology (scripts/profile_flash_
# ablate.py): static Python flags consulted at trace time, NEVER set in
# production. Members: "nomask", "nomax", "noexp", "nopv".
ABLATE: frozenset = frozenset()
# m/lse floor. Masked scores are filled with MASKED (< NEG_INF) so that
# exp(MASKED - m) underflows to exactly 0 even for all-masked rows where
# m stays at the NEG_INF floor — no post-exp `where` rescue needed.
NEG_INF = -1e30
MASKED = -2e30
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def dtype_max_of(dtype) -> float:
    """Saturation bound for the fp8 O epilogue (fp8_mha)."""
    from ..quantize.dtypes import dtype_max
    return float(dtype_max(dtype))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _effective_blocks(sq: int, skv: int, group: int,
                      block_q: int, block_k: int) -> Tuple[int, int]:
    """Block sizes actually used by the kernels. Must be computed
    identically by the BSHD wrapper (for padding) and the kernel
    builders. Packed rows (group*block_q) are capped at MAX_ROWS
    (default 1024: keeps the working set inside the 16 MB scoped-vmem
    default; raising it amortizes the ~4us/grid-step floor over more
    MXU work per step but needs a raised vmem limit at block_k >= 1024
    — sweep via TE_TPU_FLASH_MAX_ROWS)."""
    block_q = min(block_q, _ceil_to(sq, 8), max(8, MAX_ROWS // max(group, 1)))
    block_k = min(block_k, _ceil_to(skv, 8))
    return block_q, block_k


def _win_active(window) -> Tuple[bool, bool]:
    """Static activity of each sliding-window side. A side is active
    when it is a non-negative Python int, or a traced value (ring CP
    passes traced per-chunk window bounds under striped layout)."""
    return tuple((not isinstance(w, (int, np.integer))) or w >= 0
                 for w in window)


def _win_dynamic(window) -> bool:
    """True when any window side is a traced value rather than a static
    int — the kernels then read the bounds from the scalar-prefetch
    operand instead of baking them into the code."""
    return any(not isinstance(w, (int, np.integer)) for w in window)


def _positions(q_start, k_start, off, rows, block_k, group, block_q):
    """(qpos, kpos) int32 grids of shape (rows, block_k) for the packed
    score block (row r of the packed block is query position
    q_start + off + (r % block_q))."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0)
    if group > 1:
        row = jax.lax.rem(row, block_q)
    qpos = q_start + off + row
    kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)
    return qpos, kpos


def _mod_args(q_start, k_start, off, group, block_q, block_k, prog_bh):
    """(b, h, qpos, kpos) arguments for a score_mod traced into the
    kernel body. h varies along packed rows: row r belongs to query head
    hkv*group + r // block_q. ``prog_bh`` is (program_id(0),
    program_id(1)) computed at kernel top level (program_id inside a
    pl.when body has no interpret-mode lowering)."""
    rows = group * block_q
    qpos, kpos = _positions(q_start, k_start, off, rows, block_k, group,
                            block_q)
    bidx, hk = prog_bh
    hrow = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // block_q
    hidx = hk * group + hrow
    return bidx, hidx, qpos, kpos


def _mask_scores(s, qseg, kseg, q_start, k_start, off, *,
                 causal, window, use_segments, group, block_q, block_k,
                 window_active=None):
    """Fill masked score entries with MASKED, unconditionally on every
    run block. (Profiled on v5e: the iota/compare/select chain costs ~4%
    of block time; gating it behind a scalar `lax.cond` costs ~60%
    because Mosaic evaluates both branches through VMEM — never use a
    vector-valued cond here.)

    With GQA group packing (group > 1) the score block stacks the
    `group` query heads sharing one KV head: row r of the packed block
    is query position q_start + (r % block_q)."""
    wa = window_active if window_active is not None else _win_active(window)
    any_mask = causal or wa[0] or wa[1] or use_segments
    if not any_mask:
        return s
    rows = group * block_q

    def _and(a, b):
        return b if a is None else jnp.logical_and(a, b)

    # Broadcast-form positions: a (rows, 1) column of query positions
    # and a (1, block_k) row of key positions; the compares broadcast on
    # the VPU. (XProf-identical to full (rows, block_k) position grids —
    # Mosaic canonicalizes both — and slightly faster than a float-
    # penalty arithmetic form; the knob sweep lives in r3 history.)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    if group > 1:
        row = jax.lax.rem(row, block_q)
    qpos = q_start + off + row                                # (rows, 1)
    kpos = k_start + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1)                           # (1, block_k)
    mask = None
    if causal:
        mask = _and(mask, kpos <= qpos)
    if wa[0]:
        mask = _and(mask, kpos >= qpos - window[0])
    if wa[1]:
        mask = _and(mask, kpos <= qpos + window[1])
    if use_segments:
        qs = qseg   # (block_q, 1), sublane rows (pre-sliced value)
        ks = kseg   # (1, block_k), lanes (pre-sliced value)
        segm = jnp.logical_and(qs == ks, qs != 0)   # (block_q, block_k)
        if group > 1:
            segm = jax.lax.broadcast_in_dim(
                segm, (group, block_q, block_k), (1, 2)).reshape(
                    rows, block_k)
        mask = _and(mask, segm)
    return jnp.where(mask, s, MASKED)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _dropout_keep(seed_ref, q_start, k_start, rows, block_k, rate,
                  prog_bh):
    """Regenerate the per-block dropout keep-mask. Seeded by (user seed,
    batch, kv-head, block coords) so the fwd and both bwd kernels derive
    the SAME bits for a block without storing the O(S^2) mask (same idea
    as cuDNN's philox offset replay; reference fused-attn dropout).

    Off-TPU (interpret mode) the TPU PRNG has no lowering, so a
    splitmix-style integer hash stands in — different stream than the
    hardware PRNG but identically replayed across fwd/bwd."""
    # prog_bh is passed down from the kernel top level: pl.program_id
    # has no interpret-mode lowering inside a pl.when body, and the
    # nomask fast path runs block bodies under pl.when.
    if not _interpret():
        pltpu.prng_seed(seed_ref[0], seed_ref[1], prog_bh[0],
                        prog_bh[1], q_start, k_start)
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows, block_k)),
                             jnp.uint32)
    else:
        u32 = lambda x: jnp.asarray(x).astype(jnp.uint32)
        x = (jax.lax.broadcasted_iota(jnp.uint32, (rows, block_k), 0)
             * np.uint32(0x9E3779B9)
             ^ jax.lax.broadcasted_iota(jnp.uint32, (rows, block_k), 1)
             * np.uint32(0x85EBCA6B))
        x = x ^ (u32(seed_ref[0]) * np.uint32(0xC2B2AE35)
                 + u32(seed_ref[1])
                 + u32(prog_bh[0]) * np.uint32(0x27D4EB2F)
                 + u32(prog_bh[1]) * np.uint32(0x165667B1)
                 + u32(q_start) * np.uint32(0x9E3779B1)
                 + u32(k_start) * np.uint32(0x85EBCA77))
        x = x ^ (x >> 16)
        x = x * np.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * np.uint32(0x846CA68B)
        bits = x ^ (x >> 16)
    thr = np.uint32(min(4294967295, int(round(rate * 4294967296.0))))
    return bits >= thr


def _fwd_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref, k_ref,
                    v_ref, bias_ref, acc_ref, m_ref, l_ref,
                    q_start, k_start, off, *,
                    causal, use_segments, use_bias, window, group,
                    block_q, block_k, fp8, dropout_rate=0.0,
                    score_mod=None, scale=1.0, prog_bh=None,
                    window_active=None):
    """One online-softmax update for a (packed-q, k) block pair. Shared
    by the dense-grid kernel and the enumerated-steps kernel.

    The block is processed in block_k/INNER_K unrolled sub-tiles: the
    QK^T and PV matmuls of sub-tile j+1 are independent of sub-tile j's
    softmax chain, so Mosaic's scheduler overlaps MXU and VPU work
    across sub-tiles. One monolithic (rows, block_k) tile serializes
    them — QK^T, then the whole softmax, then PV — and measured ~40% of
    same-window GEMM throughput; the two-level tiling is the same
    structure as jax.experimental.pallas.ops.tpu.flash_attention's
    block_k_major/block_k split.

    ``fp8``: q/k/v refs hold FP8 payloads of per-tensor-scaled tensors
    (reference: common/fused_attn/fused_attn_fp8.cu). The dequant scales
    are folded into one score multiplier scales_ref[0] =
    scale*LOG2E*sq_inv*sk_inv applied before masking, and V's sv_inv is
    applied once at write-out (linear in the accumulator). The MXU takes
    the fp8 payloads directly — the v5e lowering converts in-flight
    (measured faster than a materialized astype, see CLAUDE.md)."""
    rows = group * block_q
    d = q_ref.shape[-1]
    # MXU matmuls run on the native (bf16) operands — an f32 upcast
    # here costs >2x MXU throughput (r1 kernel measured 69 TF/s).
    # The softmax scale (and the nat->log2 conversion) is folded into
    # q OUTSIDE the kernel, so scores are already in the exp2 domain:
    # one VPU pass per score element saved vs `s * scale` + exp().
    q = q_ref[0].reshape(rows, d)
    k_full = k_ref[0, 0]
    v_full = v_ref[0, 0]
    # Dropout bits are generated per (q_start, k_start, block_k) block —
    # sub-tiling would change the replayed stream, so it stays single-
    # tile (fwd and bwd must derive identical bits for a block).
    if (dropout_rate > 0.0 or block_k % INNER_K != 0
            or INNER_K >= block_k):
        n_sub, ik_w = 1, block_k
    else:
        n_sub, ik_w = block_k // INNER_K, INNER_K
    if use_segments:
        qs_val = qseg_ref[0, :, :1]        # (block_q, 1), sublane rows
        ks_full = kseg_ref[0, :1, :]       # (1, block_k), lanes
    else:
        qs_val = ks_full = None
    if use_bias:
        bias_full = bias_ref[0].reshape(rows, block_k)

    for j in range(n_sub):
        ks = k_start + j * ik_w
        k = k_full if n_sub == 1 else k_full[j * ik_w:(j + 1) * ik_w, :]
        v = v_full if n_sub == 1 else v_full[j * ik_w:(j + 1) * ik_w, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fp8:
            s = s * scales_ref[0]
        if score_mod is not None:
            # score-mod path: q is NOT pre-scaled, scores stay in the
            # natural domain for the user mod, then convert to exp2
            # (reference flex-attention: score_mod in the kernel).
            bi, hi, qpos, kpos = _mod_args(q_start, ks, off, group,
                                           block_q, ik_w, prog_bh)
            s = score_mod(s * scale, bi, hi, qpos, kpos) * LOG2E
        if use_bias:
            bias = (bias_full if n_sub == 1
                    else bias_full[:, j * ik_w:(j + 1) * ik_w])
            s = s + bias.astype(jnp.float32) * LOG2E
        kseg_val = None
        if use_segments:
            kseg_val = (ks_full if n_sub == 1
                        else ks_full[:, j * ik_w:(j + 1) * ik_w])
        if "nomask" not in ABLATE:
            s = _mask_scores(s, qs_val, kseg_val, q_start, ks, off,
                             causal=causal, window=window,
                             use_segments=use_segments,
                             group=group, block_q=block_q, block_k=ik_w,
                             window_active=window_active)

        m_prev = m_ref[...]
        if "nomax" in ABLATE:
            m_new = jnp.zeros_like(m_prev)
            alpha = jnp.ones_like(m_prev)
        else:
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev,
                                jnp.broadcast_to(m_cur, m_prev.shape))
            alpha = jnp.exp2(m_prev - m_new)
        p = (s - m_new[:, :1] if "noexp" in ABLATE
             else jnp.exp2(s - m_new[:, :1]))

        l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        m_ref[...] = m_new
        if dropout_rate > 0.0:
            # l uses the undropped p (softmax denominator); only the PV
            # contraction sees the dropped/rescaled weights.
            keep = _dropout_keep(seed_ref, q_start, k_start, rows, block_k,
                                 dropout_rate, prog_bh)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        if "nopv" in ABLATE:
            acc_ref[...] = acc_ref[...] * alpha[:, :1]
            continue
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16 if fp8 else v.dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv


def _fwd_block_body_split(scales_ref, qseg_ref, kseg_ref, q_ref, k_ref,
                          v_ref, bias_ref, acc_ref, m_ref, l_ref,
                          s_scr, mloc_ref, lo, hi, q_start, k_start, off, *,
                          causal, use_segments, use_bias, window, group,
                          block_q, block_k, fp8, sub_w, nsub,
                          window_active=None):
    """Masked-edge-skipping variant of the fwd online-softmax update for
    a partially reachable (packed-q, k) block pair. Only the sub-tiles
    in [lo, hi) (from the enumerated-steps table) run QK^T / exp2 / PV;
    the m/l/acc rescale happens ONCE per block over full width, so the
    per-sub-tile fixed cost that sank INNER_K sub-tiling never appears.
    Scores round-trip through the ``s_scr`` VMEM scratch between the
    max pass and the exp/PV pass."""
    rows = group * block_q
    d = q_ref.shape[-1]
    q = q_ref[0].reshape(rows, d)
    k_full = k_ref[0, 0]
    v_full = v_ref[0, 0]
    if use_segments:
        qs_val = qseg_ref[0, :, :1]
        ks_full = kseg_ref[0, :1, :]
    else:
        qs_val = ks_full = None
    if use_bias:
        bias_full = bias_ref[0].reshape(rows, block_k)
    mloc_ref[...] = jnp.full_like(mloc_ref, NEG_INF)
    for j in range(nsub):
        @pl.when(jnp.logical_and(lo <= j, j < hi))
        def _score(j=j):
            sub = slice(j * sub_w, (j + 1) * sub_w)
            s = jax.lax.dot_general(
                q, k_full[sub, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if fp8:
                s = s * scales_ref[0]
            if use_bias:
                s = s + bias_full[:, sub].astype(jnp.float32) * LOG2E
            kseg_val = ks_full[:, sub] if use_segments else None
            s = _mask_scores(s, qs_val, kseg_val, q_start,
                             k_start + j * sub_w, off,
                             causal=causal, window=window,
                             use_segments=use_segments, group=group,
                             block_q=block_q, block_k=sub_w,
                             window_active=window_active)
            s_scr[:, sub] = s
            mloc_ref[...] = jnp.maximum(
                mloc_ref[...],
                jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True),
                                 mloc_ref.shape))
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, mloc_ref[...])
    alpha = jnp.exp2(m_prev - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * alpha
    acc_ref[...] = acc_ref[...] * alpha[:, :1]
    for j in range(nsub):
        @pl.when(jnp.logical_and(lo <= j, j < hi))
        def _pv(j=j):
            sub = slice(j * sub_w, (j + 1) * sub_w)
            p = jnp.exp2(s_scr[:, sub] - m_new[:, :1])
            l_ref[...] = l_ref[...] + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
            acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
                p.astype(jnp.bfloat16 if fp8 else v_full.dtype),
                v_full[sub, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _fwd_write_out(scales_ref, sink_ref, o_ref, lse_ref, acc_ref, m_ref,
                   l_ref, group, block_q, fp8, use_sink=False,
                   fp8_out=False):
    rows = group * block_q
    l = l_ref[..., :1]
    d = o_ref.shape[-1]
    acc = acc_ref[...]
    if fp8:
        acc = acc * scales_ref[1]       # V's sv_inv, linear in acc
    m = m_ref[..., :1]          # log2-domain running max
    if use_sink:
        # Softmax sink (off-by-one / learnable; reference: fused_attn.h
        # NVTE_Softmax_Type): one virtual key with per-head logit s0 and
        # no value joins the denominator at the epilogue. sink_ref holds
        # s0*LOG2E per (group) head, broadcast along lanes.
        s0 = sink_ref[0][:, :1]                      # (group, 1)
        s0 = jax.lax.broadcast_in_dim(
            s0, (group, block_q, 1), (0, 2)).reshape(rows, 1)
        m2 = jnp.maximum(m, s0)
        alpha = jnp.exp2(m - m2)    # 0 for fully-masked rows (m at floor)
        l2 = l * alpha + jnp.exp2(s0 - m2)           # >= exp2(s0-m2) > 0
        o_true = (acc * alpha) / l2
        lse = m2 * LN2 + jnp.log(l2)
    else:
        l_safe = jnp.where(l > 0, l, 1.0)
        o_true = acc / l_safe
        lse = jnp.where(l > 0, m * LN2 + jnp.log(l_safe), NEG_INF)
    if fp8_out:
        # fp8_mha epilogue (reference: fused_attn_fp8.cu O quantize):
        # cast O to fp8 with the pre-known delayed scale in scales_ref[2]
        # and report the pre-quantization block amax through the spare
        # lse lanes (lanes 4:8; lse itself is one value per row).
        fmax = dtype_max_of(o_ref.dtype)
        o_w = jnp.clip(o_true * scales_ref[2], -fmax, fmax)
        oamax = jnp.max(jnp.abs(o_true))
        lse_out = jnp.concatenate(
            [jnp.broadcast_to(lse, (rows, 4)),
             jnp.full((rows, 4), oamax, jnp.float32)], axis=1)
    else:
        o_w = o_true
        # 8 lanes, not 128: lse is one value per row; a 128-lane
        # broadcast writes 16x the HBM bytes for nothing.
        lse_out = jnp.broadcast_to(lse, (rows, 8))
    o_ref[0] = o_w.astype(o_ref.dtype).reshape(group, block_q, d)
    lse_ref[0] = lse_out.reshape(group, block_q, 8)


def _fwd_kernel(qoff_ref, scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref,
                k_ref, v_ref,
                bias_ref, sink_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *,
                causal: bool, use_segments: bool,
                use_bias: bool, fp8: bool, dropout_rate: float,
                window: Tuple[int, int], offset: int,
                group: int, block_q: int, block_k: int, num_k_blocks: int,
                score_mod=None, scale=1.0, dynamic_window: bool = False,
                use_sink: bool = False, fp8_out: bool = False):
    """Grid (b, hkv, nq, nk). The `group` query heads sharing KV head hkv
    are stacked into one (group*block_q, d) operand so each K/V block is
    DMA'd and matmul'd once per group instead of once per query head
    (measured +15% on v5e GQA-4 prefill, and it quadruples the MXU work
    per K/V byte moved).

    ``dynamic_window``: window bounds are runtime scalars riding the
    qoff SMEM operand (qoff_ref[1]/[2]) rather than compile-time ints —
    used by striped ring CP, whose per-chunk local bounds depend on the
    traced rank index (reference cpp_extensions/attention.py:2991
    sliding-window CP adjustment)."""
    iq, ik = pl.program_id(2), pl.program_id(3)
    prog_bh = (pl.program_id(0), pl.program_id(1))
    wa = _win_active(window)
    if dynamic_window:
        window = tuple(qoff_ref[1 + i] if wa[i] else -1 for i in range(2))

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q_start = iq * block_q
    k_start = ik * block_k
    off = offset + qoff_ref[0]
    # Block-level skip test (causal / sliding window reachability).
    run = jnp.full((), True)
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1 + off)
    if wa[0]:
        run = jnp.logical_and(
            run, k_start + block_k - 1 >= q_start + off - window[0])
    if wa[1] and not causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1 + off + window[1])

    @pl.when(run)
    def _body():
        _fwd_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref,
                        k_ref, v_ref,
                        bias_ref, acc_ref, m_ref, l_ref, q_start, k_start,
                        off,
                        causal=causal, use_segments=use_segments,
                        use_bias=use_bias, window=window, group=group,
                        block_q=block_q, block_k=block_k, fp8=fp8,
                        dropout_rate=dropout_rate,
                        score_mod=score_mod, scale=scale, prog_bh=prog_bh,
                        window_active=wa)

    @pl.when(ik == num_k_blocks - 1)
    def _epilogue():
        _fwd_write_out(scales_ref, sink_ref, o_ref, lse_ref, acc_ref,
                       m_ref, l_ref, group, block_q, fp8,
                       use_sink=use_sink, fp8_out=fp8_out)


def _fwd_kernel_steps(steps_ref, scales_ref, seed_ref, qseg_ref, kseg_ref,
                      q_ref,
                      k_ref, v_ref, bias_ref, sink_ref, o_ref, lse_ref,
                      acc_ref, m_ref, l_ref, *scratch,
                      causal: bool, use_segments: bool, use_bias: bool,
                      fp8: bool, dropout_rate: float,
                      window: Tuple[int, int], offset: int,
                      group: int, block_q: int, block_k: int,
                      score_mod=None, scale=1.0, use_sink: bool = False,
                      sub_w: int = 0, fp8_out: bool = False):
    """Enumerated-steps variant: grid (b, hkv, T) where step t maps to
    block pair (steps[0,t], steps[1,t]) — ONLY reachable blocks are
    enumerated (lower triangle for causal, band for sliding window), so
    the kernel body is branchless: no per-block run predicate, no wasted
    K/V DMA on skipped blocks. steps[2,t]/steps[3,t] flag the first/last
    step of each q row (same role as ik==0 / ik==nk-1 in the dense
    grid). Same trick as jax's SplashAttention data-dependent grids.

    With ``sub_w`` > 0 (masked-edge skipping), steps[4,t]/steps[5,t]
    bound the reachable sub-tiles: fully-reachable blocks take the
    monolithic body, partially-masked (diagonal) blocks the split body
    that computes only [lo, hi) sub-tiles."""
    t = pl.program_id(2)
    prog_bh = (pl.program_id(0), pl.program_id(1))
    iq = steps_ref[0, t]
    ik = steps_ref[1, t]

    @pl.when(steps_ref[2, t] == 1)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def _monolithic(nomask=False):
        _fwd_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref,
                        k_ref, v_ref,
                        bias_ref, acc_ref, m_ref, l_ref, iq * block_q,
                        ik * block_k, offset,
                        causal=causal and not nomask,
                        use_segments=use_segments,
                        use_bias=use_bias,
                        window=(-1, -1) if nomask else window,
                        group=group,
                        block_q=block_q, block_k=block_k, fp8=fp8,
                        dropout_rate=dropout_rate,
                        score_mod=score_mod, scale=scale, prog_bh=prog_bh)

    nm = steps_ref[6, t]
    use_nomask = not use_segments

    def _full_block():
        # nomask blocks skip the compare+select mask passes entirely
        # (statically specialized body; flags are mutually exclusive).
        if use_nomask:
            pl.when(nm == 1)(lambda: _monolithic(True))
            pl.when(nm == 0)(lambda: _monolithic(False))
        else:
            _monolithic(False)

    if sub_w:
        s_scr, mloc_ref = scratch
        nsub = block_k // sub_w
        lo = steps_ref[4, t]
        hi = steps_ref[5, t]
        def _partial_body():
            _fwd_block_body_split(
                scales_ref, qseg_ref, kseg_ref, q_ref, k_ref, v_ref,
                bias_ref, acc_ref, m_ref, l_ref, s_scr, mloc_ref, lo, hi,
                iq * block_q, ik * block_k, offset,
                causal=causal, use_segments=use_segments,
                use_bias=use_bias, window=window, group=group,
                block_q=block_q, block_k=block_k, fp8=fp8,
                sub_w=sub_w, nsub=nsub)

        if ALLSPLIT:
            # MEASURED NEGATIVE (v5e, scripts/prof_flash_allsplit.py):
            # routing full blocks through the two-pass split body loses
            # (67.1 vs 76.5 TF/s) — Mosaic does not overlap MXU and VPU
            # across the independent sub-tiles, and the s-scratch VMEM
            # round-trip is pure overhead. Kept as a documented knob.
            _partial_body()
        else:
            pl.when(hi - lo == nsub)(_full_block)
            pl.when(hi - lo < nsub)(_partial_body)
    else:
        _full_block()

    @pl.when(steps_ref[3, t] == 1)
    def _epilogue():
        _fwd_write_out(scales_ref, sink_ref, o_ref, lse_ref, acc_ref,
                       m_ref, l_ref, group, block_q, fp8,
                       use_sink=use_sink, fp8_out=fp8_out)


def _enumerate_steps(nq, nk, block_q, block_k, offset, causal, window,
                     order="qk", sub_w=0):
    """Static (iq, ik) block pairs that can contain unmasked entries,
    with first/last flags marking segment boundaries of the outer index.
    order='qk': iq-major (fwd, dq — flags delimit each iq's k sweep);
    order='kq': ik-major (dkv — flags delimit each ik's q sweep).

    With ``sub_w`` > 0 each block's k extent is additionally resolved to
    ``sub_w``-wide sub-tiles: rows [4]/[5] give the [lo, hi) sub-tile
    range that can contain unmasked entries (causal trims from the
    right, window[0] from the left). The kernels guard per-sub-tile MXU
    and VPU work on this range, removing the causal over-compute of the
    partially-masked diagonal blocks while keeping the grid-step count
    of the wide block_k.

    Returns an int32 array of shape (7, T): iq, ik, first, last, lo, hi,
    nomask — nomask=1 marks blocks where NO positional mask can bite
    (fully below the causal diagonal and fully inside the window), so
    the kernels run a statically mask-free body there (the compare +
    select VPU passes are ~2 of the ~7 per-element passes)."""
    import numpy as np
    nsub = block_k // sub_w if sub_w else 1

    def sub_range(iq, ik):
        if not sub_w:
            return 0, 1
        q_first = iq * block_q + offset
        q_last = q_first + block_q - 1
        k_first = ik * block_k
        lo_pos, hi_pos = k_first, k_first + block_k - 1
        if window[0] >= 0:
            lo_pos = max(lo_pos, q_first - window[0])
        if causal:
            hi_pos = min(hi_pos, q_last)
        if window[1] >= 0 and not causal:
            hi_pos = min(hi_pos, q_last + window[1])
        lo = min(max(0, (lo_pos - k_first) // sub_w), nsub - 1)
        hi = min(nsub, max(lo + 1, (hi_pos - k_first) // sub_w + 1))
        return lo, hi

    pairs = []
    for outer in range(nq if order == "qk" else nk):
        inner_n = nk if order == "qk" else nq
        row = []
        for inner in range(inner_n):
            iq, ik = (outer, inner) if order == "qk" else (inner, outer)
            q_first = iq * block_q + offset
            q_last = q_first + block_q - 1
            k_first = ik * block_k
            k_last = k_first + block_k - 1
            needed = True
            if causal:
                needed = needed and (k_first <= q_last)
            if window[0] >= 0:
                needed = needed and (k_last >= q_first - window[0])
            if window[1] >= 0 and not causal:
                needed = needed and (k_first <= q_last + window[1])
            if needed:
                row.append((iq, ik))
        if not row:
            # Outer index fully masked (e.g. bottom-right causal with
            # sq > skv): still run one block so its output is written —
            # the in-kernel mask zeroes it (l stays 0 / ds is 0). One
            # sub-tile of work suffices.
            iq, ik = (outer, 0) if order == "qk" else (0, outer)
            pairs.append((iq, ik, 1, 1, 0, 1, 0))
            continue
        for j, (iq, ik) in enumerate(row):
            lo, hi = sub_range(iq, ik)
            q_first = iq * block_q + offset
            q_last = q_first + block_q - 1
            k_first = ik * block_k
            k_last = k_first + block_k - 1
            nomask = True
            if causal:
                nomask = nomask and (k_last <= q_first)
            if window[0] >= 0:
                nomask = nomask and (k_first >= q_last - window[0])
            if window[1] >= 0 and not causal:
                nomask = nomask and (k_last <= q_first + window[1])
            pairs.append((iq, ik, 1 if j == 0 else 0,
                          1 if j == len(row) - 1 else 0, lo, hi,
                          1 if nomask else 0))
    return np.asarray(pairs, dtype=np.int32).T.copy()


def _flash_fwd(q, k, v, qseg, kseg, qoff, bias=None, *, scale, causal,
               window, offset, block_q, block_k, static_pos=False,
               scale_invs=None, out_dtype=None, out_scale=None,
               dropout_rate=0.0, dropout_seed=None, score_mod=None,
               softmax_sink=None):
    """``out_scale`` (fp8_mha): a pre-known per-tensor O scale (delayed
    scaling) — the epilogue casts O to fp8 ``out_dtype`` in-kernel and
    the pre-quantization O amax returns as a third output (reference:
    common/fused_attn/fused_attn_fp8.cu O quantize + amax)."""
    b, hq, sq, d = q.shape
    skv = k.shape[2]
    hkv = k.shape[1]
    assert hq % hkv == 0, f"query heads {hq} not a multiple of kv heads {hkv}"
    group = hq // hkv
    fp8 = scale_invs is not None
    fp8_out = out_scale is not None
    assert not fp8_out or fp8, "fp8 O epilogue requires fp8 Q/K/V payloads"
    if fp8:
        # FP8 payloads: dequant scales + softmax scale + nat->exp2 fold
        # into one in-kernel score multiplier; V's sv_inv applies at
        # write-out (reference: common/fused_attn/fused_attn_fp8.cu).
        scales = jnp.stack([
            scale_invs[0] * scale_invs[1] * (scale * LOG2E),
            scale_invs[2],
            (out_scale.reshape(()) if fp8_out
             else jnp.float32(1.0))]).astype(jnp.float32)
    elif score_mod is None:
        # Fold softmax scale + nat->exp2 conversion into q (one fused pass
        # over (B,H,S,D) instead of one per score block inside the kernel).
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        scales = jnp.ones((2,), jnp.float32)
    else:
        # Score-mod path: the user mod needs natural-domain raw scores,
        # so q stays unscaled and scale applies in-kernel pre-mod.
        scales = jnp.ones((2,), jnp.float32)
    o_dtype = out_dtype if out_dtype is not None else q.dtype
    seed = (dropout_seed if dropout_seed is not None
            else jnp.zeros((2,), jnp.int32))
    block_q, block_k = _effective_blocks(sq, skv, group, block_q, block_k)
    nq, nk = pl.cdiv(sq, block_q), pl.cdiv(skv, block_k)
    # Dynamic (traced) window bounds — striped ring CP passes per-chunk
    # bounds that depend on the rank index. They ride the qoff SMEM
    # operand; the kernel partial gets a static placeholder that only
    # encodes which sides are active. Forces the dense grid (the
    # enumerated grid bakes the bounds into the step list).
    wa = _win_active(window)
    dyn_win = _win_dynamic(window)
    if dyn_win:
        qoff = jnp.concatenate([
            qoff.reshape(1)] + [
            jnp.asarray(w if a else 0, jnp.int32).reshape(1)
            for w, a in zip(window, wa)])
        window = tuple(0 if a else -1 for a in wa)
    # Enumerated-steps grid: when positions are static (no dynamic
    # q-offset) and a causal/window structure masks out whole blocks,
    # enumerate only the reachable block pairs instead of skipping
    # inside a dense grid (skipped grid steps still pay K/V DMA and
    # branch latency — measured 72.9 -> see docs/PARITY.md).
    use_steps = (static_pos and not dyn_win
                 and (causal or wa[0] or wa[1]))
    use_segments = qseg is not None
    # Segment ids are pre-broadcast outside the kernel so each read has the
    # right TPU orientation (q: sublane rows, kv: lanes) with no in-kernel
    # relayout (same trick as jax.experimental.pallas.ops.tpu.flash_attention).
    if use_segments:
        qseg = jax.lax.broadcast_in_dim(qseg, (b, sq, 128), (0, 1))
        kseg = jax.lax.broadcast_in_dim(kseg, (b, 8, skv), (0, 2))
    else:
        qseg = jnp.zeros((b, 8, 128), jnp.int32)
        kseg = jnp.zeros((b, 8, 128), jnp.int32)

    rows = group * block_q
    use_bias = bias is not None
    if use_bias:
        # (Bb, H, Sq, Skv); Bb == b or 1 (broadcast over batch)
        bias_b = bias.shape[0]
    else:
        bias = jnp.zeros((1, 1, 8, 128), jnp.float32)
        bias_b = 1
    use_sink = softmax_sink is not None
    if use_sink:
        # Per-head sink logits, pre-converted to the exp2 domain and
        # broadcast along lanes; block (1, group, 128) indexed by hkv.
        sink = jnp.broadcast_to(
            (softmax_sink.astype(jnp.float32) * LOG2E).reshape(
                hkv, group, 1), (hkv, group, 128))
        sink_block = (1, group, 128)
    else:
        sink = jnp.zeros((1, 1, 128), jnp.float32)
        sink_block = (1, 1, 128)

    out_shape = [
        jax.ShapeDtypeStruct((b, hq, sq, d), o_dtype),
        jax.ShapeDtypeStruct((b, hq, sq, 8), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((rows, d), jnp.float32),
        pltpu.VMEM((rows, 128), jnp.float32),
        pltpu.VMEM((rows, 128), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=int(4 * b * hq * sq * skv * d * (0.5 if causal else 1.0)),
        bytes_accessed=2 * (b * hq * sq * d + 2 * b * hkv * skv * d
                            + b * hq * sq * d),
        transcendentals=b * hq * sq * skv)
    # rows > 1024 exceeds the 16 MB scoped-vmem default (score tile is
    # rows*block_k*4 bytes of spill); only then raise the limit — the
    # raised limit has stalled some remote-compiler variants (r2 note),
    # so it must not apply to default configs.
    cparams = {}
    if rows > 1024:
        cparams["vmem_limit_bytes"] = 112 * 1024 * 1024

    if use_steps:
        # Masked-edge skipping: inapplicable with score_mod (per-sub-tile
        # mod replay is possible but unprofiled) or dropout (bit replay
        # is generated per full block). The fwd split body needs a
        # (rows, block_k) f32 score scratch; cap it at 4 MB so the
        # kernel stays inside the 16 MB scoped-vmem default (raising the
        # limit stalls some remote-compiler variants, r2 note).
        sub_w = (_split_width(block_k)
                 if score_mod is None and dropout_rate == 0.0 else 0)
        if sub_w and rows * block_k * 4 > 4 * 1024 * 1024:
            sub_w = 0
        steps = _enumerate_steps(nq, nk, block_q, block_k, offset,
                                 causal, window, order="qk", sub_w=sub_w)
        T = steps.shape[1]
        if sub_w:
            scratch_shapes = scratch_shapes + [
                pltpu.VMEM((rows, block_k), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
            ]
        kernel = functools.partial(
            _fwd_kernel_steps, causal=causal, use_segments=use_segments,
            use_bias=use_bias, fp8=fp8, dropout_rate=dropout_rate,
            window=window, offset=offset,
            group=group, block_q=block_q, block_k=block_k,
            score_mod=score_mod, scale=scale, use_sink=use_sink,
            sub_w=sub_w, fp8_out=fp8_out)
        sink_spec = pl.BlockSpec(
            sink_block,
            (lambda bi, hk, t, st: (hk, 0, 0)) if use_sink
            else (lambda bi, hk, t, st: (0, 0, 0)),
            memory_space=pltpu.VMEM)
        if use_bias:
            bias_spec = pl.BlockSpec(
                (1, group, block_q, block_k),
                lambda bi, hk, t, st: (bi % bias_b if bias_b > 1 else 0,
                                       hk, st[0, t], st[1, t]),
                memory_space=pltpu.VMEM)
        else:
            bias_spec = pl.BlockSpec((1, 1, 8, 128),
                                     lambda bi, hk, t, st: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
        if use_segments:
            seg_q_spec = pl.BlockSpec((1, block_q, 128),
                                      lambda bi, hk, t, st: (bi, st[0, t], 0),
                                      memory_space=pltpu.VMEM)
            seg_k_spec = pl.BlockSpec((1, 8, block_k),
                                      lambda bi, hk, t, st: (bi, 0, st[1, t]),
                                      memory_space=pltpu.VMEM)
        else:
            seg_q_spec = seg_k_spec = pl.BlockSpec(
                (1, 8, 128), lambda bi, hk, t, st: (bi, 0, 0),
                memory_space=pltpu.VMEM)
        o, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, hkv, T),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    seg_q_spec,
                    seg_k_spec,
                    pl.BlockSpec((1, group, block_q, d),
                                 lambda bi, hk, t, st: (bi, hk, st[0, t], 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, block_k, d),
                                 lambda bi, hk, t, st: (bi, hk, st[1, t], 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, block_k, d),
                                 lambda bi, hk, t, st: (bi, hk, st[1, t], 0),
                                 memory_space=pltpu.VMEM),
                    bias_spec,
                    sink_spec,
                ],
                out_specs=[
                    pl.BlockSpec((1, group, block_q, d),
                                 lambda bi, hk, t, st: (bi, hk, st[0, t], 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, group, block_q, 8),
                                 lambda bi, hk, t, st: (bi, hk, st[0, t], 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                **cparams),
            cost_estimate=cost,
            interpret=_interpret(),
        )(jnp.asarray(steps), scales, seed, qseg, kseg, q, k, v, bias, sink)
        if fp8_out:
            return o, lse[..., 0], jnp.max(lse[..., 4])
        return o, lse[..., 0]

    grid = (b, hkv, nq, nk)
    kernel = functools.partial(
        _fwd_kernel, causal=causal, use_segments=use_segments,
        use_bias=use_bias, fp8=fp8, dropout_rate=dropout_rate,
        window=window, offset=offset, group=group,
        block_q=block_q, block_k=block_k,
        num_k_blocks=nk, score_mod=score_mod, scale=scale,
        dynamic_window=dyn_win, use_sink=use_sink, fp8_out=fp8_out)
    sink_spec = pl.BlockSpec(
        sink_block,
        (lambda bi, hk, iq, ik: (hk, 0, 0)) if use_sink
        else (lambda bi, hk, iq, ik: (0, 0, 0)),
        memory_space=pltpu.VMEM)
    if use_bias:
        bias_spec = pl.BlockSpec(
            (1, group, block_q, block_k),
            lambda bi, hk, iq, ik: (bi % bias_b if bias_b > 1 else 0,
                                    hk, iq, ik),
            memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, 1, 8, 128),
                                 lambda bi, hk, iq, ik: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    if use_segments:
        seg_q_spec = pl.BlockSpec((1, block_q, 128),
                                  lambda bi, hk, iq, ik: (bi, iq, 0),
                                  memory_space=pltpu.VMEM)
        seg_k_spec = pl.BlockSpec((1, 8, block_k),
                                  lambda bi, hk, iq, ik: (bi, 0, ik),
                                  memory_space=pltpu.VMEM)
    else:
        seg_q_spec = seg_k_spec = pl.BlockSpec(
            (1, 8, 128), lambda bi, hk, iq, ik: (bi, 0, 0),
            memory_space=pltpu.VMEM)

    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seg_q_spec,
            seg_k_spec,
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
            sink_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, 8),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            **cparams),
        cost_estimate=cost,
        interpret=_interpret(),
    )(qoff, scales, seed, qseg, kseg, q, k, v, bias, sink)
    if fp8_out:
        return o, lse[..., 0], jnp.max(lse[..., 4])
    return o, lse[..., 0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref,
                       k_ref, v_ref,
                       do_ref, lse_ref, delta_ref, bias_ref, acc_ref,
                       q_start, k_start, off, *,
                       causal, use_segments, window, group, block_q, block_k,
                       fp8, use_bias, dropout_rate=0.0,
                       score_mod=None, scale=1.0, prog_bh=None,
                       window_active=None, sub_w=0, sub_lo=None,
                       sub_hi=None):
    """dQ contribution of one (packed-q, k) block pair. Shared by the
    dense-grid and enumerated-steps dq kernels. Returns the natural-
    domain ds block (== dBias, reference cuDNN bwd dBias output).

    Processed in unrolled INNER_K-wide sub-tiles (fully independent —
    no online-max chain in bwd), so Mosaic overlaps each sub-tile's VPU
    p/ds chain with the neighbours' MXU matmuls. Single-tile when
    dropout (bit replay) or bias (full-width ds return) is active.

    ``sub_w`` > 0 (masked-edge skipping, enumerated-steps grids only):
    the block runs in sub_w-wide sub-tiles and only those in
    [sub_lo, sub_hi) — traced scalars from the step table — execute;
    each sub-tile's work is fully independent in bwd, so the guard is a
    plain pl.when with no cross-tile state."""
    rows = group * block_q
    # q arrives pre-scaled by scale*LOG2E; lse pre-converted to the
    # exp2 domain. The true softmax scale is re-applied once in the
    # epilogue — no per-score-block scale multiplies. In fp8 mode q/k/v
    # are payloads and scales_ref = [smult, sv_inv, scale*sk_inv].
    d = q_ref.shape[-1]
    q = q_ref[0].reshape(rows, d)
    do = do_ref[0].reshape(rows, d)
    k_full = k_ref[0, 0]
    v_full = v_ref[0, 0]
    lse2 = lse_ref[0].reshape(rows, 8)[:, :1]
    delta = delta_ref[0].reshape(rows, 8)[:, :1]
    if sub_w:
        n_sub, ik_w = block_k // sub_w, sub_w
    elif (dropout_rate > 0.0 or use_bias or block_k % INNER_K != 0
            or INNER_K >= block_k):
        n_sub, ik_w = 1, block_k
    else:
        n_sub, ik_w = block_k // INNER_K, INNER_K
    if use_segments:
        qs_val = qseg_ref[0, :, :1]
        ks_full = kseg_ref[0, :1, :]
    else:
        qs_val = ks_full = None

    def _tile(j):
        kst = k_start + j * ik_w
        k = k_full if n_sub == 1 else k_full[j * ik_w:(j + 1) * ik_w, :]
        v = v_full if n_sub == 1 else v_full[j * ik_w:(j + 1) * ik_w, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fp8:
            s = s * scales_ref[0]
        mod_vjp = None
        if score_mod is not None:
            # q arrives UNscaled in score-mod mode; replay the mod and
            # keep its vjp so ds can be pulled back through it below.
            bi, hi, qpos, kpos = _mod_args(q_start, kst, off, group,
                                           block_q, ik_w, prog_bh)
            s, mod_vjp = jax.vjp(
                lambda x: score_mod(x, bi, hi, qpos, kpos), s * scale)
            s = s * LOG2E
        if use_bias:
            s = s + bias_ref[0].reshape(rows, block_k).astype(
                jnp.float32) * LOG2E
        kseg_val = None
        if use_segments:
            kseg_val = (ks_full if n_sub == 1
                        else ks_full[:, j * ik_w:(j + 1) * ik_w])
        s = _mask_scores(s, qs_val, kseg_val, q_start, kst, off,
                         causal=causal, window=window,
                         use_segments=use_segments,
                         group=group, block_q=block_q, block_k=ik_w,
                         window_active=window_active)
        # lse2 >= NEG_INF floor, masked s = MASKED -> p underflows to 0.
        p = jnp.exp2(s - lse2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fp8:
            dp = dp * scales_ref[1]
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref, q_start, k_start, rows, block_k,
                                 dropout_rate, prog_bh)
            dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
        ds = p * (dp - delta)
        if mod_vjp is not None:
            ds = mod_vjp(ds)[0]
        acc_ref[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16 if fp8 else k.dtype), k,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return ds

    ds_out = None
    for j in range(n_sub):
        if sub_w:
            @pl.when(jnp.logical_and(sub_lo <= j, j < sub_hi))
            def _guarded(j=j):
                _tile(j)
        else:
            ds_out = _tile(j)
    return ds_out


def _bwd_dq_kernel(qoff_ref, scales_ref, seed_ref, qseg_ref, kseg_ref,
                   q_ref, k_ref, v_ref, do_ref, lse_ref,
                   delta_ref, bias_ref, dq_ref, dbias_ref, acc_ref, *,
                   scale, causal, use_segments, window, offset,
                   group, block_q, block_k, num_k_blocks, fp8, use_bias,
                   dropout_rate, score_mod=None, dynamic_window=False):
    iq, ik = pl.program_id(2), pl.program_id(3)
    prog_bh = (pl.program_id(0), pl.program_id(1))
    wa = _win_active(window)
    if dynamic_window:
        window = tuple(qoff_ref[1 + i] if wa[i] else -1 for i in range(2))

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_start = iq * block_q
    k_start = ik * block_k
    off = offset + qoff_ref[0]
    run = jnp.full((), True)
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1 + off)
    if wa[0]:
        run = jnp.logical_and(
            run, k_start + block_k - 1 >= q_start + off - window[0])

    if use_bias:
        # Every grid step owns one dbias block; skipped blocks are zero.
        dbias_ref[0] = jnp.zeros(
            (group, block_q, block_k), dbias_ref.dtype)

    @pl.when(run)
    def _body():
        ds = _bwd_dq_block_body(
            scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref, k_ref,
            v_ref, do_ref, lse_ref, delta_ref, bias_ref, acc_ref,
            q_start, k_start, off,
            causal=causal, use_segments=use_segments,
            window=window, group=group,
            block_q=block_q, block_k=block_k, fp8=fp8, use_bias=use_bias,
            dropout_rate=dropout_rate, score_mod=score_mod, scale=scale,
            prog_bh=prog_bh, window_active=wa)
        if use_bias:
            dbias_ref[0] = ds.astype(dbias_ref.dtype).reshape(
                group, block_q, block_k)

    @pl.when(ik == num_k_blocks - 1)
    def _epilogue():
        d = dq_ref.shape[-1]
        mult = scales_ref[2] if fp8 else scale
        dq_ref[0] = (acc_ref[...] * mult).astype(dq_ref.dtype).reshape(
            group, block_q, d)


def _bwd_dq_kernel_steps(steps_ref, scales_ref, seed_ref, qseg_ref,
                         kseg_ref, q_ref,
                         k_ref, v_ref,
                         do_ref, lse_ref, delta_ref, dq_ref, acc_ref, *,
                         scale, causal, use_segments, window, offset,
                         group, block_q, block_k, fp8, dropout_rate,
                         score_mod=None, sub_w=0):
    # (biased bwd uses the dense grid so every dbias block is written)
    """Enumerated-steps dQ: grid (b, hkv, T), step t -> block pair
    (steps[0,t], steps[1,t]); flags [2]/[3] mark each iq's first/last
    k block. Branchless body — only reachable blocks are enumerated.
    ``sub_w`` > 0: partially-masked blocks run only the [lo, hi)
    sub-tiles from steps[4]/steps[5] (masked-edge skipping)."""
    t = pl.program_id(2)
    prog_bh = (pl.program_id(0), pl.program_id(1))
    iq = steps_ref[0, t]
    ik = steps_ref[1, t]

    @pl.when(steps_ref[2, t] == 1)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _block(sw, lo=None, hi=None, nomask=False):
        _bwd_dq_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref,
                           k_ref, v_ref,
                           do_ref, lse_ref, delta_ref, None, acc_ref,
                           iq * block_q, ik * block_k, offset,
                           causal=causal and not nomask,
                           use_segments=use_segments,
                           window=(-1, -1) if nomask else window,
                           group=group,
                           block_q=block_q, block_k=block_k, fp8=fp8,
                           use_bias=False, dropout_rate=dropout_rate,
                           score_mod=score_mod, scale=scale,
                           prog_bh=prog_bh, sub_w=sw, sub_lo=lo, sub_hi=hi)

    nm = steps_ref[6, t]

    def _full_block():
        # Statically mask-free body for blocks no positional mask bites
        # (steps row 6) — saves the compare+select VPU passes.
        if not use_segments:
            pl.when(nm == 1)(lambda: _block(0, nomask=True))
            pl.when(nm == 0)(lambda: _block(0))
        else:
            _block(0)

    if sub_w:
        nsub = block_k // sub_w
        lo = steps_ref[4, t]
        hi = steps_ref[5, t]
        pl.when(hi - lo == nsub)(_full_block)
        pl.when(hi - lo < nsub)(lambda: _block(sub_w, lo, hi))
    else:
        _full_block()

    @pl.when(steps_ref[3, t] == 1)
    def _epilogue():
        d = dq_ref.shape[-1]
        mult = scales_ref[2] if fp8 else scale
        dq_ref[0] = (acc_ref[...] * mult).astype(dq_ref.dtype).reshape(
            group, block_q, d)


def _bwd_dkv_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref,
                        k_ref, v_ref,
                        do_ref, lse_ref, delta_ref, bias_ref, dk_acc, dv_acc,
                        q_start, k_start, off, *,
                        causal, use_segments, window, group,
                        block_q, block_k, fp8, use_bias, dropout_rate=0.0,
                        score_mod=None, scale=1.0, prog_bh=None,
                        window_active=None, sub_w=0, sub_lo=None,
                        sub_hi=None):
    """dK/dV contribution of one (packed-q, k) block pair. Shared by the
    dense-grid and enumerated-steps dkv kernels.

    Processed in unrolled INNER_K-wide k sub-tiles (independent — each
    writes its own dk/dv accumulator row slice) so Mosaic overlaps the
    per-sub-tile VPU chain with neighbouring MXU matmuls.

    ``sub_w`` > 0: masked-edge skipping — only sub-tiles in
    [sub_lo, sub_hi) run (each owns its own dk/dv accumulator rows, so
    the guard needs no cross-tile state)."""
    rows = group * block_q
    # q is pre-scaled by scale*LOG2E; dk therefore accumulates
    # (1/LN2 * scale^-1)-scaled values and is fixed in the epilogue.
    d = q_ref.shape[-1]
    q = q_ref[0].reshape(rows, d)
    do = do_ref[0].reshape(rows, d)
    k_full = k_ref[0, 0]
    v_full = v_ref[0, 0]
    lse2 = lse_ref[0].reshape(rows, 8)[:, :1]
    delta = delta_ref[0].reshape(rows, 8)[:, :1]
    if sub_w:
        n_sub, ik_w = block_k // sub_w, sub_w
    elif (dropout_rate > 0.0 or block_k % INNER_K != 0
            or INNER_K >= block_k):
        n_sub, ik_w = 1, block_k
    else:
        n_sub, ik_w = block_k // INNER_K, INNER_K
    if use_segments:
        qs_val = qseg_ref[0, :, :1]
        ks_full = kseg_ref[0, :1, :]
    else:
        qs_val = ks_full = None

    def _tile(j):
        kst = k_start + j * ik_w
        sub = slice(j * ik_w, (j + 1) * ik_w)
        k = k_full if n_sub == 1 else k_full[sub, :]
        v = v_full if n_sub == 1 else v_full[sub, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fp8:
            s = s * scales_ref[0]
        mod_vjp = None
        if score_mod is not None:
            bi, hi, qpos, kpos = _mod_args(q_start, kst, off, group,
                                           block_q, ik_w, prog_bh)
            s, mod_vjp = jax.vjp(
                lambda x: score_mod(x, bi, hi, qpos, kpos), s * scale)
            s = s * LOG2E
        if use_bias:
            bias = bias_ref[0].reshape(rows, block_k)
            if n_sub > 1:
                bias = bias[:, sub]
            s = s + bias.astype(jnp.float32) * LOG2E
        kseg_val = None
        if use_segments:
            kseg_val = ks_full if n_sub == 1 else ks_full[:, sub]
        s = _mask_scores(s, qs_val, kseg_val, q_start, kst, off,
                         causal=causal, window=window,
                         use_segments=use_segments,
                         group=group, block_q=block_q, block_k=ik_w,
                         window_active=window_active)
        p = jnp.exp2(s - lse2)
        cdt = jnp.bfloat16 if fp8 else q.dtype
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref, q_start, k_start, rows, block_k,
                                 dropout_rate, prog_bh)
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p * inv, 0.0)  # dropped weights for dV
        else:
            keep, pd = None, p
        pc = pd.astype(cdt)
        dv_acc[sub, :] += jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fp8:
            dp = dp * scales_ref[1]
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - delta)
        if mod_vjp is not None:
            ds = mod_vjp(ds)[0]
        dk_acc[sub, :] += jax.lax.dot_general(
            ds.astype(cdt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for j in range(n_sub):
        if sub_w:
            @pl.when(jnp.logical_and(sub_lo <= j, j < sub_hi))
            def _guarded(j=j):
                _tile(j)
        else:
            _tile(j)


def _bwd_dkv_kernel(qoff_ref, scales_ref, seed_ref, qseg_ref, kseg_ref,
                    q_ref, k_ref, v_ref, do_ref, lse_ref,
                    delta_ref, bias_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    scale, causal, use_segments, window, offset,
                    group, block_q, block_k, num_q_blocks, fp8, use_bias,
                    dropout_rate, score_mod=None, dynamic_window=False):
    """dK/dV over grid (b, hkv, ik, iq). With GQA packing the `group`
    query heads sharing this KV head are stacked into the contraction
    rows, so dk/dv come out already summed over the group — no per-head
    (b, hq, skv, d) materialization + reduce pass."""
    ik, iq = pl.program_id(2), pl.program_id(3)
    prog_bh = (pl.program_id(0), pl.program_id(1))
    rows = group * block_q
    wa = _win_active(window)
    if dynamic_window:
        window = tuple(qoff_ref[1 + i] if wa[i] else -1 for i in range(2))

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_start = iq * block_q
    k_start = ik * block_k
    off = offset + qoff_ref[0]
    run = jnp.full((), True)
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1 + off)
    if wa[0]:
        run = jnp.logical_and(
            run, k_start + block_k - 1 >= q_start + off - window[0])

    @pl.when(run)
    def _body():
        _bwd_dkv_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref,
                            q_ref, k_ref,
                            v_ref, do_ref, lse_ref, delta_ref, bias_ref,
                            dk_acc, dv_acc,
                            q_start, k_start, off,
                            causal=causal, use_segments=use_segments,
                            window=window, group=group,
                            block_q=block_q, block_k=block_k, fp8=fp8,
                            use_bias=use_bias, dropout_rate=dropout_rate,
                            score_mod=score_mod, scale=scale,
                            prog_bh=prog_bh, window_active=wa)

    @pl.when(iq == num_q_blocks - 1)
    def _epilogue():
        # dk_acc = sum ds_raw^T (scale*LOG2E*q_true); dk_true =
        # scale * sum ds_raw^T q_true = dk_acc / LOG2E = dk_acc * LN2.
        # fp8: q is a payload, dk_true = scale*sq_inv*dk_acc (scales[2]).
        # score-mod: q is unscaled, dk_true = scale * dk_acc.
        dk_mult = (scales_ref[2] if fp8
                   else (scale if score_mod is not None else LN2))
        dk_ref[0, 0] = (dk_acc[...] * dk_mult).astype(dk_ref.dtype)
        if fp8:
            # scales[3] = do_scale_inv (1.0 unless dO is an fp8 payload).
            dv_ref[0, 0] = (dv_acc[...] * scales_ref[3]).astype(dv_ref.dtype)
        else:
            dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dkv_kernel_steps(steps_ref, scales_ref, seed_ref, qseg_ref,
                          kseg_ref, q_ref,
                          k_ref, v_ref,
                          do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                          dk_acc, dv_acc, *,
                          scale, causal, use_segments, window, offset,
                          group, block_q, block_k, fp8, dropout_rate,
                          score_mod=None, sub_w=0):
    """Enumerated-steps dK/dV: grid (b, hkv, T), ik-major enumeration
    (order='kq') so flags [2]/[3] delimit each ik's q sweep.
    ``sub_w`` > 0: partially-masked blocks run only the [lo, hi)
    sub-tiles from steps[4]/steps[5] (masked-edge skipping)."""
    t = pl.program_id(2)
    prog_bh = (pl.program_id(0), pl.program_id(1))
    iq = steps_ref[0, t]
    ik = steps_ref[1, t]

    @pl.when(steps_ref[2, t] == 1)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _block(sw, lo=None, hi=None, nomask=False):
        _bwd_dkv_block_body(scales_ref, seed_ref, qseg_ref, kseg_ref, q_ref,
                            k_ref, v_ref,
                            do_ref, lse_ref, delta_ref, None, dk_acc, dv_acc,
                            iq * block_q, ik * block_k, offset,
                            causal=causal and not nomask,
                            use_segments=use_segments,
                            window=(-1, -1) if nomask else window,
                            group=group,
                            block_q=block_q, block_k=block_k, fp8=fp8,
                            use_bias=False, dropout_rate=dropout_rate,
                            score_mod=score_mod, scale=scale,
                            prog_bh=prog_bh, sub_w=sw, sub_lo=lo, sub_hi=hi)

    nm = steps_ref[6, t]

    def _full_block():
        if not use_segments:
            pl.when(nm == 1)(lambda: _block(0, nomask=True))
            pl.when(nm == 0)(lambda: _block(0))
        else:
            _block(0)

    if sub_w:
        nsub = block_k // sub_w
        lo = steps_ref[4, t]
        hi = steps_ref[5, t]
        pl.when(hi - lo == nsub)(_full_block)
        pl.when(hi - lo < nsub)(lambda: _block(sub_w, lo, hi))
    else:
        _full_block()

    @pl.when(steps_ref[3, t] == 1)
    def _epilogue():
        dk_mult = (scales_ref[2] if fp8
                   else (scale if score_mod is not None else LN2))
        dk_ref[0, 0] = (dk_acc[...] * dk_mult).astype(dk_ref.dtype)
        if fp8:
            dv_ref[0, 0] = (dv_acc[...] * scales_ref[3]).astype(dv_ref.dtype)
        else:
            dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, qseg, kseg, qoff, bias=None, *, scale,
               causal, window, offset, block_q, block_k, static_pos=False,
               scale_invs=None, grad_dtype=None,
               dropout_rate=0.0, dropout_seed=None, score_mod=None,
               o_scale_inv=None, do_scale_inv=None):
    """Returns (dq, dk, dv, dbias). dbias is None unless ``bias`` is
    given, in which case it is the per-batch (B, Hq, Sq, Skv) bias
    gradient (caller reduces over batch for broadcast bias; reference:
    cuDNN bwd dBias in fused_attn_f16_arbitrary_seqlen.cu).

    fp8_mha extension (reference NVTE_FP8_DPA_BWD): ``o`` and ``do`` may
    arrive as fp8 PAYLOADS with per-tensor ``o_scale_inv`` /
    ``do_scale_inv`` — dO's scale folds into the dp multiplier and a 4th
    scales entry fixes dV at the epilogue, so the kernels stream fp8 dO
    bytes directly."""
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    assert hq % hkv == 0, f"query heads {hq} not a multiple of kv heads {hkv}"
    group = hq // hkv
    block_q, block_k = _effective_blocks(sq, skv, group, block_q, block_k)
    nq, nk = pl.cdiv(sq, block_q), pl.cdiv(skv, block_k)
    # Dynamic (traced) window bounds ride the qoff SMEM operand — see
    # _flash_fwd. Forces the dense grids.
    wa = _win_active(window)
    dyn_win = _win_dynamic(window)
    if dyn_win:
        qoff = jnp.concatenate([
            qoff.reshape(1)] + [
            jnp.asarray(w if a else 0, jnp.int32).reshape(1)
            for w, a in zip(window, wa)])
        window = tuple(0 if a else -1 for a in wa)
    use_segments = qseg is not None
    if use_segments:
        qseg = jax.lax.broadcast_in_dim(qseg, (b, sq, 128), (0, 1))
        kseg = jax.lax.broadcast_in_dim(kseg, (b, 8, skv), (0, 2))
    else:
        qseg = jnp.zeros((b, 8, 128), jnp.int32)
        kseg = jnp.zeros((b, 8, 128), jnp.int32)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    fp8 = scale_invs is not None
    sdo = (jnp.float32(1.0) if do_scale_inv is None
           else do_scale_inv.astype(jnp.float32).reshape(()))
    if o_scale_inv is not None or do_scale_inv is not None:
        assert fp8, "fp8 O/dO payloads require fp8 Q/K/V payloads"
        so = (jnp.float32(1.0) if o_scale_inv is None
              else o_scale_inv.astype(jnp.float32).reshape(()))
        delta = delta * (so * sdo)
    if fp8:
        smult = scale_invs[0] * scale_invs[1] * (scale * LOG2E)
        # [1] multiplies dp = do.v^T (v and do dequant); [3] fixes dV
        # (= p^T.do) at the epilogue when do is a payload.
        dq_scales = jnp.stack([smult, scale_invs[2] * sdo,
                               scale * scale_invs[1],
                               jnp.float32(1.0)]).astype(jnp.float32)
        dkv_scales = jnp.stack([smult, scale_invs[2] * sdo,
                                scale * scale_invs[0],
                                sdo]).astype(jnp.float32)
    elif score_mod is None:
        # exp2-domain kernels: q carries scale*LOG2E, lse converted to log2.
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        dq_scales = dkv_scales = jnp.ones((3,), jnp.float32)
    else:
        # score-mod mode: q unscaled, kernels replay the mod in natural
        # domain (scale applied in-kernel pre-mod).
        dq_scales = dkv_scales = jnp.ones((3,), jnp.float32)
    g_dtype = grad_dtype if grad_dtype is not None else q.dtype
    lse_b = jnp.broadcast_to((lse * LOG2E)[..., None], (*lse.shape, 8))
    delta_b = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))

    def seg_spec(which, order):
        if not use_segments:
            return pl.BlockSpec((1, 8, 128), lambda bi, h, i2, i3: (bi, 0, 0),
                                memory_space=pltpu.VMEM)
        if which == "q":
            shape = (1, block_q, 128)
            if order == "qk":   # grid dims (b, hk, iq, ik)
                idx = lambda bi, h, iq, ik: (bi, iq, 0)
            else:               # grid dims (b, hk, ik, iq)
                idx = lambda bi, h, ik, iq: (bi, iq, 0)
        else:
            shape = (1, 8, block_k)
            if order == "qk":
                idx = lambda bi, h, iq, ik: (bi, 0, ik)
            else:
                idx = lambda bi, h, ik, iq: (bi, 0, ik)
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    use_bias = bias is not None
    if use_bias:
        bias_b = bias.shape[0]
        bias = bias.astype(jnp.float32)
    else:
        bias = jnp.zeros((1, 1, 8, 128), jnp.float32)
        bias_b = 1

    common = dict(scale=scale, causal=causal, use_segments=use_segments,
                  window=window, offset=offset, group=group,
                  block_q=block_q, block_k=block_k, fp8=fp8,
                  dropout_rate=dropout_rate, score_mod=score_mod)
    rows = group * block_q
    seed = (dropout_seed if dropout_seed is not None
            else jnp.zeros((2,), jnp.int32))

    # Biased bwd needs the dense grid: every (iq, ik) dbias block must be
    # visited (skipped enumerated blocks would leave garbage).
    use_steps = (static_pos and not use_bias and not dyn_win
                 and (causal or wa[0] or wa[1]))
    if use_steps:
        def steps_seg_spec(which):
            if not use_segments:
                return pl.BlockSpec((1, 8, 128),
                                    lambda bi, h, t, st: (bi, 0, 0),
                                    memory_space=pltpu.VMEM)
            if which == "q":
                return pl.BlockSpec((1, block_q, 128),
                                    lambda bi, h, t, st: (bi, st[0, t], 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1, 8, block_k),
                                lambda bi, h, t, st: (bi, 0, st[1, t]),
                                memory_space=pltpu.VMEM)

        def q_row_spec(last):
            return pl.BlockSpec((1, group, block_q, last),
                                lambda bi, hk, t, st: (bi, hk, st[0, t], 0),
                                memory_space=pltpu.VMEM)

        def kv_spec():
            return pl.BlockSpec((1, 1, block_k, d),
                                lambda bi, hk, t, st: (bi, hk, st[1, t], 0),
                                memory_space=pltpu.VMEM)

        # Masked-edge skipping (see _fwd): inapplicable with score_mod
        # or dropout (per-block bit replay).
        sub_w = (_split_width(block_k)
                 if score_mod is None and dropout_rate == 0.0 else 0)
        steps_q = _enumerate_steps(nq, nk, block_q, block_k, offset,
                                   causal, window, order="qk", sub_w=sub_w)
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel_steps, sub_w=sub_w, **common),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, hkv, steps_q.shape[1]),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    steps_seg_spec("q"), steps_seg_spec("k"),
                    q_row_spec(d), kv_spec(), kv_spec(),
                    q_row_spec(d), q_row_spec(8), q_row_spec(8),
                ],
                out_specs=q_row_spec(d),
                scratch_shapes=[pltpu.VMEM((rows, d), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), g_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=_interpret(),
        )(jnp.asarray(steps_q), dq_scales, seed, qseg, kseg, q, k, v, do,
          lse_b, delta_b)

        steps_k = _enumerate_steps(nq, nk, block_q, block_k, offset,
                                   causal, window, order="kq", sub_w=sub_w)
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel_steps, sub_w=sub_w, **common),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, hkv, steps_k.shape[1]),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    steps_seg_spec("q"), steps_seg_spec("k"),
                    q_row_spec(d), kv_spec(), kv_spec(),
                    q_row_spec(d), q_row_spec(8), q_row_spec(8),
                ],
                out_specs=[kv_spec(), kv_spec()],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, hkv, skv, d), g_dtype),
                jax.ShapeDtypeStruct((b, hkv, skv, d), g_dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=_interpret(),
        )(jnp.asarray(steps_k), dkv_scales, seed, qseg, kseg, q, k, v, do,
          lse_b, delta_b)
        return dq, dk, dv, None

    # --- dQ: grid (b, hkv, iq, ik), group-packed q/do/dq rows ---
    if use_bias:
        bias_spec_qk = pl.BlockSpec(
            (1, group, block_q, block_k),
            lambda bi, hk, iq, ik: (bi % bias_b if bias_b > 1 else 0,
                                    hk, iq, ik),
            memory_space=pltpu.VMEM)
        bias_spec_kq = pl.BlockSpec(
            (1, group, block_q, block_k),
            lambda bi, hk, ik, iq: (bi % bias_b if bias_b > 1 else 0,
                                    hk, iq, ik),
            memory_space=pltpu.VMEM)
        dbias_spec = pl.BlockSpec(
            (1, group, block_q, block_k),
            lambda bi, hk, iq, ik: (bi, hk, iq, ik),
            memory_space=pltpu.VMEM)
        dbias_shape = jax.ShapeDtypeStruct((b, hq, sq, skv), jnp.float32)
    else:
        bias_spec_qk = pl.BlockSpec((1, 1, 8, 128),
                                    lambda bi, hk, iq, ik: (0, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
        bias_spec_kq = pl.BlockSpec((1, 1, 8, 128),
                                    lambda bi, hk, ik, iq: (0, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
        dbias_spec = pl.BlockSpec((1, 1, 8, 128),
                                  lambda bi, hk, iq, ik: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        dbias_shape = jax.ShapeDtypeStruct((1, 1, 8, 128), jnp.float32)

    dq, dbias = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, num_k_blocks=nk, use_bias=use_bias,
                          dynamic_window=dyn_win, **common),
        grid=(b, hkv, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seg_spec("q", "qk"),
            seg_spec("k", "qk"),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, 8),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, 8),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            bias_spec_qk,
        ],
        out_specs=[
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            dbias_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((b, hq, sq, d), g_dtype),
                   dbias_shape],
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qoff, dq_scales, seed, qseg, kseg, q, k, v, do, lse_b, delta_b, bias)

    # --- dK/dV: grid (b, hkv, ik, iq); group summed in-kernel ---
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_q_blocks=nq,
                          use_bias=use_bias, dynamic_window=dyn_win,
                          **common),
        grid=(b, hkv, nk, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seg_spec("q", "kq"),
            seg_spec("k", "kq"),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, ik, iq: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, ik, iq: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, ik, iq: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, ik, iq: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, 8),
                         lambda bi, hk, ik, iq: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, 8),
                         lambda bi, hk, ik, iq: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            bias_spec_kq,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, ik, iq: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, ik, iq: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv, d), g_dtype),
            jax.ShapeDtypeStruct((b, hkv, skv, d), g_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qoff, dkv_scales, seed, qseg, kseg, q, k, v, do, lse_b, delta_b, bias)

    return dq, dk, dv, (dbias if use_bias else None)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (BSHD user layout)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _flash_core(q, k, v, qseg, kseg, qoff, bias, sink, seed, scale, causal,
                window, offset, blocks, score_mod=None):
    o, _ = _flash_core_fwd(q, k, v, qseg, kseg, qoff, bias, sink, seed,
                           scale, causal, window, offset, blocks, score_mod)
    return o


def _flash_core_fwd(q, k, v, qseg, kseg, qoff, bias, sink, seed, scale,
                    causal, window, offset, blocks, score_mod=None):
    o, lse = _flash_fwd(q, k, v, qseg, kseg, qoff, bias, scale=scale,
                        causal=causal, window=window, offset=offset,
                        block_q=blocks[0], block_k=blocks[1],
                        static_pos=blocks[2], dropout_rate=blocks[3],
                        dropout_seed=seed, score_mod=score_mod,
                        softmax_sink=sink)
    return o, (q, k, v, o, lse, qseg, kseg, qoff, bias, sink, seed)


def _flash_core_bwd(scale, causal, window, offset, blocks, score_mod, res,
                    do):
    q, k, v, o, lse, qseg, kseg, qoff, bias, sink, seed = res
    dq, dk, dv, dbias = _flash_bwd(
        q, k, v, o, lse, do, qseg, kseg, qoff, bias, scale=scale,
        causal=causal, window=window, offset=offset,
        block_q=blocks[0], block_k=blocks[1],
        static_pos=blocks[2], dropout_rate=blocks[3], dropout_seed=seed,
        score_mod=score_mod)
    # The sink only enters the bwd kernels through lse, so dq/dk/dv need
    # no kernel change; the sink's own grad is p_sink * (0 - delta)
    # summed over (batch, query) — computable from the saved lse.
    dsink = None
    if sink is not None:
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), -1)
        p_sink = jnp.exp(sink.astype(jnp.float32).reshape(
            1, -1, 1) - lse)                       # (B, Hq, Sq)
        dsink = -(p_sink * delta).sum(axis=(0, 2)).astype(sink.dtype)
    if dbias is not None:
        if bias.shape[0] == 1:       # broadcast batch: reduce
            dbias = jnp.sum(dbias, axis=0, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    return dq, dk, dv, None, None, None, dbias, dsink, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)




# ---------------------------------------------------------------------------
# FP8 (quantized) flash attention core
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _fp8_core(q, k, v, qseg, kseg, qoff, quantizers, sink, seed, scale,
              causal, window, offset, blocks):
    """Flash attention with Q/K/V quantized to FP8 per-tensor inside the
    custom-VJP boundary (reference: common/fused_attn/fused_attn_fp8.cu,
    pytorch FusedAttnFunc FP8 path + NVTE_FP8_DPA_BWD). ``quantizers``
    is a (q, k, v) tuple of tensor-scaling Quantizers carried as a
    differentiable arg; its cotangent is the UPDATED quantizer state
    (overwrite-with-gradient, same convention as dense layers).
    ``sink``: optional (Hq,) softmax sink logits (sinks stay
    high-precision — only Q/K/V payloads are FP8)."""
    o, _ = _fp8_core_fwd(q, k, v, qseg, kseg, qoff, quantizers, sink, seed,
                         scale, causal, window, offset, blocks)
    return o


def _fp8_core_fwd(q, k, v, qseg, kseg, qoff, quantizers, sink, seed, scale,
                  causal, window, offset, blocks):
    from ..quantize.quantizer import QuantizeLayout
    qq = quantizers[0].quantize(q, layout=QuantizeLayout.ROWWISE)
    qk = quantizers[1].quantize(k, layout=QuantizeLayout.ROWWISE)
    qv = quantizers[2].quantize(v, layout=QuantizeLayout.ROWWISE)
    scale_invs = jnp.stack([
        qq.scale_inv.reshape(()), qk.scale_inv.reshape(()),
        qv.scale_inv.reshape(())]).astype(jnp.float32)
    o, lse = _flash_fwd(qq.data, qk.data, qv.data, qseg, kseg, qoff, None,
                        scale=scale, causal=causal, window=window,
                        offset=offset, block_q=blocks[0], block_k=blocks[1],
                        static_pos=blocks[2], scale_invs=scale_invs,
                        out_dtype=q.dtype, dropout_rate=blocks[3],
                        dropout_seed=seed, softmax_sink=sink)
    amaxes = (getattr(qq, "amax", None), getattr(qk, "amax", None),
              getattr(qv, "amax", None))
    res = (qq.data, qk.data, qv.data, scale_invs, o, lse, qseg, kseg, qoff,
           amaxes, quantizers, sink, seed)
    return o, res


def _fp8_core_bwd(scale, causal, window, offset, blocks, res, do):
    (qd, kd, vd, scale_invs, o, lse, qseg, kseg, qoff, amaxes,
     quantizers, sink, seed) = res
    dq, dk, dv, _ = _flash_bwd(qd, kd, vd, o, lse, do, qseg, kseg, qoff,
                               scale=scale, causal=causal, window=window,
                               offset=offset, block_q=blocks[0],
                               block_k=blocks[1], static_pos=blocks[2],
                               scale_invs=scale_invs, grad_dtype=do.dtype,
                               dropout_rate=blocks[3], dropout_seed=seed)
    dsink = None
    if sink is not None:
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), -1)
        p_sink = jnp.exp(sink.astype(jnp.float32).reshape(1, -1, 1) - lse)
        dsink = -(p_sink * delta).sum(axis=(0, 2)).astype(sink.dtype)
    new_quantizers = tuple(
        qz.update(a) if a is not None else qz
        for qz, a in zip(quantizers, amaxes))
    return dq, dk, dv, None, None, None, new_quantizers, dsink, None


_fp8_core.defvjp(_fp8_core_fwd, _fp8_core_bwd)


# ---------------------------------------------------------------------------
# fp8_mha: flash attention + output projection in ONE custom-VJP boundary
# (reference: recipe.fp8_mha — pytorch/attention/dot_product_attention/
# dot_product_attention.py:106-134 + common/fused_attn/fused_attn_fp8.cu).
# O is quantized at the flash epilogue (delayed scaling: in-kernel cast;
# current scaling: one post-kernel pass) and the projection GEMM + wgrad
# consume the fp8 O payload directly; bwd quantizes dO once and the flash
# bwd kernels stream the fp8 dO bytes. Keeping the projection inside the
# boundary means no fp8 payload ever crosses a custom_vjp edge (JAX
# cotangents stay bf16).
# ---------------------------------------------------------------------------

def _ts_mode():
    from ..quantize.scaling_modes import ScalingMode
    return ScalingMode.CURRENT_TENSOR_SCALING


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _fp8_mha_core(q, k, v, w, qseg, kseg, qoff, quantizers, sink, seed,
                  scale, causal, window, offset, blocks):
    """``quantizers`` = (q, k, v, o, w, g, do) tensor-scaling Quantizers;
    the cotangent is the UPDATED 7-tuple (overwrite-with-gradient).
    ``w``: (Hq*D, N) output-projection kernel. Returns (B, N, Sq)?? no —
    returns o projected as (B, Hq*D->N at Sq rows) in BHS-major form:
    (B, Sq, N) is produced by the caller's reshape (this core keeps
    (B, Sq, N))."""
    out, _ = _fp8_mha_core_fwd(q, k, v, w, qseg, kseg, qoff, quantizers,
                               sink, seed, scale, causal, window, offset,
                               blocks)
    return out


def _fp8_mha_core_fwd(q, k, v, w, qseg, kseg, qoff, quantizers, sink, seed,
                      scale, causal, window, offset, blocks):
    from ..quantize.quantizer import DelayedScaleQuantizer, QuantizeLayout
    from ..quantize.tensor import make_scaled_tensor
    from .gemm import q_dot
    qq_z, qk_z, qv_z, qo_z, qw_z, qg_z, qdo_z = quantizers
    qq = qq_z.quantize(q, layout=QuantizeLayout.ROWWISE)
    qk = qk_z.quantize(k, layout=QuantizeLayout.ROWWISE)
    qv = qv_z.quantize(v, layout=QuantizeLayout.ROWWISE)
    scale_invs = jnp.stack([
        qq.scale_inv.reshape(()), qk.scale_inv.reshape(()),
        qv.scale_inv.reshape(())]).astype(jnp.float32)
    if isinstance(qo_z, DelayedScaleQuantizer):
        # Delayed scaling: the O scale is known BEFORE the kernel runs,
        # so the epilogue casts O to fp8 in-kernel and reports the true
        # pre-quantization amax (fused_attn_fp8.cu behavior).
        o_pay, lse, o_amax = _flash_fwd(
            qq.data, qk.data, qv.data, qseg, kseg, qoff, None,
            scale=scale, causal=causal, window=window, offset=offset,
            block_q=blocks[0], block_k=blocks[1], static_pos=blocks[2],
            scale_invs=scale_invs, out_dtype=qo_z.q_dtype,
            out_scale=qo_z.scale, dropout_rate=blocks[3],
            dropout_seed=seed, softmax_sink=sink)
        so_inv = (1.0 / qo_z.scale.astype(jnp.float32)).reshape(1)
    else:
        # Current scaling: amax is data-dependent — one post-kernel
        # quantize pass over the bf16 O.
        o_bf, lse = _flash_fwd(
            qq.data, qk.data, qv.data, qseg, kseg, qoff, None,
            scale=scale, causal=causal, window=window, offset=offset,
            block_q=blocks[0], block_k=blocks[1], static_pos=blocks[2],
            scale_invs=scale_invs, out_dtype=jnp.bfloat16,
            dropout_rate=blocks[3], dropout_seed=seed, softmax_sink=sink)
        qo = qo_z.quantize(o_bf, layout=QuantizeLayout.ROWWISE)
        o_pay, so_inv = qo.data, qo.scale_inv.reshape(1)
        o_amax = getattr(qo, "amax", None)
    b, hq, sq, d = q.shape
    # Projection consumes the fp8 O payload directly: transpose payload
    # bytes (half the bf16 relayout traffic) and contract through q_dot.
    o2 = o_pay.transpose(0, 2, 1, 3).reshape(b * sq, hq * d)
    o_st = make_scaled_tensor(
        o2, so_inv, scaling_mode=_ts_mode(), dq_dtype=q.dtype)
    qw = qw_z.quantize(w, layout=QuantizeLayout.ROWWISE)
    out2 = q_dot(o_st, qw, 1, 0)               # (M, K) x (K, N) f32
    out = out2.reshape(b, sq, w.shape[1]).astype(q.dtype)
    amaxes = (getattr(qq, "amax", None), getattr(qk, "amax", None),
              getattr(qv, "amax", None), o_amax, getattr(qw, "amax", None))
    res = (qq.data, qk.data, qv.data, scale_invs, o_pay, so_inv, lse,
           qw.data, qw.scale_inv.reshape(1), qseg, kseg, qoff, amaxes,
           quantizers, sink, seed, Static((q.dtype, w.shape, w.dtype)))
    return out, res


def _fp8_mha_core_bwd(scale, causal, window, offset, blocks, res, g):
    from ..quantize.quantizer import QuantizeLayout
    from ..quantize.tensor import make_scaled_tensor
    from .gemm import q_dot
    (qd, kd, vd, scale_invs, o_pay, so_inv, lse, w_pay, sw_inv, qseg, kseg,
     qoff, amaxes, quantizers, sink, seed, meta) = res
    q_dtype, w_shape, w_dtype = meta.value
    qq_z, qk_z, qv_z, qo_z, qw_z, qg_z, qdo_z = quantizers
    b, hq, sq, d = qd.shape
    n = w_shape[1]
    g2 = g.reshape(b * sq, n)
    qg = qg_z.quantize(g2, layout=QuantizeLayout.ROWWISE)
    o2_st = make_scaled_tensor(
        o_pay.transpose(0, 2, 1, 3).reshape(b * sq, hq * d), so_inv,
        scaling_mode=_ts_mode(), dq_dtype=q_dtype)
    g_st = make_scaled_tensor(qg.data, qg.scale_inv.reshape(1),
                              scaling_mode=_ts_mode(), dq_dtype=q_dtype)
    dw = q_dot(o2_st, g_st, 0, 0).reshape(w_shape).astype(w_dtype)
    w_st = make_scaled_tensor(w_pay, sw_inv, scaling_mode=_ts_mode(),
                              dq_dtype=q_dtype)
    do2 = q_dot(g_st, w_st, 1, 1)              # (M, N) x (K, N) -> (M, K)
    do4 = do2.reshape(b, sq, hq, d).transpose(0, 2, 1, 3).astype(
        jnp.bfloat16)
    qdo = qdo_z.quantize(do4, layout=QuantizeLayout.ROWWISE)
    dq, dk, dv, _ = _flash_bwd(
        qd, kd, vd, o_pay, lse, qdo.data, qseg, kseg, qoff,
        scale=scale, causal=causal, window=window, offset=offset,
        block_q=blocks[0], block_k=blocks[1], static_pos=blocks[2],
        scale_invs=scale_invs, grad_dtype=q_dtype,
        dropout_rate=blocks[3], dropout_seed=seed,
        o_scale_inv=so_inv, do_scale_inv=qdo.scale_inv)
    dsink = None
    if sink is not None:
        delta = (jnp.sum(qdo.data.astype(jnp.float32)
                         * o_pay.astype(jnp.float32), -1)
                 * (so_inv.reshape(()) * qdo.scale_inv.reshape(())))
        p_sink = jnp.exp(sink.astype(jnp.float32).reshape(1, -1, 1) - lse)
        dsink = -(p_sink * delta).sum(axis=(0, 2)).astype(sink.dtype)
    upd = list(quantizers)
    for i, (qz, a) in enumerate(zip(
            (qq_z, qk_z, qv_z, qo_z, qw_z), amaxes)):
        if a is not None:
            upd[i] = qz.update(a)
    a_g = getattr(qg, "amax", None)
    if a_g is not None:
        upd[5] = qg_z.update(a_g)
    a_do = getattr(qdo, "amax", None)
    if a_do is not None:
        upd[6] = qdo_z.update(a_do)
    return (dq, dk, dv, dw, None, None, None, tuple(upd), dsink, None)


_fp8_mha_core.defvjp(_fp8_mha_core_fwd, _fp8_mha_core_bwd)


def flash_attention(
    q: jax.Array,   # (B, Sq, Hq, D)
    k: jax.Array,   # (B, Skv, Hkv, D)
    v: jax.Array,
    sequence_descriptor=None,
    *,
    attn_mask_type=None,
    scaling_factor: Optional[float] = None,
    window_size: Optional[Tuple[int, int]] = None,
    q_position_offset=None,
    bias: Optional[jax.Array] = None,   # (B|1, Hq, Sq, Skv) post-scale;
                                        # fwd + dbias bwd in-kernel
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    qkv_quantizers=None,
    dropout_probability: float = 0.0,
    dropout_seed=None,     # PRNG key or (2,) int32; required if rate > 0
    score_mod=None,        # score_mod(s, b, h, q_idx, kv_idx) traced
                           # into the kernel (arithmetic-only: no gathers)
    softmax_type=None,     # attention.SoftmaxType; sink types run
                           # in-kernel (one virtual no-value key)
    softmax_offset=None,   # (Hq,) learnable sink logits
    mha_proj=None,         # fp8_mha: (w_out (Hq*D, N), 7-tuple of
                           # quantizers q/k/v/o/w/g/do) — runs attention
                           # + output projection in one fp8 boundary and
                           # returns (B, Sq, N) instead of (B, Sq, Hq, D)
) -> jax.Array:
    """Flash attention over BSHD inputs. Masking comes from
    ``attn_mask_type`` (+ optional seqlens / segment ids in
    ``sequence_descriptor``) and ``window_size``; see
    transformerengine_tpu.attention for the taxonomy.

    ``qkv_quantizers``: optional (q, k, v) tuple of tensor-scaling
    Quantizers — runs the FP8 fused-attention path (payloads enter the
    MXU, dequant scales folded into the softmax multiplier in VMEM;
    reference: common/fused_attn/fused_attn_fp8.cu)."""
    from ..attention import AttnMaskType  # local import to avoid cycle

    if attn_mask_type is None:
        attn_mask_type = AttnMaskType.NO_MASK
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    causal = attn_mask_type.is_causal
    offset = skv - sq if attn_mask_type.is_bottom_right else 0
    window = tuple(window_size) if window_size is not None else (-1, -1)

    qseg = kseg = None
    if sequence_descriptor is not None:
        if sequence_descriptor.q_segment_ids is not None:
            qseg = sequence_descriptor.q_segment_ids.astype(jnp.int32)
            kseg = sequence_descriptor.kv_segment_ids.astype(jnp.int32)
        elif sequence_descriptor.q_seqlens is not None:
            qlens = sequence_descriptor.q_seqlens
            klens = (sequence_descriptor.kv_seqlens
                     if sequence_descriptor.kv_seqlens is not None else qlens)
            qseg = (jnp.arange(sq)[None, :] < qlens[:, None]).astype(jnp.int32)
            kseg = (jnp.arange(skv)[None, :] < klens[:, None]).astype(jnp.int32)
    if attn_mask_type.is_padding and qseg is None:
        raise ValueError("padding mask requires a sequence_descriptor")

    # Pad sequence lengths to block multiples; padded tokens get segment 0.
    hkv = k.shape[2]
    eff_bq, eff_bk = _effective_blocks(
        sq, skv, hq // hkv if hq % hkv == 0 else 1, block_q, block_k)
    sq_p = _ceil_to(sq, eff_bq)
    skv_p = _ceil_to(skv, eff_bk)
    if bias is not None and (sq_p != sq or skv_p != skv):
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, sq_p - sq),
                              (0, skv_p - skv)))
    if sq_p != sq or skv_p != skv:
        if qseg is None:
            qseg = jnp.ones((b, sq), jnp.int32)
            kseg = jnp.ones((b, skv), jnp.int32)
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0), (0, 0)))
        qseg = jnp.pad(qseg, ((0, 0), (0, sq_p - sq)))
        kseg = jnp.pad(kseg, ((0, 0), (0, skv_p - skv)))

    scale = scaling_factor if scaling_factor is not None else 1.0 / d**0.5
    if q_position_offset is None:
        qoff = jnp.zeros((1,), jnp.int32)
    else:
        qoff = jnp.asarray(q_position_offset, jnp.int32).reshape(1)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    rate = float(dropout_probability)
    if rate > 0.0:
        if dropout_seed is None:
            raise ValueError("flash attention dropout requires an explicit "
                             "dropout_seed (a silent default would reuse "
                             "the same mask every step)")
        seed = dropout_seed
        if hasattr(seed, "dtype") and jnp.issubdtype(seed.dtype,
                                                     jax.dtypes.prng_key):
            seed = jax.random.key_data(seed)
        seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:2]
        seed = jnp.pad(seed, (0, 2 - seed.shape[0]))
    else:
        seed = jnp.zeros((2,), jnp.int32)
    blocks = (block_q, block_k, q_position_offset is None, rate)
    sink = None
    if softmax_type is not None:
        from ..attention import SoftmaxType as _ST
        if softmax_type is _ST.OFF_BY_ONE:
            sink = jnp.zeros((hq,), jnp.float32)
        elif softmax_type is _ST.LEARNABLE:
            assert softmax_offset is not None, (
                "LEARNABLE softmax requires softmax_offset (Hq,)")
            sink = jnp.asarray(softmax_offset).reshape(hq)
    if score_mod is not None:
        assert qkv_quantizers is None, (
            "score_mod is not supported on the FP8 flash path")
        assert bias is None, (
            "score_mod and bias are mutually exclusive; fold the bias "
            "into the mod or use the bias argument alone")
    if mha_proj is not None:
        assert bias is None and score_mod is None, (
            "fp8_mha does not take a bias or score_mod")
        w_out, quantizers7 = mha_proj
        for qz in quantizers7:
            assert qz.scaling_mode.is_tensor_scaling, (
                "fp8_mha requires per-tensor scaling quantizers, got "
                f"{qz.scaling_mode}")
        out = _fp8_mha_core(qt, kt, vt, w_out, qseg, kseg, qoff,
                            tuple(quantizers7), sink, seed, float(scale),
                            causal, window, offset, blocks)
        if sq_p != sq:
            out = out[:, :sq]
        return out
    if qkv_quantizers is not None:
        assert bias is None, "FP8 flash attention does not take a bias"
        for qz in qkv_quantizers:
            assert qz.scaling_mode.is_tensor_scaling, (
                "FP8 flash attention requires per-tensor scaling "
                f"quantizers, got {qz.scaling_mode}")
        o = _fp8_core(qt, kt, vt, qseg, kseg, qoff, tuple(qkv_quantizers),
                      sink, seed, float(scale), causal, window, offset,
                      blocks)
    else:
        o = _flash_core(qt, kt, vt, qseg, kseg, qoff, bias, sink, seed,
                        float(scale), causal, window, offset, blocks,
                        score_mod)
    o = o.transpose(0, 2, 1, 3)
    if sq_p != sq:
        o = o[:, :sq]
    return o
