"""Context-parallel attention: all-gather and ring (P2P) strategies.

TPU re-design of the reference's context parallelism (reference:
pytorch/attention/dot_product_attention/context_parallel.py —
AttnFuncWithCPAndKVP2P :1407 / AttnFuncWithCPAndKVAllGather :3018;
jax/cpp_extensions/attention.py FusedRingAttnFwd/BwdPrimitive
:2543/:2758). Both strategies run *inside* ``shard_map`` over the cp
mesh axis with the sequence dimension sharded:

* **all-gather**: KV all-gathered over ICI, one flash call with a
  dynamic q-position offset. Backward reduce-scatters dKV via AD.
* **ring**: KV chunks rotate around the ring with ``lax.ppermute`` while
  each device computes partial attention against the resident chunk and
  merges online in log-sum-exp space. The backward runs the same ring,
  with the dKV accumulator co-rotating with its chunk so it arrives home
  fully reduced after cp steps (the reference's P2P ring equivalent —
  XLA overlaps the ppermute with the next step's compute).

Causal load balancing across ranks uses the striped/dual-chunk reorders
in ``attention_utils.py`` at the caller level.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.flash_attention import NEG_INF, _flash_bwd, _flash_fwd


def _bhsd(x):
    return x.transpose(0, 2, 1, 3)


def _local_segments(sequence_descriptor, axis_name, L, *,
                    allow_seqlens=True, positions=None):
    """(qseg, kseg) (B, L) int32 for the LOCAL shard, or (None, None).
    Segment ids are used as-is; seqlens are interpreted as GLOBAL
    lengths under contiguous sharding (rank idx keeps positions
    idx*L..idx*L+L-1)."""
    if sequence_descriptor is None:
        return None, None
    sd = sequence_descriptor
    if sd.q_segment_ids is not None:
        qseg = sd.q_segment_ids.astype(jnp.int32)
        kseg = (sd.kv_segment_ids if sd.kv_segment_ids is not None
                else sd.q_segment_ids).astype(jnp.int32)
        return qseg, kseg
    if sd.q_seqlens is not None:
        if positions is None:
            assert allow_seqlens, (
                "this CP strategy needs segment ids or an explicit "
                "position map for its sharding layout")
            idx = jax.lax.axis_index(axis_name)
            positions = idx * L + jnp.arange(L)
        pos = positions
        qlens = sd.q_seqlens
        klens = sd.kv_seqlens if sd.kv_seqlens is not None else qlens
        qseg = (pos[None, :] < qlens[:, None]).astype(jnp.int32)
        kseg = (pos[None, :] < klens[:, None]).astype(jnp.int32)
        return qseg, kseg
    return None, None


# ---------------------------------------------------------------------------
# All-gather strategy
# ---------------------------------------------------------------------------

def all_gather_attn(
    q: jax.Array,     # (B, L, Hq, D) local sequence shard
    k: jax.Array,     # (B, L, Hkv, D)
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    scaling_factor: Optional[float] = None,
    window_size: Optional[Tuple[int, int]] = None,
    sequence_descriptor=None,
    softmax_sink=None,
    bias=None,          # (B|1, Hq, L_local, S_total) post-scale bias
    score_mod=None,
    fp8_dpa: bool = False,
) -> jax.Array:
    """(reference: AttnFuncWithCPAndKVAllGather, context_parallel.py:3018)

    ``fp8_dpa``: quantize Q/K/V per-tensor e4m3 against globally-reduced
    amaxes, all-gather the fp8 KV payloads (HALF the ICI bytes) and run
    the fp8 flash kernel on them (reference: FP8 attention under CP).
    Ignored when a bias/score_mod is present (the fp8 kernel takes
    neither).

    ``sequence_descriptor`` describes the LOCAL shard; the kv segment
    ids ride the same all-gather as K/V so ragged/packed batches mask
    correctly against the full gathered sequence. ``softmax_sink``
    passes straight into the local flash call (every rank holds all
    heads and a full softmax row)."""
    from ..attention import AttnMaskType, SequenceDescriptor, SoftmaxType
    from ..ops.flash_attention import flash_attention

    idx = jax.lax.axis_index(axis_name)
    L = q.shape[1]
    use_fp8 = fp8_dpa and bias is None and score_mod is None
    qkv_quantizers = None
    if use_fp8:
        from ..quantize.dtypes import float8_e4m3
        from ..quantize.quantizer import (CurrentScaleQuantizer,
                                          QuantizeLayout)
        from ..quantize.scaling_modes import ScalingMode
        # Quantize K/V against the global amax BEFORE the gather so the
        # fp8 payloads ride the ICI (half the gather bytes) and share
        # one scale; flash re-quantizes nothing (payload-direct via
        # qkv_quantizers would re-quantize, so call the kernel path
        # explicitly through a quantizer whose scale is pinned).
        k_pay, ks = _kv_q_global(k, axis_name)
        v_pay, vs = _kv_q_global(v, axis_name)
        k = _kv_dq(jax.lax.all_gather(k_pay, axis_name, axis=1, tiled=True),
                   ks, q.dtype)
        v = _kv_dq(jax.lax.all_gather(v_pay, axis_name, axis=1, tiled=True),
                   vs, q.dtype)
        k_full, v_full = k, v
        mk = lambda: CurrentScaleQuantizer(
            scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
            q_layout=QuantizeLayout.ROWWISE,
            q_dtype=jnp.dtype(float8_e4m3))
        qkv_quantizers = (mk(), mk(), mk())
    else:
        k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    qseg, kseg = _local_segments(sequence_descriptor, axis_name, L)
    sd = None
    if qseg is not None:
        kseg_full = jax.lax.all_gather(kseg, axis_name, axis=1, tiled=True)
        sd = SequenceDescriptor(q_segment_ids=qseg,
                                kv_segment_ids=kseg_full)
    return flash_attention(
        q, k_full, v_full, sd,
        qkv_quantizers=qkv_quantizers,
        attn_mask_type=(AttnMaskType.CAUSAL if causal
                        else AttnMaskType.NO_MASK),
        scaling_factor=scaling_factor,
        window_size=window_size,
        q_position_offset=idx * L,
        bias=bias,
        score_mod=score_mod,
        softmax_type=(SoftmaxType.LEARNABLE if softmax_sink is not None
                      else None),
        softmax_offset=softmax_sink)


# ---------------------------------------------------------------------------
# Ring strategy
# ---------------------------------------------------------------------------

def _ring_perm(cp):
    return [(d, (d + 1) % cp) for d in range(cp)]


def _ring_qoff(idx, j, L, striped):
    """Per-step q-position offset for the resident chunk.

    Contiguous sharding: chunk j holds absolute kv positions [j*L, ...)
    and rank idx's q starts at idx*L — the kernel's qpos = row + qoff
    with qoff = (idx - j)*L reproduces the global causal mask.

    Striped sharding (Striped Attention; reference
    cpp_extensions/attention.py:1293 reorder_causal_striped): rank r's
    token i sits at global position r + i*cp, so between ranks the
    causal rule collapses to plain causal when j <= idx and STRICT
    causal when j > idx — expressed as qoff = -1."""
    if striped:
        return jnp.where(j <= idx, 0, -1).reshape(1).astype(jnp.int32)
    return ((idx - j) * L).reshape(1).astype(jnp.int32)


def _ring_striped_window(window, idx, j, cp, qoff0):
    """Local-index sliding-window bounds for the striped layout
    (reference: cpp_extensions/attention.py:2991 — SWA positional
    adjustment under CP). Rank r's local token i sits at global
    position r + i*cp, so against resident chunk j (delta = idx - j)
    the global window (w0, w1) collapses to local-index bounds
        iq - ik <= floor((w0 - delta)/cp)
        ik - iq <= floor((w1 + delta)/cp).
    The kernel masks on qpos = iq + qoff, so the striped causal qoff
    ({0, -1}) is folded back into the bounds. The results are traced
    (delta depends on axis_index); the flash kernels take them through
    the dynamic-window SMEM path."""
    delta = idx - j
    w0, w1 = window
    w0d = (jnp.floor_divide(w0 - delta, cp) + qoff0) if w0 >= 0 else -1
    w1d = (jnp.floor_divide(w1 + delta, cp) - qoff0) if w1 >= 0 else -1
    return (w0d, w1d)


def _kv_q(t):
    """Per-tensor current-scale e4m3 quantize of a local KV chunk
    (reference: fp8 context parallelism — quantized P2P payloads,
    common/fused_attn fp8 CP). Returns (payload, scale_inv scalar)."""
    from ..quantize.dtypes import float8_e4m3
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)))
    scale_inv = jnp.where(amax > 0, amax / 448.0, 1.0)
    payload = (t.astype(jnp.float32) / scale_inv).astype(
        jnp.dtype(float8_e4m3))
    return payload, scale_inv.astype(jnp.float32)


def _kv_dq(payload, scale_inv, dtype):
    return (payload.astype(jnp.bfloat16)
            * scale_inv.astype(jnp.bfloat16)).astype(dtype)


def _kv_q_global(t, axis_name):
    """Per-tensor e4m3 quantize against the GLOBALLY (pmax) reduced
    amax: every rank's payload shares one scale, so gathered/a2a'd
    payloads form a single consistently-scaled tensor (the same
    contract as collectives.sequence_parallel_gather_quantize)."""
    from ..quantize.dtypes import float8_e4m3
    amax = jax.lax.pmax(jnp.max(jnp.abs(t.astype(jnp.float32))), axis_name)
    scale_inv = jnp.where(amax > 0, amax / 448.0, 1.0)
    payload = (t.astype(jnp.float32) / scale_inv).astype(
        jnp.dtype(float8_e4m3))
    return payload, scale_inv.astype(jnp.float32)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def ring_attn(q, k, v, qseg, kseg, sink, bias, axis_name: str, causal: bool,
              scale: float, window: Tuple[int, int], striped: bool = False,
              fp8_kv: bool = False, score_mod=None):
    """``qseg``/``kseg``: optional (B, L) int32 segment ids of the LOCAL
    shard (0 = padding); kseg rotates around the ring with its KV chunk,
    so packed/ragged (THD-style) batches work under ring CP (reference:
    nvte_cp_thd_* helpers, common/fused_attn/context_parallel.cu).

    ``sink``: optional (Hq,) softmax sink logits — the sink is one
    virtual no-value key PER QUERY ROW, so under ring CP it joins once
    in the final LSE merge, not per chunk. Differentiable (its grad
    comes from the merged lse).

    ``fp8_kv``: rotate K/V around the ring as e4m3 payloads with one
    per-chunk scale each — halves the P2P bytes — AND run the local
    flash step on the fp8 payloads directly (q quantized once per rank;
    the per-chunk K/V scales fold into the kernel's score multiplier) —
    the reference's FP8 attention compute under CP
    (context_parallel.py FP8 paths + fused_attn_fp8.cu). With a bias or
    score_mod the local step falls back to dequantized bf16 compute
    (the fp8 kernel takes neither).

    ``bias``: optional post-scale bias for the LOCAL q rows over the
    FULL kv length, (B|1, Hq, L, S_total) — each ring step slices the
    resident chunk's columns (reference: per-step bias chunking,
    context_parallel.py:862-911). Contiguous sharding only (striped
    interleaves positions, so a column slice is not a chunk).

    ``score_mod``: optional arithmetic score mod traced into the local
    flash kernels; the per-step q-position offset flows into its
    qpos/kpos arguments, so position-dependent mods (ALiBi) see GLOBAL
    positions (reference: ALiBi under CP)."""
    out, _ = _ring_attn_fwd(q, k, v, qseg, kseg, sink, bias, axis_name,
                            causal, scale, window, striped, fp8_kv,
                            score_mod)
    return out


def _ring_attn_fwd(q, k, v, qseg, kseg, sink, bias, axis_name, causal,
                   scale, window, striped, fp8_kv=False, score_mod=None):
    if bias is not None:
        assert not striped, "bias under striped ring CP is unsupported"
    cp = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, L, hq, d = q.shape
    assert L % 8 == 0, f"ring attention needs 8-aligned local seqlen, got {L}"
    qt, kt, vt = _bhsd(q), _bhsd(k), _bhsd(v)
    use_segs = qseg is not None

    num = jnp.zeros((b, hq, L, d), jnp.float32)
    den = jnp.zeros((b, hq, L), jnp.float32)
    m_run = jnp.full((b, hq, L), NEG_INF, jnp.float32)
    # fp8 COMPUTE is possible when the kernel's fp8 path applies
    # (no bias / score_mod — it takes neither).
    fp8_compute = fp8_kv and bias is None and score_mod is None
    if fp8_kv:
        k_cur, ks_cur = _kv_q(kt)
        v_cur, vs_cur = _kv_q(vt)
    else:
        k_cur, v_cur = kt, vt
        ks_cur = vs_cur = jnp.float32(1.0)
    if fp8_compute:
        q_pay, qs_inv = _kv_q(qt)
    kseg_cur = kseg if use_segs else jnp.zeros((b, L), jnp.int32)
    for s in range(cp):
        j = (idx - s) % cp                       # chunk resident this step
        qoff = _ring_qoff(idx, j, L, striped)
        win_s = window
        if striped and (window[0] >= 0 or window[1] >= 0):
            win_s = _ring_striped_window(window, idx, j, cp, qoff[0])
        bias_s = None
        if bias is not None:
            bias_s = jax.lax.dynamic_slice_in_dim(bias, j * L, L, axis=3)
        if fp8_compute:
            # FP8 local flash step: payloads straight into the kernel,
            # per-chunk scales folded into the score multiplier.
            o_s, lse_s = _flash_fwd(
                q_pay, k_cur, v_cur,
                qseg if use_segs else None,
                kseg_cur if use_segs else None,
                qoff, None, scale=scale, causal=causal,
                window=win_s, offset=0, block_q=512, block_k=512,
                scale_invs=jnp.stack([qs_inv, ks_cur, vs_cur]
                                     ).astype(jnp.float32),
                out_dtype=q.dtype)
        else:
            k_use = _kv_dq(k_cur, ks_cur, kt.dtype) if fp8_kv else k_cur
            v_use = _kv_dq(v_cur, vs_cur, vt.dtype) if fp8_kv else v_cur
            o_s, lse_s = _flash_fwd(
                qt, k_use, v_use,
                qseg if use_segs else None,
                kseg_cur if use_segs else None,
                qoff, bias_s, scale=scale, causal=causal,
                window=win_s, offset=0, block_q=512, block_k=512,
                score_mod=score_mod)
        m_new = jnp.maximum(m_run, lse_s)
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        alpha = jnp.where(m_run <= NEG_INF / 2, 0.0,
                          jnp.exp(m_run - m_safe))
        w = jnp.where(lse_s <= NEG_INF / 2, 0.0, jnp.exp(lse_s - m_safe))
        num = num * alpha[..., None] + o_s.astype(jnp.float32) * w[..., None]
        den = den * alpha + w
        m_run = m_new
        if s != cp - 1:
            if fp8_kv:
                k_cur, v_cur, kseg_cur, ks_cur, vs_cur = jax.lax.ppermute(
                    (k_cur, v_cur, kseg_cur, ks_cur, vs_cur), axis_name,
                    perm=_ring_perm(cp))
            else:
                k_cur, v_cur, kseg_cur = jax.lax.ppermute(
                    (k_cur, v_cur, kseg_cur), axis_name,
                    perm=_ring_perm(cp))

    if sink is not None:
        # Sink merge: one virtual key per (head, row) with logit s0 and
        # no value joins the TOTAL denominator (same epilogue math as
        # the flash kernel's in-kernel sink).
        s0 = sink.astype(jnp.float32).reshape(1, hq, 1)
        m2 = jnp.maximum(m_run, jnp.broadcast_to(s0, m_run.shape))
        alpha = jnp.where(m_run <= NEG_INF / 2, 0.0, jnp.exp(m_run - m2))
        den2 = den * alpha + jnp.exp(s0 - m2)        # > 0 everywhere
        o = ((num * alpha[..., None]) / den2[..., None]).astype(q.dtype)
        lse_tot = m2 + jnp.log(den2)
    else:
        den_safe = jnp.where(den > 0, den, 1.0)
        o = (num / den_safe[..., None]).astype(q.dtype)
        lse_tot = jnp.where(den > 0, m_run + jnp.log(den_safe), NEG_INF)
    out = o.transpose(0, 2, 1, 3)
    return out, (q, k, v, qseg, kseg, sink, bias, o, lse_tot)


def _ring_attn_bwd(axis_name, causal, scale, window, striped, fp8_kv,
                   score_mod, res, dout):
    q, k, v, qseg, kseg, sink, bias, o, lse = res
    cp = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, L, hq, d = q.shape
    qt, kt, vt = _bhsd(q), _bhsd(k), _bhsd(v)
    dot = _bhsd(dout)
    use_segs = qseg is not None

    dq = jnp.zeros_like(qt, jnp.float32)
    dk_acc = jnp.zeros_like(kt, jnp.float32)
    dv_acc = jnp.zeros_like(vt, jnp.float32)
    dbias = (jnp.zeros((b, hq, L, bias.shape[3]), jnp.float32)
             if bias is not None else None)
    fp8_compute = fp8_kv and bias is None and score_mod is None
    if fp8_kv:
        # Same quantization as fwd: the local flash bwd differentiates
        # the exact fwd computation.
        k_cur, ks_cur = _kv_q(kt)
        v_cur, vs_cur = _kv_q(vt)
    else:
        k_cur, v_cur = kt, vt
        ks_cur = vs_cur = jnp.float32(1.0)
    if fp8_compute:
        q_pay, qs_inv = _kv_q(qt)
    kseg_cur = kseg if use_segs else jnp.zeros((b, L), jnp.int32)
    for s in range(cp):
        j = (idx - s) % cp
        qoff = _ring_qoff(idx, j, L, striped)
        win_s = window
        if striped and (window[0] >= 0 or window[1] >= 0):
            win_s = _ring_striped_window(window, idx, j, cp, qoff[0])
        bias_s = None
        if bias is not None:
            bias_s = jax.lax.dynamic_slice_in_dim(bias, j * L, L, axis=3)
        if fp8_compute:
            dq_s, dk_s, dv_s, dbias_s = _flash_bwd(
                q_pay, k_cur, v_cur, o, lse, dot,
                qseg if use_segs else None,
                kseg_cur if use_segs else None,
                qoff, None, scale=scale,
                causal=causal, window=win_s, offset=0, block_q=512,
                block_k=512,
                scale_invs=jnp.stack([qs_inv, ks_cur, vs_cur]
                                     ).astype(jnp.float32),
                grad_dtype=q.dtype)
        else:
            k_use = _kv_dq(k_cur, ks_cur, kt.dtype) if fp8_kv else k_cur
            v_use = _kv_dq(v_cur, vs_cur, vt.dtype) if fp8_kv else v_cur
            dq_s, dk_s, dv_s, dbias_s = _flash_bwd(
                qt, k_use, v_use, o, lse, dot,
                qseg if use_segs else None,
                kseg_cur if use_segs else None,
                qoff, bias_s, scale=scale,
                causal=causal, window=win_s, offset=0, block_q=512,
                block_k=512,
                score_mod=score_mod)
        if dbias is not None:
            dbias = jax.lax.dynamic_update_slice_in_dim(
                dbias, dbias_s.astype(jnp.float32), j * L, axis=3)
        dq = dq + dq_s.astype(jnp.float32)
        dk_acc = dk_acc + dk_s.astype(jnp.float32)
        dv_acc = dv_acc + dv_s.astype(jnp.float32)
        # Rotate the KV chunk together with its gradient accumulator; after
        # the final rotation (cp total) both are back at the owner.
        if fp8_kv:
            (k_cur, v_cur, kseg_cur, ks_cur, vs_cur, dk_acc,
             dv_acc) = jax.lax.ppermute(
                (k_cur, v_cur, kseg_cur, ks_cur, vs_cur, dk_acc, dv_acc),
                axis_name, perm=_ring_perm(cp))
        else:
            k_cur, v_cur, kseg_cur, dk_acc, dv_acc = jax.lax.ppermute(
                (k_cur, v_cur, kseg_cur, dk_acc, dv_acc), axis_name,
                perm=_ring_perm(cp))

    dsink = None
    if sink is not None:
        # lse already includes the sink; its grad is -p_sink * delta
        # summed over this rank's (batch, rows). NO psum here: the
        # shard_map transpose of a replicated input already sums the
        # per-rank cotangents (an inner psum would multiply by cp).
        delta = jnp.sum(dot.astype(jnp.float32) * o.astype(jnp.float32), -1)
        p_sink = jnp.exp(sink.astype(jnp.float32).reshape(1, -1, 1) - lse)
        dsink = (-(p_sink * delta).sum(axis=(0, 2))).astype(sink.dtype)
    if dbias is not None and bias.shape[0] == 1:
        # Broadcast-over-batch bias: reduce the per-batch kernel grad.
        # NO psum: the shard_map transpose of a replicated bias input
        # sums per-rank cotangents (each rank owns disjoint q rows).
        dbias = jnp.sum(dbias, axis=0, keepdims=True)
    return (dq.transpose(0, 2, 1, 3).astype(q.dtype),
            dk_acc.transpose(0, 2, 1, 3).astype(k.dtype),
            dv_acc.transpose(0, 2, 1, 3).astype(v.dtype),
            None, None, dsink,
            dbias.astype(bias.dtype) if dbias is not None else None)


ring_attn.defvjp(_ring_attn_fwd, _ring_attn_bwd)


def ring_attn_under_shard_map(
    q, k, v, sequence_descriptor=None, *, axis_name: str,
    attn_mask_type=None, scaling_factor: Optional[float] = None,
    window_size: Optional[Tuple[int, int]] = None,
    striped: bool = False,
    fp8_kv: bool = False,
    softmax_sink=None,
    bias=None,          # (B|1, Hq, L_local, S_total) post-scale bias
    score_mod=None,     # ALiBi etc. — sees GLOBAL positions per step
):
    """Entry used by attention.fused_attn for CPStrategy.RING /
    RING_STRIPED. ``sequence_descriptor`` describes the LOCAL shard:
    segment ids are used as-is; seqlens are interpreted as GLOBAL
    lengths under contiguous sharding (each rank keeps positions
    idx*L..idx*L+L-1). ``fp8_kv`` rotates e4m3 KV payloads (half the
    ring bytes). ``softmax_sink``: (Hq,) sink logits, merged once after
    the ring."""
    from ..attention import AttnMaskType
    causal = attn_mask_type.is_causal if attn_mask_type else False
    scale = scaling_factor if scaling_factor is not None \
        else 1.0 / q.shape[-1] ** 0.5
    window = tuple(window_size) if window_size is not None else (-1, -1)
    positions = None
    if striped and sequence_descriptor is not None \
            and getattr(sequence_descriptor, "q_segment_ids", None) is None:
        # Ragged (seqlens-only) THD batches under the striped layout:
        # rank r's token i sits at global position r + i*cp, so local
        # padding segments derive directly from the global lengths
        # (reference: nvte_cp_thd_* helpers, common/fused_attn/
        # context_parallel.cu — THD descriptors under CP).
        cp = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        positions = idx + jnp.arange(q.shape[1]) * cp
    qseg, kseg = _local_segments(sequence_descriptor, axis_name,
                                 q.shape[1], positions=positions)
    return ring_attn(q, k, v, qseg, kseg, softmax_sink, bias, axis_name,
                     causal, float(scale), window, striped, fp8_kv,
                     score_mod)


# ---------------------------------------------------------------------------
# Ulysses (A2A) strategy
# ---------------------------------------------------------------------------

def ulysses_attn(
    q: jax.Array,     # (B, L, Hq, D) local sequence shard
    k: jax.Array,     # (B, L, Hkv, D)
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    scaling_factor=None,
    window_size=None,
    sequence_descriptor=None,
    softmax_sink=None,
    fp8_dpa: bool = False,
) -> jax.Array:
    """Ulysses-style context parallelism: all-to-all reshards
    heads<->sequence so each device runs full-sequence attention on a
    head slice (reference: AttnFuncWithCPAndQKVOA2A,
    context_parallel.py:3877, flash_attn_a2a_communicate :438).
    Differentiable through the all-to-alls (AD reverses them).

    ``sequence_descriptor`` describes the LOCAL shard; segment ids are
    all-gathered to full length alongside the a2a (the gather order
    matches the a2a's tiled sequence concatenation), so padded/packed
    batches no longer silently attend to padding.

    ``softmax_sink``: (Hq,) global sink logits; each rank slices its
    heads after the a2a reshard."""
    from ..attention import AttnMaskType, SequenceDescriptor, SoftmaxType
    from ..ops.flash_attention import flash_attention

    p = jax.lax.axis_size(axis_name)
    b, l, hq, d = q.shape
    hkv = k.shape[2]
    assert hq % p == 0 and hkv % p == 0, (
        f"Ulysses needs head counts divisible by cp={p}, got {hq}/{hkv}")

    def seq_to_head(x):
        # (B, L, H, D) -> (B, L*p, H/p, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    def head_to_seq(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    qseg, kseg = _local_segments(sequence_descriptor, axis_name, l)
    sd = None
    if qseg is not None:
        sd = SequenceDescriptor(
            q_segment_ids=jax.lax.all_gather(qseg, axis_name, axis=1,
                                             tiled=True),
            kv_segment_ids=jax.lax.all_gather(kseg, axis_name, axis=1,
                                              tiled=True))
    qkv_quantizers = None
    if fp8_dpa:
        # FP8 payloads on the a2a wires (half the ICI bytes) + fp8 flash
        # compute; quantized against globally-reduced amaxes so the
        # resharded payloads share one scale. The dequant-then-
        # requantize inside flash is exact (same amax -> same scale).
        from ..quantize.dtypes import float8_e4m3
        from ..quantize.quantizer import (CurrentScaleQuantizer,
                                          QuantizeLayout)
        from ..quantize.scaling_modes import ScalingMode
        q_pay, qs = _kv_q_global(q, axis_name)
        k_pay, ks = _kv_q_global(k, axis_name)
        v_pay, vs = _kv_q_global(v, axis_name)
        qg = _kv_dq(seq_to_head(q_pay), qs, q.dtype)
        kg = _kv_dq(seq_to_head(k_pay), ks, q.dtype)
        vg = _kv_dq(seq_to_head(v_pay), vs, q.dtype)
        mk = lambda: CurrentScaleQuantizer(
            scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
            q_layout=QuantizeLayout.ROWWISE,
            q_dtype=jnp.dtype(float8_e4m3))
        qkv_quantizers = (mk(), mk(), mk())
    else:
        qg, kg, vg = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    sink_local = None
    if softmax_sink is not None:
        idx = jax.lax.axis_index(axis_name)
        sink_local = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(softmax_sink, jnp.float32), idx * (hq // p),
            hq // p)
    out = flash_attention(
        qg, kg, vg, sd,
        attn_mask_type=(AttnMaskType.CAUSAL if causal
                        else AttnMaskType.NO_MASK),
        scaling_factor=scaling_factor, window_size=window_size,
        qkv_quantizers=qkv_quantizers,
        softmax_type=(SoftmaxType.LEARNABLE if sink_local is not None
                      else None),
        softmax_offset=sink_local)
    return head_to_seq(out)


def hierarchical_attn(
    q: jax.Array,     # (B, L, Hq, D) — seq sharded over BOTH cp axes
    k: jax.Array,
    v: jax.Array,
    inner_axis: str,  # a2a within (fast ICI neighborhood)
    outer_axis: str,  # ring across (slower links)
    *,
    causal: bool = True,
    scaling_factor=None,
    window_size=None,
    sequence_descriptor=None,
    softmax_sink=None,
    striped: bool = False,
    fp8_kv: bool = False,
) -> jax.Array:
    """Hierarchical context parallelism: Ulysses A2A inside, ring P2P
    outside (reference: cp_comm_type="a2a+p2p",
    context_parallel.py:4726-4741 — A2A within an NVLink node, ring
    across nodes; here: A2A within the fast ICI neighborhood, ring over
    the long axis). ``softmax_sink`` is sliced per inner-axis head
    shard and merged once after the outer ring."""
    p_in = jax.lax.axis_size(inner_axis)
    hq, hkv = q.shape[2], k.shape[2]
    assert hq % p_in == 0 and hkv % p_in == 0, (hq, hkv, p_in)
    scale = scaling_factor if scaling_factor is not None \
        else 1.0 / q.shape[-1] ** 0.5
    window = tuple(window_size) if window_size is not None else (-1, -1)

    def seq_to_head(x):
        return jax.lax.all_to_all(x, inner_axis, split_axis=2, concat_axis=1,
                                  tiled=True)

    def head_to_seq(x):
        return jax.lax.all_to_all(x, inner_axis, split_axis=1, concat_axis=2,
                                  tiled=True)

    # Segment ids gathered to inner-full length ride the OUTER ring with
    # their KV chunks inside ring_attn. Seqlens-only (THD) descriptors
    # derive local segments from the two-level position map: outer
    # chunks are contiguous (or striped), inner a2a concatenation is
    # contiguous within each outer chunk.
    positions = None
    if sequence_descriptor is not None \
            and getattr(sequence_descriptor, "q_segment_ids", None) is None \
            and getattr(sequence_descriptor, "q_seqlens", None) is not None:
        L = q.shape[1]
        i_in = jax.lax.axis_index(inner_axis)
        i_out = jax.lax.axis_index(outer_axis)
        p_out = jax.lax.axis_size(outer_axis)
        if striped:
            positions = i_out + (i_in * L + jnp.arange(L)) * p_out
        else:
            positions = (i_out * p_in + i_in) * L + jnp.arange(L)
    qseg, kseg = _local_segments(sequence_descriptor, inner_axis,
                                 q.shape[1], allow_seqlens=False,
                                 positions=positions)
    if qseg is not None:
        qseg = jax.lax.all_gather(qseg, inner_axis, axis=1, tiled=True)
        kseg = jax.lax.all_gather(kseg, inner_axis, axis=1, tiled=True)
    sink_local = None
    if softmax_sink is not None:
        idx = jax.lax.axis_index(inner_axis)
        sink_local = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(softmax_sink, jnp.float32), idx * (hq // p_in),
            hq // p_in)
    qg, kg, vg = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    # The outer ring takes the full feature set: fp8 P2P payloads halve
    # the bytes on exactly the slow links this strategy exists for, and
    # striped load balancing applies when the caller striped the GLOBAL
    # sequence over the OUTER axis (inner a2a preserves the outer
    # interleave: outer rank r still holds global positions r + i*cp_out).
    out = ring_attn(qg, kg, vg, qseg, kseg, sink_local, None, outer_axis,
                    causal, float(scale), window, striped, fp8_kv)
    return head_to_seq(out)
