"""Fused attention — public API, mask/bias/layout taxonomy, backends.

TPU counterpart of the reference attention stack (reference:
jax/attention.py:1447 fused_attn, SequenceDescriptor :789;
pytorch/attention/dot_product_attention/*; common/fused_attn/). The
reference dispatches to cuDNN graphs / FlashAttention / unfused torch;
here the backends are:

* ``FLASH``   — Pallas TPU flash-attention kernels (ops/flash_attention.py)
* ``UNFUSED`` — pure-XLA reference math (always available, any feature)

Backend selection mirrors ``get_attention_backend``
(reference: pytorch/attention/dot_product_attention/utils.py:327): the
Pallas kernel handles the hot configurations (BSHD, no/causal/padding
masks, GQA, sliding window); anything exotic (arbitrary bias grads,
float masks) falls back to UNFUSED.
"""
from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


class AttnBiasType(enum.Enum):
    """(reference: common/fused_attn NVTE_Bias_Type)"""
    NO_BIAS = "no_bias"
    PRE_SCALE_BIAS = "pre_scale_bias"
    POST_SCALE_BIAS = "post_scale_bias"
    ALIBI = "alibi"      # slopes computed from head index (reference:
                         # NVTE_ALIBI; flash runs it as an in-kernel
                         # score_mod, unfused materializes the bias)


class AttnMaskType(enum.Enum):
    """(reference: common/fused_attn NVTE_Mask_Type; 10 variants collapse
    to these — "bottom right" variants differ only for cross attention)"""
    NO_MASK = "no_mask"
    PADDING = "padding"
    CAUSAL = "causal"
    PADDING_CAUSAL = "padding_causal"
    CAUSAL_BOTTOM_RIGHT = "causal_bottom_right"
    PADDING_CAUSAL_BOTTOM_RIGHT = "padding_causal_bottom_right"

    @property
    def is_causal(self) -> bool:
        return self in (AttnMaskType.CAUSAL, AttnMaskType.PADDING_CAUSAL,
                        AttnMaskType.CAUSAL_BOTTOM_RIGHT,
                        AttnMaskType.PADDING_CAUSAL_BOTTOM_RIGHT)

    @property
    def is_padding(self) -> bool:
        return self in (AttnMaskType.PADDING, AttnMaskType.PADDING_CAUSAL,
                        AttnMaskType.PADDING_CAUSAL_BOTTOM_RIGHT)

    @property
    def is_bottom_right(self) -> bool:
        return self in (AttnMaskType.CAUSAL_BOTTOM_RIGHT,
                        AttnMaskType.PADDING_CAUSAL_BOTTOM_RIGHT)


class QKVLayout(enum.Enum):
    """Input packing (reference: fused_attn.h:29-57, 26 layouts collapse
    to the 4 logical groups; THD ragged batches are expressed with
    SequenceDescriptor segment lengths)."""
    BS3HD = "bs3hd"            # one packed qkv tensor
    BSHD_BS2HD = "bshd_bs2hd"  # separate q, packed kv
    BSHD_BSHD_BSHD = "bshd_bshd_bshd"
    T3HD = "t3hd"
    THD_T2HD = "thd_t2hd"
    THD_THD_THD = "thd_thd_thd"

    @property
    def is_qkvpacked(self):
        return self in (QKVLayout.BS3HD, QKVLayout.T3HD)

    @property
    def is_kvpacked(self):
        return self in (QKVLayout.BSHD_BS2HD, QKVLayout.THD_T2HD)

    @property
    def is_thd(self):
        return self in (QKVLayout.T3HD, QKVLayout.THD_T2HD,
                        QKVLayout.THD_THD_THD)

    def get_qkv_format(self) -> "QKVFormat":
        """(reference: jax/attention.py QKVLayout.get_qkv_format)"""
        return QKVFormat.THD if self.is_thd else QKVFormat.BSHD


class QKVFormat(enum.Enum):
    """Memory format family of a QKV layout (reference:
    jax/attention.py:106 QKVFormat). SBHD inputs are not a supported
    packing here — transpose to BSHD first (XLA fuses the transpose
    into the producer)."""
    SBHD = "sbhd"
    BSHD = "bshd"
    THD = "thd"


class SoftmaxType(enum.Enum):
    """Softmax variants in fused attention (reference: fused_attn.h
    NVTE_Softmax_Type — vanilla / off-by-one / learnable)."""
    VANILLA = "vanilla"
    OFF_BY_ONE = "off_by_one"      # +1 in the denominator (attention sink)
    LEARNABLE = "learnable"        # per-head learnable sink logit


# Reference name (jax/attention.py:77 AttnSoftmaxType).
AttnSoftmaxType = SoftmaxType


class AttnBackend(enum.Enum):
    AUTO = "auto"
    FLASH = "flash"      # Pallas TPU kernel
    UNFUSED = "unfused"  # pure-XLA reference


class CPStrategy(enum.Enum):
    """Context-parallel strategy (reference: jax/attention.py:201 plus the
    PyTorch side's cp_comm_type="a2a" Ulysses variant)."""
    DEFAULT = 0
    ALL_GATHER = 1
    RING = 2
    ULYSSES_A2A = 3
    # Striped (load-balanced) ring: tokens pre-interleaved with
    # cp_utils.reorder_causal_striped so every rank does equal causal
    # work (reference: cpp_extensions/attention.py:1293 striped CP).
    RING_STRIPED = 4


@dataclasses.dataclass(frozen=True)
class SequenceDescriptor:
    """Describes valid sequence lengths / segments for ragged or padded
    batches (reference: jax/attention.py:789).

    ``seqlens``: (B,) valid lengths (padded BSHD batches).
    ``segment_ids``: (B, S) integer segment ids for packed (THD-style)
    batches; 0 marks padding, equal nonzero ids may attend to each other.
    ``segment_pos``: (B, S) position of each token within its segment
    (defaults to arange per segment).
    """

    q_seqlens: Optional[jax.Array] = None
    kv_seqlens: Optional[jax.Array] = None
    q_segment_ids: Optional[jax.Array] = None
    kv_segment_ids: Optional[jax.Array] = None
    q_segment_pos: Optional[jax.Array] = None
    kv_segment_pos: Optional[jax.Array] = None

    @classmethod
    def from_seqlens(cls, q_seqlens, kv_seqlens=None):
        return cls(q_seqlens=q_seqlens,
                   kv_seqlens=kv_seqlens if kv_seqlens is not None else q_seqlens)

    @classmethod
    def from_segment_ids_and_pos(cls, q_segment_ids, kv_segment_ids=None,
                                 q_segment_pos=None, kv_segment_pos=None):
        return cls(q_segment_ids=q_segment_ids,
                   kv_segment_ids=(kv_segment_ids if kv_segment_ids is not None
                                   else q_segment_ids),
                   q_segment_pos=q_segment_pos, kv_segment_pos=kv_segment_pos)


jax.tree_util.register_dataclass(
    SequenceDescriptor,
    data_fields=["q_seqlens", "kv_seqlens", "q_segment_ids", "kv_segment_ids",
                 "q_segment_pos", "kv_segment_pos"],
    meta_fields=[])


# ---------------------------------------------------------------------------
# Layout canonicalization
# ---------------------------------------------------------------------------

def canonicalize_qkv(qkv: Sequence[jax.Array], qkv_layout: QKVLayout):
    """Unpack any supported layout into (q, k, v), each (B, S, H, D)."""
    if qkv_layout.is_qkvpacked:
        (packed,) = qkv
        q, k, v = packed[..., 0, :, :], packed[..., 1, :, :], packed[..., 2, :, :]
    elif qkv_layout.is_kvpacked:
        q, kv = qkv
        k, v = kv[..., 0, :, :], kv[..., 1, :, :]
    else:
        q, k, v = qkv
    return q, k, v


# ---------------------------------------------------------------------------
# Mask construction (shared by the unfused backend and tests; the Pallas
# kernel evaluates the same predicate block-wise without materializing it)
# ---------------------------------------------------------------------------

def make_attention_mask(
    seq_desc: Optional[SequenceDescriptor],
    attn_mask_type: AttnMaskType,
    q_len: int,
    kv_len: int,
    batch: int,
    window_size: Optional[Tuple[int, int]] = None,
) -> Optional[jax.Array]:
    """Boolean mask (B, 1, Sq, Skv): True = may attend."""
    rows = jnp.arange(q_len)[:, None]
    cols = jnp.arange(kv_len)[None, :]
    mask = jnp.ones((batch, 1, q_len, kv_len), jnp.bool_)

    if seq_desc is not None and seq_desc.q_segment_ids is not None:
        qs = seq_desc.q_segment_ids
        ks = seq_desc.kv_segment_ids
        seg = (qs[:, :, None] == ks[:, None, :]) & (qs[:, :, None] != 0)
        mask = mask & seg[:, None]
        q_pos = seq_desc.q_segment_pos
        kv_pos = seq_desc.kv_segment_pos
    elif seq_desc is not None and seq_desc.q_seqlens is not None:
        qlens = seq_desc.q_seqlens
        klens = (seq_desc.kv_seqlens if seq_desc.kv_seqlens is not None else qlens)
        valid = (rows[None] < qlens[:, None, None]) & (cols[None] < klens[:, None, None])
        mask = mask & valid[:, None]
        q_pos = kv_pos = None
    else:
        q_pos = kv_pos = None

    if attn_mask_type.is_causal:
        qp = q_pos if q_pos is not None else jnp.broadcast_to(rows.T[0], (batch, q_len))
        kp = kv_pos if kv_pos is not None else jnp.broadcast_to(cols[0], (batch, kv_len))
        offset = 0
        if attn_mask_type.is_bottom_right and q_pos is None:
            offset = kv_len - q_len
        causal = qp[:, :, None] + offset >= kp[:, None, :]
        mask = mask & causal[:, None]

    if window_size is not None and window_size != (-1, -1):
        left, right = window_size
        qp = q_pos if q_pos is not None else jnp.broadcast_to(rows.T[0], (batch, q_len))
        kp = kv_pos if kv_pos is not None else jnp.broadcast_to(cols[0], (batch, kv_len))
        diff = qp[:, :, None] - kp[:, None, :]
        win = jnp.ones_like(diff, jnp.bool_)
        if left >= 0:
            win = win & (diff <= left)
        if right >= 0:
            win = win & (diff >= -right)
        mask = mask & win[:, None]
    return mask


def make_swa_mask(
    segment_pos_q: jax.Array,
    segment_pos_kv: jax.Array,
    window_size: Optional[Tuple[int, int]] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Sliding-window mask (1 = attend, 0 = masked), shape
    (..., 1, Sq, Skv). Query at position i attends to keys in
    [i - window_size[0], i + window_size[1]] inclusive; a negative bound
    means unbounded on that side (reference: jax/attention.py:236
    make_swa_mask)."""
    pos_q = segment_pos_q[..., :, None].astype(jnp.int32)
    pos_kv = segment_pos_kv[..., None, :].astype(jnp.int32)
    keep = jnp.ones(jnp.broadcast_shapes(pos_q.shape, pos_kv.shape),
                    jnp.bool_)
    if window_size is not None:
        left, right = window_size
        if left >= 0:
            keep = keep & (pos_kv >= pos_q - left)
        if right >= 0:
            keep = keep & (pos_kv <= pos_q + right)
    return keep[..., None, :, :].astype(dtype)


def canonicalize_attn_mask_type(attn_mask_type: str) -> AttnMaskType:
    """String → :class:`AttnMaskType` (reference: jax/attention.py:295).
    Accepts the enum value strings plus the reference's aliases."""
    aliases = {
        "no_mask": AttnMaskType.NO_MASK,
        "padding": AttnMaskType.PADDING,
        "causal": AttnMaskType.CAUSAL,
        "padding_causal": AttnMaskType.PADDING_CAUSAL,
        "causal_padding": AttnMaskType.PADDING_CAUSAL,
        "causal_bottom_right": AttnMaskType.CAUSAL_BOTTOM_RIGHT,
        "bottom_right_causal": AttnMaskType.CAUSAL_BOTTOM_RIGHT,
        "padding_causal_bottom_right":
            AttnMaskType.PADDING_CAUSAL_BOTTOM_RIGHT,
        "bottom_right_padding_causal":
            AttnMaskType.PADDING_CAUSAL_BOTTOM_RIGHT,
        "causal_padding_bottom_right":
            AttnMaskType.PADDING_CAUSAL_BOTTOM_RIGHT,
    }
    key = str(attn_mask_type).strip().lower()
    if key not in aliases:
        raise ValueError(
            f"Unsupported attn_mask_type {attn_mask_type!r}; expected one "
            f"of {sorted(set(aliases))}")
    return aliases[key]


def is_fused_attn_kernel_available(
    *,
    attn_bias_type: AttnBiasType = AttnBiasType.NO_BIAS,
    attn_mask_type: AttnMaskType = AttnMaskType.NO_MASK,
    head_dim: int = 128,
    dropout_probability: float = 0.0,
    is_training: bool = True,
    window_size: Optional[Tuple[int, int]] = None,
    **_ignored,
) -> bool:
    """Whether the fused (Pallas flash) kernel serves this config
    (reference: jax/attention.py:326). The unfused XLA path is always
    available as fallback, so False never means unsupported — just
    unfused."""
    return get_attention_backend(
        attn_bias_type=attn_bias_type, attn_mask_type=attn_mask_type,
        head_dim=head_dim, dropout_probability=dropout_probability,
        is_training=is_training,
        window_size=window_size) is AttnBackend.FLASH


class ReorderStrategy(enum.Enum):
    """Causal-CP load-balance reorder (reference: jax/attention.py:214).
    DUAL_CHUNK_SWAP pairs chunk i with chunk 2*cp-1-i per rank; STRIPED
    deals (stripes of) tokens round-robin."""
    DUAL_CHUNK_SWAP = 0
    STRIPED = 1


def reorder_causal_load_balancing(tensor, strategy: ReorderStrategy,
                                  cp_size: int, seq_dim: int = 1,
                                  stripe_size: Optional[int] = None):
    """Reorder tokens for balanced causal CP work (reference:
    jax/attention.py:388). Apply before sharding over the cp axis; the
    inverse restores the output order."""
    from .parallel import cp_utils
    if strategy is ReorderStrategy.DUAL_CHUNK_SWAP:
        if stripe_size is not None:
            raise ValueError("stripe_size applies to STRIPED only")
        return cp_utils.reorder_causal_dual_chunk_swap(
            tensor, cp_size, seq_dim)
    return cp_utils.reorder_causal_striped(
        tensor, cp_size, seq_dim, stripe_size or 1)


def inverse_reorder_causal_load_balancing(tensor, strategy: ReorderStrategy,
                                          cp_size: int, seq_dim: int = 1,
                                          stripe_size: Optional[int] = None):
    """Inverse of :func:`reorder_causal_load_balancing`."""
    from .parallel import cp_utils
    if strategy is ReorderStrategy.DUAL_CHUNK_SWAP:
        if stripe_size is not None:
            raise ValueError("stripe_size applies to STRIPED only")
        return cp_utils.inverse_reorder_causal_dual_chunk_swap(
            tensor, cp_size, seq_dim)
    return cp_utils.inverse_reorder_causal_striped(
        tensor, cp_size, seq_dim, stripe_size or 1)


# ---------------------------------------------------------------------------
# Unfused (pure-XLA) backend — the always-available reference
# (reference counterpart: pytorch UnfusedDotProductAttention, backends.py:320)
# ---------------------------------------------------------------------------

def _unfused_attn(
    q, k, v, bias, mask, *,
    scaling_factor: float,
    dropout_probability: float,
    dropout_rng,
    attn_bias_type: AttnBiasType,
    is_training: bool,
    softmax_type: SoftmaxType = SoftmaxType.VANILLA,
    softmax_offset=None,
):
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # Straightforward GQA: repeat kv heads.
    if group > 1:
        kf = jnp.repeat(kf, group, axis=2)
        vf = jnp.repeat(vf, group, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    if attn_bias_type is AttnBiasType.PRE_SCALE_BIAS and bias is not None:
        logits = logits + bias.astype(jnp.float32)
    logits = logits * scaling_factor
    if attn_bias_type is AttnBiasType.POST_SCALE_BIAS and bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    if softmax_type is not SoftmaxType.VANILLA:
        # Sink column: logit 0 (off-by-one) or a learnable per-head value
        # (reference: softmax off-by-one / learnable types). The sink
        # absorbs probability mass and is dropped after normalization.
        bshape = (logits.shape[0], logits.shape[1], logits.shape[2], 1)
        if softmax_type is SoftmaxType.LEARNABLE:
            off = softmax_offset.reshape(1, -1, 1, 1).astype(jnp.float32)
            sink = jnp.broadcast_to(off, bshape)
        else:
            sink = jnp.zeros(bshape, jnp.float32)
        aug = jnp.concatenate([logits, sink], axis=-1)
        probs = jax.nn.softmax(aug, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    if mask is not None:
        # Rows with no valid keys produce uniform softmax garbage; zero them.
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        probs = jnp.where(any_valid, probs, 0.0)
    if is_training and dropout_probability > 0.0:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_probability, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_probability), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Backend selection
# ---------------------------------------------------------------------------

def get_attention_backend(
    *,
    attn_bias_type: AttnBiasType = AttnBiasType.NO_BIAS,
    attn_mask_type: AttnMaskType = AttnMaskType.NO_MASK,
    head_dim: int = 128,
    dropout_probability: float = 0.0,
    is_training: bool = True,
    has_explicit_mask: bool = False,
    window_size: Optional[Tuple[int, int]] = None,
) -> AttnBackend:
    """Pick the fastest backend that supports the request (reference:
    pytorch/.../utils.py:327 get_attention_backend). Overridable with
    ``TE_TPU_ATTN_BACKEND={flash,unfused}``."""
    env = os.environ.get("TE_TPU_ATTN_BACKEND", "").lower()
    if env == "unfused":
        return AttnBackend.UNFUSED
    if env == "flash":
        return AttnBackend.FLASH
    if attn_bias_type in (AttnBiasType.NO_BIAS, AttnBiasType.POST_SCALE_BIAS,
                          AttnBiasType.ALIBI):
        pass          # bias fwd+dgrad in-kernel; ALIBI as traced score_mod
    else:
        return AttnBackend.UNFUSED     # PRE_SCALE_BIAS stays unfused
    # dropout runs in-kernel (TPU PRNG mask replayed in fwd and bwd)
    if has_explicit_mask:
        return AttnBackend.UNFUSED
    if head_dim % 8 != 0 or head_dim > 256:
        return AttnBackend.UNFUSED
    return AttnBackend.FLASH


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def fused_attn(
    qkv: Sequence[jax.Array],
    bias: Optional[jax.Array] = None,
    sequence_descriptor: Optional[SequenceDescriptor] = None,
    seed: Optional[jax.Array] = None,
    *,
    attn_bias_type: AttnBiasType = AttnBiasType.NO_BIAS,
    attn_mask_type: AttnMaskType = AttnMaskType.NO_MASK,
    qkv_layout: QKVLayout = QKVLayout.BSHD_BSHD_BSHD,
    scaling_factor: Optional[float] = None,
    dropout_probability: float = 0.0,
    is_training: bool = True,
    window_size: Optional[Tuple[int, int]] = None,
    mask: Optional[jax.Array] = None,
    softmax_type: SoftmaxType = SoftmaxType.VANILLA,
    softmax_offset: Optional[jax.Array] = None,   # (H,) learnable sink
    backend: AttnBackend = AttnBackend.AUTO,
    context_parallel_strategy: CPStrategy = CPStrategy.DEFAULT,
    context_parallel_axis: str = "",
    qkv_quantizers=None,   # (q, k, v) tensor-scaling Quantizers -> FP8 DPA
) -> jax.Array:
    """Multi-head scaled dot-product attention (reference:
    jax/attention.py:1447). Returns (B, Sq, Hq, D).

    ``mask`` (optional, bool, broadcastable to (B, H, Sq, Skv), True =
    attend) is for arbitrary user masks; structured masking should use
    ``attn_mask_type`` + ``sequence_descriptor`` so the flash backend can
    skip blocks.
    """
    q, k, v = canonicalize_qkv(qkv, qkv_layout)
    if scaling_factor is None:
        scaling_factor = 1.0 / (q.shape[-1] ** 0.5)
    if attn_mask_type.is_padding and sequence_descriptor is None and \
            mask is None:
        # Nothing marks any token invalid — drop the padding component
        # (cross-attention modules default to PADDING; reference treats a
        # missing mask as all-valid).
        attn_mask_type = (AttnMaskType.CAUSAL if attn_mask_type.is_causal
                          else AttnMaskType.NO_MASK)

    if attn_bias_type is AttnBiasType.ALIBI:
        if bias is not None:
            raise ValueError("ALIBI computes its own bias; bias must be "
                             "None")

    if context_parallel_axis and context_parallel_strategy in (
            CPStrategy.RING, CPStrategy.RING_STRIPED,
            CPStrategy.ALL_GATHER, CPStrategy.ULYSSES_A2A):
        # Softmax sinks under CP: the sink is one virtual key per query
        # ROW, so ring merges it once after the rotation; AG/Ulysses
        # pass it into their single local flash call (Ulysses slices
        # the per-head vector after the a2a head reshard).
        sink = None
        if softmax_type is SoftmaxType.OFF_BY_ONE:
            sink = jnp.zeros((q.shape[2],), jnp.float32)
        elif softmax_type is SoftmaxType.LEARNABLE:
            if softmax_offset is None:
                raise ValueError("LEARNABLE softmax requires "
                                 "softmax_offset (Hq,)")
            sink = jnp.asarray(softmax_offset, jnp.float32).reshape(
                q.shape[2])
        from .parallel.ring_attention import (
            all_gather_attn, ring_attn_under_shard_map, ulysses_attn)
        # Bias / ALiBi under CP (reference: context_parallel.py:862-911
        # per-step bias chunking): ring slices the resident chunk's bias
        # columns each step; all-gather passes the local-q-rows bias into
        # its single flash call. ALiBi rides the score_mod path — the
        # per-step/per-rank q-position offset flows into its qpos/kpos,
        # so slopes see GLOBAL distances.
        cp_score_mod = None
        if attn_bias_type is AttnBiasType.ALIBI:
            if context_parallel_strategy not in (CPStrategy.RING,
                                                 CPStrategy.ALL_GATHER):
                raise NotImplementedError(
                    "ALiBi under CP: RING (contiguous) or ALL_GATHER only")
            from .flex_attention import alibi_arith_mod
            cp_score_mod = alibi_arith_mod(q.shape[2])
        cp_bias = None
        if attn_bias_type is AttnBiasType.POST_SCALE_BIAS and                 bias is not None:
            if context_parallel_strategy not in (CPStrategy.RING,
                                                 CPStrategy.ALL_GATHER):
                raise NotImplementedError(
                    "bias under CP: RING (contiguous) or ALL_GATHER only "
                    "(striped interleaving breaks column chunking; "
                    "Ulysses would need a head-sliced bias)")
            # The caller passes the bias for its LOCAL q rows over the
            # FULL kv length: (B|1, Hq, L_local, S_total).
            cp_bias = bias
        if context_parallel_strategy in (CPStrategy.RING,
                                         CPStrategy.RING_STRIPED):
            # FP8 ring payloads under an fp8_dpa recipe (reference: FP8
            # context parallelism — quantized P2P KV exchange).
            from .quantize.helper import get_quantize_config
            qcfg = get_quantize_config()
            fp8_ring = bool(qcfg.enabled
                            and getattr(qcfg.recipe, "fp8_dpa", False))
            return ring_attn_under_shard_map(
                q, k, v, sequence_descriptor,
                axis_name=context_parallel_axis,
                attn_mask_type=attn_mask_type,
                scaling_factor=scaling_factor,
                window_size=window_size,
                striped=(context_parallel_strategy
                         is CPStrategy.RING_STRIPED),
                fp8_kv=fp8_ring,
                softmax_sink=sink,
                bias=cp_bias,
                score_mod=cp_score_mod)
        from .quantize.helper import get_quantize_config as _gqc
        _qcfg = _gqc()
        fp8_cp = bool(_qcfg.enabled
                      and getattr(_qcfg.recipe, "fp8_dpa", False))
        if context_parallel_strategy is CPStrategy.ALL_GATHER:
            return all_gather_attn(
                q, k, v, context_parallel_axis,
                causal=attn_mask_type.is_causal,
                scaling_factor=scaling_factor, window_size=window_size,
                sequence_descriptor=sequence_descriptor,
                softmax_sink=sink,
                bias=cp_bias,
                score_mod=cp_score_mod,
                fp8_dpa=fp8_cp)
        return ulysses_attn(
            q, k, v, context_parallel_axis,
            causal=attn_mask_type.is_causal,
            scaling_factor=scaling_factor, window_size=window_size,
            sequence_descriptor=sequence_descriptor,
            softmax_sink=sink,
            fp8_dpa=fp8_cp)

    chosen = backend
    if chosen is AttnBackend.AUTO:
        chosen = get_attention_backend(
            attn_bias_type=attn_bias_type, attn_mask_type=attn_mask_type,
            head_dim=q.shape[-1], dropout_probability=dropout_probability,
            is_training=is_training, has_explicit_mask=mask is not None,
            window_size=window_size)
    if chosen is AttnBackend.FLASH:
        from .ops.flash_attention import flash_attention
        rate = dropout_probability if is_training else 0.0
        if rate > 0.0 and seed is None:
            raise ValueError(
                "attention dropout requires an explicit `seed` PRNG key; "
                "a silent default would reuse the same mask every step")
        score_mod = None
        if attn_bias_type is AttnBiasType.ALIBI:
            # ALiBi as an in-kernel traced score_mod (reference:
            # NVTE_ALIBI bias type; slopes 2^(-8(h+1)/H)).
            from .flex_attention import alibi_arith_mod
            score_mod = alibi_arith_mod(q.shape[2])
        return flash_attention(
            q, k, v, sequence_descriptor,
            attn_mask_type=attn_mask_type,
            scaling_factor=scaling_factor,
            window_size=window_size,
            bias=(bias if attn_bias_type is AttnBiasType.POST_SCALE_BIAS
                  else None),
            qkv_quantizers=(tuple(qkv_quantizers)
                            if qkv_quantizers is not None and bias is None
                            and score_mod is None else None),
            dropout_probability=rate,
            dropout_seed=seed,
            score_mod=score_mod,
            softmax_type=(softmax_type
                          if softmax_type is not SoftmaxType.VANILLA
                          else None),
            softmax_offset=softmax_offset)

    if attn_bias_type is AttnBiasType.ALIBI:
        # Unfused path: materialize the ALiBi bias and fall through as a
        # post-scale bias.
        hq, sq, skv = q.shape[2], q.shape[1], k.shape[1]
        slopes = jnp.exp2(-(jnp.arange(hq, dtype=jnp.float32) + 1.0)
                          * (8.0 / hq))
        dist = jnp.abs(jnp.arange(sq, dtype=jnp.float32)[:, None]
                       - jnp.arange(skv, dtype=jnp.float32)[None, :])
        bias = (-slopes[:, None, None] * dist)[None]      # (1, H, Sq, Skv)
        attn_bias_type = AttnBiasType.POST_SCALE_BIAS

    full_mask = mask
    if full_mask is None and (
            attn_mask_type is not AttnMaskType.NO_MASK
            or sequence_descriptor is not None or window_size is not None):
        full_mask = make_attention_mask(
            sequence_descriptor, attn_mask_type, q.shape[1], k.shape[1],
            q.shape[0], window_size)
    if dropout_probability > 0.0 and is_training and seed is None:
        raise ValueError(
            "attention dropout requires an explicit `seed` PRNG key; "
            "a silent default would reuse the same mask every step")
    rng = seed if seed is not None else jax.random.PRNGKey(0)
    return _unfused_attn(
        q, k, v, bias, full_mask,
        scaling_factor=scaling_factor,
        dropout_probability=dropout_probability,
        dropout_rng=rng,
        attn_bias_type=attn_bias_type,
        is_training=is_training,
        softmax_type=softmax_type,
        softmax_offset=softmax_offset)


def fused_attn_thd(qkv, bias=None, sequence_descriptor=None, seed=None,
                   *, qkv_layout: QKVLayout = QKVLayout.THD_THD_THD,
                   **kwargs) -> jax.Array:
    """Legacy THD entry point (reference: jax/attention.py:1147
    fused_attn_thd) — identical to :func:`fused_attn` with a THD layout
    default; packed/ragged batches are described by segment ids (and
    optional positions) in ``sequence_descriptor``."""
    assert qkv_layout.is_thd, f"fused_attn_thd needs a THD layout, got {qkv_layout}"
    return fused_attn(qkv, bias, sequence_descriptor, seed,
                      qkv_layout=qkv_layout, **kwargs)
